"""ctypes bindings for the native preprocessing library.

Builds native/libaidet_preproc.so on first use (g++ -O3 -fopenmp) and
falls back to numpy implementations when a compiler is unavailable.
The native path fuses BGR→RGB + normalise + pad (and scene tiling)
into single multithreaded passes — the host-side throughput piece of
the ≥1000 patches/s pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LOAD_LOCK = __import__("threading").Lock()


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    # run_inference's decode ThreadPoolExecutor can race in here: two
    # concurrent makes on the same .so target, or a CDLL of a
    # half-written file — serialize the first load
    with _LOAD_LOCK:
        return _load_locked()


def _load_locked():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_ROOT, "native", "libaidet_preproc.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.normalize_pad.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
        ctypes.c_int, f32p, f32p, ctypes.c_int]
    lib.normalize_pad_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
        ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int]
    lib.tile_scene.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, u8p, i32p, ctypes.c_int,
        ctypes.c_int]
    lib.tile_scene_normalized.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, i32p, ctypes.c_int,
        ctypes.c_int, f32p, f32p, ctypes.c_int]
    _LIB = lib
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _up(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def normalize_pad(img: np.ndarray, out_hw, mean, std,
                  to_rgb: bool = True) -> np.ndarray:
    """uint8 HWC (BGR) → normalised float32 [out_h, out_w, 3]."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    out_h, out_w = out_hw
    if h > out_h or w > out_w:
        # the C kernel writes dst rows of out_w floats while reading
        # src rows of w — an oversized source would be an unbounded
        # heap write there (the numpy fallback would merely raise)
        raise ValueError(
            f"normalize_pad: source {h}x{w} exceeds output "
            f"{out_h}x{out_w}; resize before padding")
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = _load()
    if lib is None:  # numpy fallback
        x = img.astype(np.float32)
        if to_rgb:
            x = x[..., ::-1]
        x = (x - mean) / std
        out = np.zeros((out_h, out_w, 3), np.float32)
        out[:h, :w] = x
        return out
    out = np.empty((out_h, out_w, 3), np.float32)
    lib.normalize_pad(_up(img), h, w, _fp(out), out_h, out_w,
                      _fp(mean), _fp(std), int(to_rgb))
    return out


def tile_scene_normalized(scene: np.ndarray, offsets: np.ndarray,
                          patch: int, mean, std,
                          to_rgb: bool = True) -> np.ndarray:
    """uint8 scene + [N, 2] (x, y) origins → normalised f32 patches."""
    scene = np.ascontiguousarray(scene, np.uint8)
    offs = np.ascontiguousarray(offsets, np.int32)
    n = len(offs)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = _load()
    if lib is None:
        out = np.zeros((n, patch, patch, 3), np.float32)
        for i, (ox, oy) in enumerate(offs):
            tile = scene[oy:oy + patch, ox:ox + patch]
            x = tile.astype(np.float32)
            if to_rgb:
                x = x[..., ::-1]
            out[i, :tile.shape[0], :tile.shape[1]] = (x - mean) / std
        return out
    out = np.empty((n, patch, patch, 3), np.float32)
    lib.tile_scene_normalized(
        _up(scene), scene.shape[0], scene.shape[1], _fp(out),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, patch,
        _fp(mean), _fp(std), int(to_rgb))
    return out


def native_available() -> bool:
    return _load() is not None
