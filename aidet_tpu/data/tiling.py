"""Gigapixel-scene handling: tiling + patch→scene merge.

First-class rework of the reference's offline-tiling + external-wwtool
merge (SURVEY.md §5.7; mmdet/datasets/dota.py:310-336 merge_txt with
per-class NMS thresholds): tiles are produced by a sliding window, and
scene-level results are reconstituted by lifting patch detections and
running global per-class rotated NMS — here implemented natively.
"""

from __future__ import annotations

import os

import numpy as np

_MERGE_POOL = None
_MERGE_POOL_SIZE = 0


def _nms_task(args):
    """Worker for one class's scene-level NMS (top-level so a spawn
    pool can import it without dragging jax into the children)."""
    boxes, scores, thr, box_type = args
    from .np_rboxes import bbox_nms_np, quad_nms_np
    if box_type == "quad":
        return quad_nms_np(boxes, scores, thr)
    return bbox_nms_np(boxes, scores, thr)


def _get_merge_pool(workers: int):
    """Persistent spawn-context process pool for the per-class merge
    NMS (parity: the reference merge is multiprocessing —
    mergebypoly_mp, datasets/dota.py:310-336).  spawn (not fork): the
    parent typically holds a live JAX backend / TPU tunnel, which must
    not leak into forked children; the one-time spawn import cost is
    amortized by pool reuse across scenes."""
    global _MERGE_POOL, _MERGE_POOL_SIZE
    if _MERGE_POOL is None or _MERGE_POOL_SIZE != workers:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        if _MERGE_POOL is not None:
            _MERGE_POOL.shutdown(wait=False)
        _MERGE_POOL = ProcessPoolExecutor(
            max_workers=workers, mp_context=mp.get_context("spawn"))
        _MERGE_POOL_SIZE = workers
    return _MERGE_POOL


def tile_coords(height: int, width: int, patch: int = 1024,
                overlap: int = 200):
    """Top-left corners of a sliding window covering the scene."""
    stride = patch - overlap
    xs = list(range(0, max(width - overlap, 1), stride))
    ys = list(range(0, max(height - overlap, 1), stride))
    # snap last windows inside the scene
    if xs and xs[-1] + patch > width:
        xs[-1] = max(width - patch, 0)
    if ys and ys[-1] + patch > height:
        ys[-1] = max(height - patch, 0)
    return [(x, y) for y in sorted(set(ys)) for x in sorted(set(xs))]


def tile_image(img: np.ndarray, patch: int = 1024, overlap: int = 200):
    """Slice a scene into fixed-size patches (zero-padded at borders).

    Returns (patches [N, patch, patch, C], offsets [N, 2] (x, y)).
    """
    h, w = img.shape[:2]
    coords = tile_coords(h, w, patch, overlap)
    n = len(coords)
    c = img.shape[2] if img.ndim == 3 else 1
    # empty + zero-only-borders: tile_coords snaps the last windows
    # inside the scene, so every tile is full-size whenever the scene
    # is at least one patch wide — the big zero-fill would be pure
    # waste on the common path
    patches = np.empty((n, patch, patch, c), img.dtype)
    offs = np.zeros((n, 2), np.float32)
    for i, (x, y) in enumerate(coords):
        tile = img[y:y + patch, x:x + patch]
        th, tw = tile.shape[:2]
        if th < patch or tw < patch:
            patches[i, th:] = 0
            patches[i, :th, tw:] = 0
        patches[i, :th, :tw] = tile if tile.ndim == 3 else tile[..., None]
        offs[i] = (x, y)
    return patches, offs


def device_tiler(height: int, width: int, patch: int = 1024,
                 overlap: int = 200):
    """Build a jitted on-device scene→patches tiler.

    The serving path's host tiling copies every overlapping patch and
    ships N×patch² uint8 over the host↔device link (~50 MB for a
    3072² scene at 200 px overlap).  Shipping the SCENE once (~28 MB)
    and slicing on device cuts the transfer by the overlap factor and
    removes the host copy loop entirely; with `tile_coords` static,
    every slice is a static-shape `lax.slice` that XLA lowers to plain
    HBM copies.  The patch batch keeps the exact same shape as the
    host path, so a predict function compiled for host-tiled input is
    reused as-is.

    Scenes smaller than `patch` in either dim need host-side padding —
    use `tile_image` there (border tiles are the rare path).

    Returns (jitted scene→[N, patch, patch, C] fn, offsets [N, 2]).
    """
    import jax
    import jax.numpy as jnp
    if height < patch or width < patch:
        raise ValueError("device_tiler needs scene >= patch; "
                         "use tile_image for small scenes")
    coords = tile_coords(height, width, patch, overlap)

    def tile(scene):
        c = scene.shape[2]
        return jnp.stack([
            jax.lax.slice(scene, (y, x, 0), (y + patch, x + patch, c))
            for (x, y) in coords])

    offs = np.asarray(coords, np.float32)
    return jax.jit(tile), offs


def merge_patch_detections(dets_per_patch, offsets, num_classes: int,
                           iou_thr=0.3, box_type: str = "quad",
                           score_thr: float = 0.05, max_keep: int = 2000,
                           workers: int | None = None):
    """Lift patch detections to scene coords + global per-class NMS.

    Replaces wwtool mergebypoly_mp/mergebyrec_mp (datasets/dota.py:
    310-336): per-class thresholds supported via an ``iou_thr`` dict
    {label: thr} or scalar.

    Args:
      dets_per_patch: list of dicts with numpy 'boxes'([K,4] or quads
        [K,8]), 'scores'[K], 'labels'[K], 'valid'[K].
      offsets: [N, 2] patch origins (x, y).
      workers: per-class NMS process-pool size (the reference merge is
        multiprocessing: mergebypoly_mp).  None = auto — parallel when
        several classes are busy enough to pay the pickling; 0/1 =
        serial in-process.
    Returns dict(boxes, scores, labels) of scene-level detections.
    """
    from .np_rboxes import bbox_nms_np, quad_nms_np

    all_boxes, all_scores, all_labels = [], [], []
    for det, (ox, oy) in zip(dets_per_patch, offsets):
        v = np.asarray(det["valid"]).astype(bool)
        if not v.any():
            continue
        b = np.asarray(det["boxes"])[v].astype(np.float32)
        if box_type == "quad":
            shift = np.tile([ox, oy], b.shape[-1] // 2)
        else:
            shift = np.asarray([ox, oy, ox, oy], np.float32)
        all_boxes.append(b + shift)
        all_scores.append(np.asarray(det["scores"])[v])
        all_labels.append(np.asarray(det["labels"])[v])
    if not all_boxes:
        d = 8 if box_type == "quad" else 4
        return dict(boxes=np.zeros((0, d), np.float32),
                    scores=np.zeros((0,), np.float32),
                    labels=np.zeros((0,), np.int32))

    boxes = np.concatenate(all_boxes)
    scores = np.concatenate(all_scores).astype(np.float32)
    labels = np.concatenate(all_labels).astype(np.int32)

    # host-native greedy NMS (np_rboxes twins of ops/nms): merge
    # runs between device batches, and a jax dispatch here would
    # go to the live backend — per-class network round-trips over
    # a remote-device tunnel, serialized against in-flight work,
    # plus a recompile per candidate-count bucket
    tasks = []
    for c in range(num_classes):
        sel = np.nonzero((labels == c) & (scores > score_thr))[0]
        if len(sel) == 0:
            continue
        thr = float(iou_thr[c] if isinstance(iou_thr, dict) else iou_thr)
        tasks.append((sel, (boxes[sel], scores[sel], thr, box_type)))

    if workers is None:
        busy = sum(len(sel) >= 64 for sel, _ in tasks)
        workers = min(busy, os.cpu_count() or 1, 8) if busy >= 2 else 0

    keep_mask = np.zeros(len(boxes), bool)
    if workers and workers > 1 and len(tasks) > 1:
        pool = _get_merge_pool(workers)
        for (sel, _), k in zip(tasks, pool.map(
                _nms_task, [t for _, t in tasks])):
            keep_mask[sel[k]] = True
    else:
        for sel, (b, s, thr, bt) in tasks:
            k = (quad_nms_np(b, s, thr) if bt == "quad"
                 else bbox_nms_np(b, s, thr))
            keep_mask[sel[k]] = True

    keep = np.nonzero(keep_mask)[0]
    if len(keep) > max_keep:
        keep = keep[np.argsort(-scores[keep])[:max_keep]]
    return dict(boxes=boxes[keep], scores=scores[keep],
                labels=labels[keep])
