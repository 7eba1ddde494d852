"""Rank-aware logging (parity: mmdet/utils/logger.py:6-44)."""

from __future__ import annotations

import logging
import os


def get_root_logger(log_file: str | None = None,
                    log_level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger("aidet_tpu")
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    try:
        import jax
        rank = jax.process_index()
    except Exception:
        rank = 0
    if rank == 0:
        logger.setLevel(log_level)
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)),
                        exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.setLevel(logging.ERROR)
    return logger


def collect_env() -> dict:
    """Environment fingerprint (parity: mmdet/utils/collect_env.py);
    reports jax/jaxlib/libtpu instead of torch/CUDA/NVCC."""
    import platform
    import sys
    info = {"python": sys.version.replace("\n", ""),
            "platform": platform.platform()}
    try:
        import jax
        import jaxlib
        info["jax"] = jax.__version__
        info["jaxlib"] = jaxlib.__version__
        info["devices"] = ", ".join(str(d) for d in jax.devices())
        info["process_count"] = jax.process_count()
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable: {e}"
    try:
        import flax
        import optax
        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except Exception:
        pass
    return info
