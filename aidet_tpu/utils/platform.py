"""Platform selection helpers.

Post-processing CLIs (eval, figure rendering, log analysis) are
numpy-dominated with a few small jitted geometry ops — running them on
an accelerator wastes a device and, behind remote-device transports,
bills a network round-trip to every op. ``force_cpu()`` pins JAX to
the host CPU regardless of ambient configuration.

Note the env var alone is NOT sufficient: platform plugins may extend
``JAX_PLATFORMS`` at import time, so this uses ``jax.config.update``,
which wins as long as no computation has run yet.
"""

from __future__ import annotations

import os


def force_cpu():
    """Pin JAX to CPU. Call before any jax computation."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


def is_tpu_backend() -> bool:
    """True when the default backend compiles Mosaic/Pallas natively.

    ``axon`` (the remote single-chip TPU tunnel) IS a TPU — gating
    Pallas kernels on ``default_backend() != "tpu"`` alone silently
    runs the interpreter there, which both mismeasures benchmarks and
    cripples any fused-enabled config."""
    import jax
    return jax.default_backend() in ("tpu", "axon")
