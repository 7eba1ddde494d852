"""Test env: run everything on CPU with 8 virtual devices so sharding
(pjit/shard_map over a Mesh) is exercised without TPU hardware."""

import os

# FORCE cpu: the ambient environment sets JAX_PLATFORMS=axon (a remote
# TPU tunnel); running unit tests through it makes every dispatch a
# network roundtrip and caps the visible device count at 1.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# pytest plugins (jaxtyping) import jax before this conftest runs, so
# the env var alone may be baked with the ambient 'axon' value — force
# the config too (the backend is not yet initialized at plugin load).
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover
    pass
# XLA-CPU compiles are slow in this image (~5s per executable); the
# persistent cache turns warm test runs from minutes into seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
