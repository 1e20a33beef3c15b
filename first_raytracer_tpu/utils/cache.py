"""Persistent-compilation-cache enablement.

Megakernel compiles are expensive on the experimental axon toolchain
(minutes via the remote compile tunnel), so every entry point shares one
on-disk cache.  Plain ``JAX_COMPILATION_CACHE_DIR`` env vars do NOT work in
this environment — a sitecustomize module imports jax into every
interpreter before user code runs, and the config snapshot taken at import
ignores later env changes — so the live config must be updated instead
(same pattern as tests/conftest.py).
"""
from __future__ import annotations

__all__ = ["enable_persistent_cache"]


def enable_persistent_cache(path: str = "/tmp/frt_jax_cache") -> None:
    """Idempotent: respects an already-configured cache dir.

    CPU sessions get their own ``_cpu`` namespace: mixing XLA:CPU AOT
    entries into the TPU-session cache eventually SEGFAULTED readers
    whose host machine features differ from the entry's compile features
    (the cpu_aot_loader mismatch warnings; see tests/conftest.py).
    """
    import jax

    if (jax.config.jax_platforms or "").startswith("cpu"):
        path = path + "_cpu"
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir", path)
        # Persist EVERYTHING: on the axon toolchain even one-op programs
        # round-trip the remote compile tunnel (observed minutes under
        # load), so the usual only-cache-slow-compiles threshold would
        # leave every fresh process paying them again.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
