"""Test configuration.

All tests run on the CPU backend with 8 virtual devices
(SURVEY.md §4.5: the standard JAX fake-multidevice fixture) so sharding and
collective code paths are exercised without a pod.  The real-TPU path is
covered by bench.py and __graft_entry__.py, not by the unit suite.

A persistent compilation cache keeps the big wavefront-loop compiles (~1 min
cold on this CPU) from being paid on every test run.
"""
import os

# Force CPU: the machine profile exports JAX_PLATFORMS=axon (the real TPU)
# and a sitecustomize module imports jax into every interpreter, so plain
# env vars are too late — override the already-imported config instead
# (backends initialize lazily, so this still takes effect).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# A CPU-only cache namespace: sharing the TPU-session cache directory
# eventually segfaulted the suite mid-run (SIGSEGV inside the cache READ
# deserializing an entry whose XLA:CPU AOT machine features don't match
# this host — the cpu_aot_loader "could lead to SIGILL" warnings made
# good on their threat).  Separate directories keep the expensive axon
# TPU entries intact and the CPU entries host-consistent.
jax.config.update("jax_compilation_cache_dir", "/tmp/frt_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
assert jax.devices()[0].platform == "cpu", (
    "unit suite must run on the virtual CPU mesh, got "
    f"{jax.devices()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables after each test module.

    The suite compiles hundreds of programs (including the large
    interpret-mode Pallas while-loops); keeping them all loaded grew the
    process until the XLA:CPU compiler itself segfaulted near the end of
    the run.  Recompiles are cheap via the persistent disk cache.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def tiny_three_spheres():
    from first_raytracer_tpu.scene.builders import three_spheres
    return three_spheres(nx=24, ny=12, spp=2)


@pytest.fixture(scope="session")
def rng_key():
    from first_raytracer_tpu.core import rng
    return rng.base_key(0)


def rays_for(cfg):
    import jax.numpy as jnp
    return jnp.arange(cfg.num_rays, dtype=jnp.int32)


@pytest.fixture(scope="session")
def random_rays():
    """Deterministic random ray bundle for geometry tests."""
    r = np.random.RandomState(0)
    o = r.randn(256, 3).astype(np.float32) * 2.0
    d = r.randn(256, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d
