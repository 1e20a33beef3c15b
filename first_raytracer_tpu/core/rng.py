"""Counter-based stateless RNG.

The reference uses the global, stateful ``drand48()`` scattered through
[E: main.cpp, material.h, camera.h] (SURVEY.md §2.1 "RNG").  A sequential
generator is meaningless on a vector machine, so the TPU-native design keys
every random draw by *what it is for*: a threefry key derived from
``(ray_id, domain)`` where ``ray_id = pixel_index * spp + sample_index`` and
``domain`` encodes camera-sampling vs. bounce number.  Consequences:

- The render is bit-deterministic for a given seed, independent of device
  count, ray buffer order, or stream compaction (sharding invariance).
- The NumPy CPU oracle (``first_raytracer_tpu.oracle``) draws the *identical*
  uniforms by calling these same functions, so per-pixel allclose against the
  oracle is achievable at low spp (SURVEY.md §4.1).

The reference's rejection-sampled ``random_in_unit_sphere()`` /
``random_in_unit_disk()`` are unbounded loops — hostile to fixed-trace XLA
programs — so both are replaced by bounded analytic transforms of fixed
numbers of uniforms that sample the *same distributions* (uniform in the unit
ball / unit disk).

Draw layout per ray (one ray = one (pixel, sample) pair):

- domain 0 (``DOMAIN_CAMERA``): 4 uniforms — pixel jitter (u, v) for
  anti-aliasing + lens disk (u1, u2) for defocus blur.
- domain 1 + d for bounce ``d``: 4 uniforms — unit-ball sample (u1, u2, u3)
  for lambertian/metal scatter + reflect/refract coin for dielectric.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "base_key",
    "ray_uniforms",
    "camera_uniforms",
    "bounce_uniforms",
    "unit_disk_sample",
    "unit_ball_sample",
    "precompute_uniforms",
]

DOMAIN_CAMERA = 0
_DRAWS_PER_DOMAIN = 4


def base_key(seed: int):
    """Root key for a render; everything else is folded in from here."""
    return jax.random.key(seed)


def _domain_key(key, ray_id, domain):
    return jax.random.fold_in(jax.random.fold_in(key, ray_id), domain)


def ray_uniforms(key, ray_id, domain):
    """4 uniforms in [0,1) for one ray and one domain (scalar ray_id)."""
    return jax.random.uniform(
        _domain_key(key, ray_id, domain), (_DRAWS_PER_DOMAIN,), dtype=jnp.float32
    )


# Batched versions: vmap over the ray axis.  XLA turns this into one wide
# threefry computation over the whole wavefront — no sequential state.
_ray_uniforms_batch = jax.vmap(ray_uniforms, in_axes=(None, 0, None))


def camera_uniforms(key, ray_ids):
    """(R, 4) uniforms for AA jitter and lens sampling."""
    return _ray_uniforms_batch(key, ray_ids, DOMAIN_CAMERA)


def bounce_uniforms(key, ray_ids, depth):
    """(R, 4) uniforms for bounce ``depth`` (0-based)."""
    return _ray_uniforms_batch(key, ray_ids, depth + 1)


_ray_uniforms_batch_var = jax.vmap(ray_uniforms, in_axes=(None, 0, 0))


def bounce_uniforms_var(key, ray_ids, depths):
    """(R, 4) uniforms with a *per-ray* bounce depth.

    Identical values to ``bounce_uniforms`` at matching (id, depth) — used by
    the regenerative (compacted-pool) integrator where rays in one batch sit
    at different depths.
    """
    return _ray_uniforms_batch_var(key, ray_ids, depths + 1)


def unit_disk_sample(u1, u2):
    """Uniform point in the unit disk from two uniforms.

    Bounded replacement for the reference's rejection loop
    ``random_in_unit_disk()`` [E: camera.h]; identical distribution.
    Returns an (..., 2) array.
    """
    r = jnp.sqrt(u1)
    theta = (2.0 * jnp.pi) * u2
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def unit_ball_sample(u1, u2, u3):
    """Uniform point in the unit ball from three uniforms.

    Bounded replacement for ``random_in_unit_sphere()`` [E: material.h];
    identical distribution (uniform direction x cbrt-radius).
    Returns an (..., 3) array.
    """
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = (2.0 * jnp.pi) * u2
    radius = jnp.cbrt(u3)
    return radius[..., None] * jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1
    )


def precompute_uniforms(key, ray_ids, max_depth: int):
    """All uniforms a set of rays can ever consume, as one array.

    Shape ``(R, max_depth + 2, 4)``: slot 0 is the camera domain, slot 1+d is
    bounce ``d`` (the integrator probes depth 0..max_depth inclusive for the
    final miss-only pass).  The NumPy oracle uses this so its per-ray Python
    recursion never touches JAX; the TPU path derives the same values lazily
    per bounce.  Both agree bit-for-bit by construction.
    """
    domains = jnp.arange(max_depth + 2)
    fn = jax.vmap(
        jax.vmap(ray_uniforms, in_axes=(None, None, 0)), in_axes=(None, 0, None)
    )
    return fn(key, jnp.asarray(ray_ids), domains)
