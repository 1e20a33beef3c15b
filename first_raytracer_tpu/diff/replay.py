"""Path-replay differentiable rendering: record once, differentiate a replay.

Round 2's differentiable pass ran reverse-mode autodiff straight through the
scan-form wavefront loop (render/integrator.py): every one of the 51 bounce
iterations re-intersects the full scene (an O(R x Np) dense sweep) inside the
AD graph, and the scan spills each iteration's residuals to HBM — measured
0.137 Mpaths/s, ~280x below the forward megakernel (BASELINE.md).

The TPU-native fix exploits the framework's own gradient contract: primitive
*selection* is non-differentiable by design (SURVEY.md §7 step 6 —
"differentiate the hit equation, not the traversal"; the integrator already
stop_gradients every intersector).  So the expensive intersection work can be
hoisted OUT of the AD graph entirely:

1. **Record** (non-differentiable, fast): trace the paths with any
   intersector — dense Pallas sweep, flat-BVH walk, brute force — under the
   usual early-exit ``while_loop``, storing only the winning primitive id per
   (bounce, ray): a ``(max_depth + 1, R)`` i32 tape (-1 = miss/dead).  This
   is in spirit the "path replay" of differentiable-rendering practice
   (Vicini et al. 2021), specialized to reparameterized gradients.
2. **Replay** (differentiable, cheap): a fixed-trip ``scan`` over the tape
   where each bounce *recomputes* the hit record from the recorded id —
   O(R) gathers plus the closed-form hit equation — and shades.  No
   intersection appears in the AD graph at all, and ``jax.checkpoint`` on
   the bounce body keeps backward residuals to the carried state only
   (origins/directions are recomputed, not stored, in the backward sweep).

Because the record pass runs the *identical* bounce arithmetic (same f32
ops, same RNG draws), the recorded ids are exactly the ids the monolithic
scan would have selected, and the replay's radiance and gradients are
bit-identical to round 2's direct path (tests/test_replay.py proves both).

The reference has no gradients at all (SURVEY.md §3.5); this module is the
north-star's "forward/backward kernels at speed-of-light" differentiable
pass [BASELINE.json:5, :11] in its XLA form — the forward tape-record runs
the same fast kernels as rendering, and the backward work is the replay's
transposed O(R) bounce math.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core import rng
from ..geometry.sphere import BIG
from ..materials.scatter import scatter
from ..render.integrator import (RenderConfig, default_intersect,
                                 recompute_hit, sky_color)

__all__ = ["record_paths", "trace_rays_replay"]


def record_paths(scene, origin, direction, ray_ids, key, cfg: RenderConfig,
                 accel=None, intersect_fn: Optional[Callable] = None):
    """Trace R rays forward and return the (max_depth + 1, R) i32 prim tape.

    Entry ``tape[d, i]`` is the global primitive id ray ``i`` hit at bounce
    ``d`` (after the integrator's recompute-authority check), or -1 when the
    ray missed, was already dead, or the scatter at an earlier bounce
    absorbed it.  Runs under an early-exit ``while_loop`` (all-dead
    wavefronts cost nothing) and is never differentiated — callers wrap it
    in ``stop_gradient``.
    """
    if intersect_fn is None:
        intersect_fn = default_intersect
    R = origin.shape[0]
    D = cfg.max_depth + 1
    tape0 = jnp.full((D, R), -1, jnp.int32)

    def cond(carry):
        d, _, _, alive, _ = carry
        return (d <= cfg.max_depth) & jnp.any(alive)

    def body(carry):
        d, o, dr, alive, tape = carry
        prim, _, hit = intersect_fn(scene, accel, o, dr, cfg.t_min)
        # Recompute is the authority on hits, exactly as in trace_rays —
        # the tape must store the id iff the replay will re-derive hit=True.
        t, p, n, mat = recompute_hit(scene, o, dr, prim, cfg.t_min)
        hit = hit & (t < BIG)
        tape = jax.lax.dynamic_update_index_in_dim(
            tape, jnp.where(alive & hit, prim, -1), d, axis=0)
        p = jnp.where(hit[:, None], p, 0.0)
        n = jnp.where(hit[:, None], n, jnp.array([0.0, 0.0, 1.0],
                                                 jnp.float32))
        uniforms = rng.bounce_uniforms(key, ray_ids, d)
        new_dir, _, scattered_ok = scatter(scene, mat, dr, p, n, uniforms)
        cont = alive & hit & scattered_ok & (d < cfg.max_depth)
        o = jnp.where(cont[:, None], p, o)
        dr = jnp.where(cont[:, None], new_dir, dr)
        return d + 1, o, dr, cont, tape

    _, _, _, _, tape = jax.lax.while_loop(
        cond, body, (jnp.int32(0), origin, direction,
                     jnp.ones((R,), bool), tape0))
    return tape


def trace_rays_replay(scene, origin, direction, ray_ids, key,
                      cfg: RenderConfig, tape):
    """Differentiable radiance from a recorded primitive tape.

    Identical masked math to ``trace_rays`` with the intersector replaced by
    a tape lookup: each bounce gathers its recorded winner, recomputes the
    differentiable hit record from the id, and shades.  The bounce body is
    rematerialized (``jax.checkpoint``) so the backward sweep recomputes the
    O(R) bounce math instead of storing 51 iterations of residuals.
    """
    R = origin.shape[0]
    f32 = jnp.float32

    def bounce(state, inputs):
        d, rec = inputs
        o, dr, throughput, radiance, alive = state
        t, p, n, mat = recompute_hit(scene, o, dr, jnp.maximum(rec, 0),
                                     cfg.t_min)
        hit = (rec >= 0) & (t < BIG)
        p = jnp.where(hit[:, None], p, 0.0)
        n = jnp.where(hit[:, None], n, jnp.array([0.0, 0.0, 1.0], f32))

        miss_now = alive & ~hit
        radiance = radiance + jnp.where(
            miss_now[:, None], throughput * sky_color(dr), 0.0)

        uniforms = rng.bounce_uniforms(key, ray_ids, d)
        new_dir, attenuation, scattered_ok = scatter(
            scene, mat, dr, p, n, uniforms)
        cont = alive & hit & scattered_ok & (d < cfg.max_depth)

        throughput = jnp.where(cont[:, None], throughput * attenuation,
                               throughput)
        o = jnp.where(cont[:, None], p, o)
        dr = jnp.where(cont[:, None], new_dir, dr)
        return (o, dr, throughput, radiance, cont), None

    init = (origin, direction, jnp.ones((R, 3), f32),
            jnp.zeros((R, 3), f32), jnp.ones((R,), bool))
    state, _ = jax.lax.scan(
        jax.checkpoint(bounce, prevent_cse=False), init,
        (jnp.arange(cfg.max_depth + 1), tape))
    return state[3]
