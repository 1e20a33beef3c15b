"""Regenerative wavefront integrator: stream compaction + path regeneration.

This is the stream-compaction stage of the re-architecture
[BASELINE.json:5 "wavefront passes with stream compaction", SURVEY.md §7
step 5], in the only form that makes sense on a fixed-shape vector machine:
instead of shrinking buffers (impossible under XLA's static shapes), a
fixed-capacity ray *pool* is kept at ~full occupancy by

1. tracing ONE bounce of every pooled ray,
2. scatter-adding the radiance of terminated rays into the per-ray output
   (each ray terminates exactly once, so this reproduces the plain
   integrator's value exactly),
3. compacting survivors to the front of the pool with a cumsum-based stable
   partition (O(C), no sort), and
4. regenerating the freed tail slots with fresh camera rays from the
   remaining primary-ray id stream.

The plain loop's occupancy decays like the path-length survival curve (it
iterates until the *longest* path dies — all lanes pay for the tail); the
pool stays dense, so wall-clock per traced segment approaches the
bounce-kernel cost.  Per-ray math is identical (counter RNG keys by (ray id,
depth), which rays carry with them), so the result matches ``trace_rays``
to float-associativity.

Reference lineage: the recursion being replaced is ``color()``'s depth-50
self-call [E: main.cpp] (SURVEY.md §3.2); the reference has no analog of
compaction because a scalar CPU loop never pays for dead lanes.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core import rng
from .camera import generate_rays
from .integrator import (BIG, RenderConfig, default_intersect, recompute_hit,
                         sky_color)
from ..materials.scatter import scatter

__all__ = ["render_rays_regenerative"]


@partial(jax.jit,
         static_argnames=("cfg", "num_rays", "intersect_fn", "pool_size"))
def render_rays_regenerative(scene, camera, cfg: RenderConfig, key,
                             start_id, num_rays: int,
                             accel=None,
                             intersect_fn: Optional[Callable] = None,
                             pool_size: int = 1 << 16):
    """Trace rays [start_id, start_id + num_rays) and return (num_rays, 3).

    ``num_rays`` and ``pool_size`` are static; ``start_id`` may be traced.
    """
    if intersect_fn is None:
        intersect_fn = default_intersect
    C = pool_size
    f32 = jnp.float32
    i32 = jnp.int32
    zero3 = jnp.zeros((C, 3), f32)

    def fresh_rays(slot_ids):
        """Camera rays for global ray ids (out-of-range ids are inert)."""
        ids = jnp.clip(slot_ids, 0, cfg.num_rays - 1)
        cam_u = rng.camera_uniforms(key, ids)
        o, d = generate_rays(camera, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
        return o, d

    def state_init():
        n0 = min(C, num_rays)
        slot = jnp.arange(C, dtype=i32)
        ids = start_id + slot
        o, d = fresh_rays(ids)
        alive = slot < n0
        return dict(
            o=o, d=d, tp=jnp.ones((C, 3), f32), ids=ids,
            depth=jnp.zeros((C,), i32), alive=alive,
            cursor=jnp.asarray(n0, i32),
            out=jnp.zeros((num_rays, 3), f32),
        )

    def cond(s):
        return jnp.any(s["alive"])

    def body(s):
        o, d, tp, ids, depth, alive = (s["o"], s["d"], s["tp"], s["ids"],
                                       s["depth"], s["alive"])
        prim, _, hit = intersect_fn(scene, accel, o, d, cfg.t_min)
        t, p, n, mat = recompute_hit(scene, o, d, prim, cfg.t_min)
        hit = hit & (t < BIG)
        p = jnp.where(hit[:, None], p, 0.0)
        n = jnp.where(hit[:, None], n, jnp.array([0, 0, 1], f32))

        uniforms = rng.bounce_uniforms_var(key, ids, depth)
        new_dir, attenuation, ok = scatter(scene, mat, d, p, n, uniforms)
        cont = alive & hit & ok & (depth < cfg.max_depth)

        # Terminated-this-bounce contributions (miss -> sky, else black).
        miss_now = alive & ~hit
        contrib = jnp.where(miss_now[:, None], tp * sky_color(d), 0.0)
        out = s["out"].at[jnp.clip(ids - start_id, 0, num_rays - 1)].add(
            jnp.where(alive[:, None], contrib, 0.0), mode="drop")

        tp = jnp.where(cont[:, None], tp * attenuation, tp)
        o = jnp.where(cont[:, None], p, o)
        d = jnp.where(cont[:, None], new_dir, d)
        depth = depth + cont.astype(i32)

        # --- compaction: stable-partition survivors to the front ---
        n_alive = jnp.sum(cont.astype(i32))
        pos_alive = jnp.cumsum(cont.astype(i32)) - 1
        dest = jnp.where(cont, pos_alive, C - 1)  # dead lanes collide at C-1

        def compact(x):
            return jnp.zeros_like(x).at[dest].set(
                jnp.where(cont.reshape((-1,) + (1,) * (x.ndim - 1)), x,
                          jnp.zeros_like(x)))

        o, d, tp, ids, depth = map(compact, (o, d, tp, ids, depth))

        # --- regeneration: refill the tail from the primary stream ---
        slot = jnp.arange(C, dtype=i32)
        is_tail = slot >= n_alive
        fresh_idx = s["cursor"] + (slot - n_alive)         # stream offset
        fresh_valid = is_tail & (fresh_idx < num_rays)
        fresh_ids = start_id + jnp.clip(fresh_idx, 0, num_rays - 1)
        fo, fd = fresh_rays(fresh_ids)

        sel = is_tail[:, None]
        o = jnp.where(sel, fo, o)
        d = jnp.where(sel, fd, d)
        tp = jnp.where(sel, jnp.ones_like(tp), tp)
        ids = jnp.where(is_tail, fresh_ids, ids)
        depth = jnp.where(is_tail, 0, depth)
        alive = jnp.where(is_tail, fresh_valid, slot < n_alive)
        n_taken = jnp.minimum(C - n_alive,
                              jnp.maximum(num_rays - s["cursor"], 0))
        return dict(o=o, d=d, tp=tp, ids=ids, depth=depth, alive=alive,
                    cursor=s["cursor"] + n_taken, out=out)

    final = jax.lax.while_loop(cond, body, state_init())
    return final["out"]
