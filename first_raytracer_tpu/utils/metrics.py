"""Structured render metrics / observability (SURVEY.md §5.5).

The reference's only observability is the image on stdout.  Here a render
can report per-bounce wavefront occupancy — rays alive per bounce, the
compaction ratio, a bounce histogram — from one instrumented pass, logged
via the stdlib ``logging`` module (no external deps).
"""
from __future__ import annotations

import json
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..render.camera import generate_rays
from ..render.integrator import RenderConfig, default_intersect

logger = logging.getLogger("first_raytracer_tpu")

__all__ = ["wavefront_occupancy", "megakernel_occupancy", "log_metrics",
           "logger"]


@partial(jax.jit, static_argnames=("cfg",))
def _occupancy_scan(scene, camera, cfg, key, ray_ids, accel):
    """(max_depth+1,) alive-ray count per bounce (scan-form loop)."""
    cam_u = rng.camera_uniforms(key, ray_ids)
    o, d = generate_rays(camera, cfg.nx, cfg.ny, cfg.spp, ray_ids, cam_u)
    import dataclasses
    cfg_scan = dataclasses.replace(cfg, differentiable=True)

    # Re-run the bounce loop collecting the alive count at each depth.
    # (Separate instrumented pass: the hot path stays counter-free.)
    R = o.shape[0]
    from ..render.integrator import BIG, recompute_hit
    from ..materials.scatter import scatter

    def bounce(state, depth):
        origin, direction, alive = state
        prim, _, hit = default_intersect(scene, accel, origin, direction,
                                         cfg.t_min)
        t, p, n, mat = recompute_hit(scene, origin, direction, prim,
                                     cfg.t_min)
        hit = hit & (t < BIG)
        p = jnp.where(hit[:, None], p, 0.0)
        n = jnp.where(hit[:, None], n,
                      jnp.array([0.0, 0.0, 1.0], jnp.float32))
        uniforms = rng.bounce_uniforms(key, ray_ids, depth)
        new_dir, _, ok = scatter(scene, mat, direction, p, n, uniforms)
        cont = alive & hit & ok & (depth < cfg.max_depth)
        origin = jnp.where(cont[:, None], p, origin)
        direction = jnp.where(cont[:, None], new_dir, direction)
        return (origin, direction, cont), jnp.sum(alive.astype(jnp.int32))

    (_, _, _), alive_counts = jax.lax.scan(
        bounce, (o, d, jnp.ones((R,), bool)),
        jnp.arange(cfg.max_depth + 1))
    return alive_counts


def wavefront_occupancy(scene, camera, cfg: RenderConfig, seed: int = 0,
                        accel=None, num_rays: int = 1 << 14) -> dict:
    """Occupancy report for the first ``num_rays`` rays of a render."""
    key = rng.base_key(seed)
    ids = jnp.arange(min(num_rays, cfg.num_rays), dtype=jnp.int32)
    counts = np.asarray(_occupancy_scan(scene, camera, cfg, key, ids, accel))
    total = int(ids.shape[0])
    alive_frac = counts / total
    # Bounce histogram: paths terminating at each depth.
    terminated = -np.diff(np.append(counts, 0))
    return {
        "rays": total,
        "alive_per_bounce": counts.tolist(),
        "alive_frac_per_bounce": [round(float(x), 4) for x in alive_frac],
        "bounce_histogram": terminated.tolist(),
        "avg_path_length": float(counts.sum()) / total,
        "wavefront_efficiency": float(counts.sum())
        / (total * max(int(np.sum(counts > 0)), 1)),
    }


def log_metrics(tag: str, metrics: dict, level=logging.INFO):
    logger.log(level, "%s %s", tag, json.dumps(metrics))


def megakernel_occupancy(scene, camera, cfg: RenderConfig, seed: int = 0,
                         tile: int = None, k_pix: int = None,
                         interpret: bool = False):
    """Lane-occupancy metrics of the persistent-lane megakernel.

    Occupancy = traced segments / (loop trips x lanes): the fraction of
    lane-iterations doing useful work under the grid-stride divergence
    control (kernels/megakernel.py).
    """
    from ..kernels import megakernel as mk

    pack = mk.pack_scene_mega(scene)
    key = rng.base_key(seed)
    kw = {}
    if tile:
        kw["tile"] = tile
    if k_pix:
        kw["k_pix"] = k_pix
    rad, seg, its = mk.render_pixels_mega(pack, camera, cfg, key,
                                          interpret=interpret,
                                          return_iters=True, **kw)
    segs = int(np.asarray(seg, np.int64).sum())
    trips = np.asarray(its, np.int64)
    lanes = kw.get("tile", mk.TILE)
    slots = int(trips.sum()) * lanes
    return {
        "segments": segs,
        "mean_path_len": round(segs / cfg.num_rays, 3),
        "tile_trips_mean": round(float(trips.mean()), 1),
        "tile_trips_max": int(trips.max()),
        "lane_occupancy": round(segs / slots, 4) if slots else 0.0,
    }


def megakernel_clustered_occupancy(scene, camera, cfg: RenderConfig,
                                   seed: int = 0, tile: int = None,
                                   k_pix: int = None,
                                   interpret: bool = False):
    """Lane occupancy of the clustered megakernel.

    Contiguous pixel tiles correlate long paths spatially (glass regions
    land in one tile), so this is expected to sit below the dense
    kernel's grid-stride occupancy — the culling trade
    (kernels/megakernel_clustered.py docstring).
    """
    from ..kernels import megakernel_clustered as mc

    pack = mc.pack_scene_mega_clustered(scene, sort_from=camera.origin)
    key = rng.base_key(seed)
    kw = {}
    if tile:
        kw["tile"] = tile
    if k_pix:
        kw["k_pix"] = k_pix
    rad, seg, its, swp = mc.render_pixels_mega_clustered(
        pack, camera, cfg, key, interpret=interpret, return_iters=True,
        **kw)
    segs = int(np.asarray(seg, np.int64).sum())
    trips = np.asarray(its, np.int64)
    sweeps = np.asarray(swp, np.int64)
    lanes = kw.get("tile", mc.TILE)
    slots = int(trips.sum()) * lanes
    return {
        "segments": segs,
        "clusters": pack.clusters,
        "mean_path_len": round(segs / cfg.num_rays, 3),
        "tile_trips_mean": round(float(trips.mean()), 1),
        "tile_trips_max": int(trips.max()),
        "lane_occupancy": round(segs / slots, 4) if slots else 0.0,
        # Gate selectivity: cluster sweeps actually executed per bounce
        # iteration, averaged over tiles (ungated would equal clusters).
        "sweeps_per_iter": round(float(sweeps.sum() / max(trips.sum(), 1)),
                                 2),
    }
