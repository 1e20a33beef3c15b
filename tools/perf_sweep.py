#!/usr/bin/env python
"""On-chip perf sweep: intersector x integrator-mode x chunk size.

Run on the real TPU (no JAX_PLATFORMS override) AFTER the test suite is
idle — two concurrent JAX processes contend for the chip/CPU.

Usage: python tools/perf_sweep.py [--full] [--preset random-spheres]
"""
import argparse
import json
import os
import sys
import time

# Persistent compile cache: enabled below via utils.cache (env vars are too late
# here - sitecustomize imports jax first).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import jax.numpy as jnp

from first_raytracer_tpu.accel.build import build_bvh
from first_raytracer_tpu.core import rng
from first_raytracer_tpu.kernels.intersect_pallas import (intersect_pallas,
                                                          pack_scene_pallas)
from first_raytracer_tpu.render.api import render_ray_batch
from first_raytracer_tpu.kernels.megakernel import (pack_scene_mega,
                                                    render_pixels_mega)
from first_raytracer_tpu.render.regenerative import render_rays_regenerative
from first_raytracer_tpu.scene.builders import PRESETS


def time_once(fn, *args, repeats=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--preset", default="random-spheres")
    ap.add_argument("--chunk", type=int, default=1 << 17)
    ap.add_argument("--pool", type=int, default=1 << 17)
    args = ap.parse_args()

    if args.full:
        scene, cam, cfg = PRESETS[args.preset]()
    else:
        scene, cam, cfg = PRESETS[args.preset](nx=300, ny=200, spp=4)
    print(f"# {args.preset} {cfg.nx}x{cfg.ny}@{cfg.spp} "
          f"prims={scene.num_primitives} dev={jax.devices()[0]}",
          flush=True)

    bvh = build_bvh(scene)
    pack = pack_scene_pallas(scene)
    key = rng.base_key(0)
    total = cfg.num_rays
    results = {}

    def bench_chunked(tag, accel, intersect_fn):
        chunk = min(args.chunk, total)
        blocks = [jnp.minimum(jnp.arange(s, s + chunk, dtype=jnp.int32),
                              total - 1)
                  for s in range(0, total, chunk)]
        def run():
            outs = [render_ray_batch(scene, cam, cfg, key, b, accel,
                                     intersect_fn) for b in blocks]
            return outs[-1]
        secs = time_once(run)
        results[tag] = round(total / secs / 1e6, 3)
        print(f"{tag:32s} {secs:8.3f}s  {results[tag]:8.2f} Mpaths/s",
              flush=True)

    def bench_regen(tag, accel, intersect_fn):
        def run():
            return render_rays_regenerative(
                scene, cam, cfg, key, jnp.int32(0), total, accel,
                intersect_fn, pool_size=min(args.pool, total))
        secs = time_once(run)
        results[tag] = round(total / secs / 1e6, 3)
        print(f"{tag:32s} {secs:8.3f}s  {results[tag]:8.2f} Mpaths/s",
              flush=True)

    def bench_mega(tag, tile, k_pix):
        mpack = pack_scene_mega(scene)
        def run():
            return render_pixels_mega(mpack, cam, cfg, key, tile=tile,
                                      k_pix=k_pix)
        secs = time_once(run)
        results[tag] = round(total / secs / 1e6, 3)
        print(f"{tag:32s} {secs:8.3f}s  {results[tag]:8.2f} Mpaths/s",
              flush=True)

    for tile in (256, 512, 1024):
        for k_pix in (16, 32, 64, 128):
            bench_mega(f"mega/t{tile}/k{k_pix}", tile, k_pix)
    bench_chunked("wavefront/brute", None, None)
    bench_chunked("wavefront/bvh", bvh, None)
    bench_chunked("wavefront/pallas", pack, intersect_pallas)
    bench_regen("regen/brute", None, None)
    bench_regen("regen/bvh", bvh, None)
    bench_regen("regen/pallas", pack, intersect_pallas)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
