#!/usr/bin/env python
"""hier tuning sweep: supergroup fan-out x k_pix at field20000/field5000.

The FIELDBENCH_r5 decomposition (per-gate-site + per-sweep fixed costs)
predicts an optimum fan-out below the initial 8 for the 256-cluster
field; this measures it, then sweeps k_pix at the winning fan-out.

Run ON THE REAL CHIP:  timeout 3000 python tools/hier_tune_r5.py
"""
import json
import sys
import time

sys.path.insert(0, ".")
from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa

enable_persistent_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from first_raytracer_tpu.core import rng  # noqa: E402
from first_raytracer_tpu.kernels.megakernel_clustered import (  # noqa: E402
    pack_scene_mega_clustered, render_pixels_mega_clustered)
from first_raytracer_tpu.scene.builders import sphere_field  # noqa: E402


def timeit(fn, reps=3):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    key = rng.base_key(0)
    scene, cam, cfg = sphere_field(n=20000)
    best = (8, 96, 1e9)
    for fan in (4, 6, 8, 12):
        pack = pack_scene_mega_clustered(scene, sort_from=cam.origin,
                                         super_fanout=fan)
        rad, seg, its, swp = render_pixels_mega_clustered(
            pack, cam, cfg, key, gate_mode="hier", return_iters=True)
        t = timeit(lambda: render_pixels_mega_clustered(
            pack, cam, cfg, key, gate_mode="hier"))
        segs = int(np.asarray(seg, np.int64).sum())
        trips = int(np.asarray(its, np.int64).sum())
        sweeps = int(np.asarray(swp, np.int64).sum())
        print(json.dumps({
            "stage": "hier_tune", "scene": "field20000", "fan_out": fan,
            "supers": len(pack.super_spans), "seconds": round(t, 4),
            "mpaths": round(cfg.num_rays / t / 1e6, 3),
            "sweeps_per_iter": round(sweeps / max(trips, 1), 2),
            "radiance_sum": float(np.asarray(rad, np.float64).sum())}),
            flush=True)
        if t < best[2]:
            best = (fan, 96, t)
    fan = best[0]
    pack = pack_scene_mega_clustered(scene, sort_from=cam.origin,
                                     super_fanout=fan)
    for kp in (64, 128):
        t = timeit(lambda kp=kp: render_pixels_mega_clustered(
            pack, cam, cfg, key, gate_mode="hier", k_pix=kp))
        print(json.dumps({"stage": "hier_tune", "scene": "field20000",
                          "fan_out": fan, "k_pix": kp,
                          "seconds": round(t, 4),
                          "mpaths": round(cfg.num_rays / t / 1e6, 3)}),
              flush=True)
    # field5000 at the winning fan-out for the record.
    scene, cam, cfg = sphere_field(n=5000)
    for f in (fan, 8):
        if f == 8 and fan == 8:
            continue
        pack = pack_scene_mega_clustered(scene, sort_from=cam.origin,
                                         super_fanout=f)
        t = timeit(lambda pack=pack: render_pixels_mega_clustered(
            pack, cam, cfg, key, gate_mode="hier"))
        print(json.dumps({"stage": "hier_tune", "scene": "field5000",
                          "fan_out": f, "seconds": round(t, 4),
                          "mpaths": round(cfg.num_rays / t / 1e6, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
