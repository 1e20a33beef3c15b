#!/usr/bin/env python
"""Round-5 large-scene benchmark: adjacency gates vs slab gates.

Runs the clustered megakernel on the canonical field scenes under both
gate modes, recording throughput, occupancy, the NEW executed-sweep
counter (gate selectivity), and radiance checksums (adj must bit-match
slab).  Output: JSON rows -> paste into FIELDBENCH_r5.json.

Run ON THE REAL CHIP:  timeout 3000 python tools/fieldbench_r5.py
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
from first_raytracer_tpu.scene.builders import (random_scene,  # noqa: E402
                                                sphere_field)


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
    from first_raytracer_tpu.scene.builders import triangle_field

    key = rng.base_key(0)
    cases = [("random500", random_scene()),
             ("field5000", sphere_field(n=5000)),
             ("field20000", sphere_field(n=20000)),
             ("trifield20000", triangle_field(n=20000))]
    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else ["slab",
                                                             "adj"]
    base = {}
    for name, (scene, cam, cfg) in cases:
        pack = pack_scene_mega_clustered(scene, sort_from=cam.origin)
        for gm in modes:
            rad, seg, its, swp = render_pixels_mega_clustered(
                pack, cam, cfg, key, gate_mode=gm, return_iters=True)
            t = timeit(lambda gm=gm: render_pixels_mega_clustered(
                pack, cam, cfg, key, gate_mode=gm))
            segs = int(np.asarray(seg, np.int64).sum())
            trips = int(np.asarray(its, np.int64).sum())
            sweeps = int(np.asarray(swp, np.int64).sum())
            rsum = float(np.asarray(rad, np.float64).sum())
            row = dict(stage="fieldbench_r5", scene=name, gate_mode=gm,
                       clusters=pack.clusters,
                       grid=list(pack.grid_dims),
                       seconds=round(t, 4),
                       mpaths=round(cfg.num_rays / t / 1e6, 2),
                       mrays=round(segs / t / 1e6, 2),
                       occupancy=round(segs / (trips * 512), 3),
                       sweeps_per_iter=round(sweeps / max(trips, 1), 2),
                       radiance_sum=rsum)
            if (name, "rad") in base:
                row["matches_slab"] = bool(
                    abs(rsum - base[(name, "rad")]) <= 1e-6 * abs(
                        base[(name, "rad")]))
            else:
                base[(name, "rad")] = rsum
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
