#!/usr/bin/env python
"""Round-4 closing probes (one TPU session):

1. Recorder VMEM-pressure test: time the tape recorder at tile=256
   (halves every (rows, T) temporary AND the tape block).  If the
   K-invariant ~60 us/tile-iteration anomaly (ROADMAP.md) is Mosaic
   spilling loop state under VMEM pressure, the per-iteration cost
   should drop superlinearly; if it stays ~flat per lane, the cost is
   intrinsic to the body.
2. Gallery: render sphere_field(5000) through the clustered megakernel
   into docs/images/sphere-field.png (the large-scene capability image).
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def _timeit(f, n=3):
    jax.block_until_ready(f())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.kernels.record_mega import (pack_scene_mega,
                                                         record_paths_mega)
    from first_raytracer_tpu.scene.builders import random_scene

    scene, cam, cfg = random_scene()
    mpack = pack_scene_mega(scene)
    key = rng.base_key(0)
    R = 1 << 17
    for tile in (512, 256):
        t = _timeit(lambda: record_paths_mega(mpack, cam, cfg, key,
                                              num_rays=R, k_rays=8,
                                              tile=tile))
        _, its = record_paths_mega(mpack, cam, cfg, key, num_rays=R,
                                   k_rays=8, tile=tile, return_iters=True)
        its = int(np.asarray(its, np.int64).sum())
        print(json.dumps(dict(probe="rec_tile", tile=tile,
                              rec_s=round(t, 4), its_total=its,
                              us_per_tile_it=round(t / max(its, 1) * 1e6,
                                                   2))), flush=True)

    from first_raytracer_tpu.kernels.megakernel_clustered import (
        render_image_mega_clustered)
    from first_raytracer_tpu.render.image import write_png
    from first_raytracer_tpu.scene.builders import sphere_field

    scene, cam, cfg = sphere_field(n=5000)
    t0 = time.perf_counter()
    img = np.asarray(render_image_mega_clustered(scene, cam, cfg))
    dt = time.perf_counter() - t0
    out = os.path.join(_ROOT, "docs", "images", "sphere-field.png")
    write_png(out, img)
    print(json.dumps(dict(probe="gallery", out=out,
                          seconds=round(dt, 2))), flush=True)


if __name__ == "__main__":
    main()
