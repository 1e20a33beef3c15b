#!/usr/bin/env python
"""Megakernel knob sweep + timing on the full final scene (real TPU).

Usage: python tools/mega_ablate.py [--tiles 256,512,1024] [--kpix 32,64,128]
"""
import argparse
import os
import sys
import time

# Persistent compile cache: enabled below via utils.cache (env vars are too late
# here - sitecustomize imports jax first).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from first_raytracer_tpu.core import rng
from first_raytracer_tpu.kernels.megakernel import (pack_scene_mega,
                                                    render_pixels_mega)
from first_raytracer_tpu.scene.builders import PRESETS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="random-spheres")
    ap.add_argument("--tiles", default="512")
    ap.add_argument("--kpix", default="32,64,128")
    ap.add_argument("--unroll", default="4")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    scene, cam, cfg = PRESETS[args.preset]()
    pack = pack_scene_mega(scene)
    key = rng.base_key(0)
    total = cfg.num_rays

    print(f"# {args.preset} {cfg.nx}x{cfg.ny}@{cfg.spp} dev={jax.devices()[0]}",
          flush=True)
    for tile in (int(x) for x in args.tiles.split(",")):
      for kp in (int(x) for x in args.kpix.split(",")):
        for un in (int(x) for x in args.unroll.split(",")):
            try:
                rad, seg = render_pixels_mega(pack, cam, cfg, key, tile=tile,
                                              k_pix=kp, unroll=un)
                jax.block_until_ready((rad, seg))
                best = float("inf")
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    jax.block_until_ready(
                        render_pixels_mega(pack, cam, cfg, key, tile=tile,
                                           k_pix=kp, unroll=un))
                    best = min(best, time.perf_counter() - t0)
                print(f"tile={tile:5d} k_pix={kp:4d} unroll={un}  {best:.3f}s "
                      f"{total / best / 1e6:8.2f} Mpaths/s", flush=True)
            except Exception as e:  # noqa: BLE001 - sweep robustness
                print(f"tile={tile:5d} k_pix={kp:4d} unroll={un}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
