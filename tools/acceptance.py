#!/usr/bin/env python
"""Full-size acceptance run (SURVEY.md §4.3): the four canonical driver
configs [BASELINE.json:7-10] rendered at full scale on the real chip.

For each preset:
- render the FULL config on the megakernel fast path (timed);
- render the same config on the wavefront path (the oracle-adjacent
  XLA implementation) and compare images;
- spot-check a random ray subsample against the recursive NumPy oracle
  (the stand-in for the missing reference; SURVEY.md §0).

Prints one JSON line per preset and exits nonzero on any gate failure.
Usage: python tools/acceptance.py [--skip-oracle]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import numpy as np

from first_raytracer_tpu.core import rng
from first_raytracer_tpu.kernels.megakernel import render_image_mega
from first_raytracer_tpu.oracle import native_oracle
from first_raytracer_tpu.oracle.cpu_oracle import render_oracle
from first_raytracer_tpu.render.api import render_image, render_ray_batch
from first_raytracer_tpu.scene.builders import PRESETS


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the per-preset rows to this JSON file "
                         "(the per-round ACCEPTANCE_r*.json artifact)")
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--oracle-rays", type=int, default=2048,
                    help="per-preset ray subsample checked against the "
                         "oracle; the C++ oracle (~100x NumPy) makes "
                         "thousands cheap, and falls back to 64 NumPy "
                         "rays if the .so is not built")
    args = ap.parse_args(argv)

    failures = 0
    rows = []

    def write_out():
        # Written after EVERY preset (not just at the end) so a mid-run
        # failure still ships the rows already gathered (ADVICE r3).
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"device": str(jax.devices()[0]),
                           "failures": failures,
                           "complete": len(rows) == 4, "rows": rows}, f,
                          indent=1)
    # The four canonical driver configs [BASELINE.json:7-10].  The
    # sphere-field stress preset is deliberately excluded: its 20k spheres
    # exceed the megakernel's 2^14 packed-selection budget by design — the
    # clustered kernel owns that regime (tools/crossover_bench.py).
    canonical = ("three-spheres", "random-spheres", "triangle-mesh",
                 "camera-effects")
    for name in canonical:
        preset = PRESETS[name]
        scene, cam, cfg = preset()  # FULL canonical size
        jax.block_until_ready(render_image_mega(scene, cam, cfg))  # compile
        # Split device render from host readback (VERDICT r4 items 4/6):
        # r4's single np.asarray() timing mixed the device frame with the
        # device->host image transfer over the axon tunnel, producing
        # numbers 4x off the (device-only, by the driver's definition)
        # bench — and easily misread as a regression.
        t0 = time.perf_counter()
        img_dev = jax.block_until_ready(render_image_mega(scene, cam, cfg))
        t_dev = time.perf_counter() - t0
        t0 = time.perf_counter()
        img_mega = np.asarray(img_dev)
        t_read = time.perf_counter() - t0
        t_mega = t_dev + t_read
        img_wave = np.asarray(render_image(scene, cam, cfg))
        d = np.abs(img_mega - img_wave)
        # The megakernel's documented ulp-level deviations (cbrt/rsqrt)
        # flip a rare near-silhouette *sample*; a flipped sample moves its
        # pixel by O(1/spp), so the affected-pixel gate scales with spp
        # while the bulk (median/mean) must stay at float-noise level.
        frac_bad = float((d > 1e-3).mean())
        row = {
            "preset": name,
            "config": f"{cfg.nx}x{cfg.ny}@{cfg.spp}spp d{cfg.max_depth}",
            "mega_device_seconds": round(t_dev, 3),
            "mega_readback_seconds": round(t_read, 3),
            "mega_seconds_e2e": round(t_mega, 3),
            "mega_mpaths_s_device": round(cfg.num_rays / t_dev / 1e6, 2),
            "mega_mpaths_s_e2e": round(cfg.num_rays / t_mega / 1e6, 2),
            "mega_vs_wavefront_frac_gt_1e3": frac_bad,
            "mega_vs_wavefront_mean": float(d.mean()),
            "mega_vs_wavefront_median": float(np.median(d)),
        }
        ok = (frac_bad < max(0.01, 0.3 / cfg.spp)
              and float(np.median(d)) < 1e-6 and float(d.mean()) < 2e-3)
        if not args.skip_oracle:
            n_rays = args.oracle_rays
            use_native = native_oracle.available()
            if not use_native:
                n_rays = min(n_rays, 64)  # NumPy oracle is ~100x slower
            r = np.random.RandomState(1)
            ids = np.sort(r.choice(cfg.num_rays, size=n_rays,
                                   replace=False)).astype(np.int64)
            if use_native:
                o_ref = native_oracle.render_oracle_native(
                    scene, cam, cfg, ray_ids=ids)
            else:
                o_ref = render_oracle(scene, cam, cfg, ray_ids=ids)
            o_tpu = np.asarray(render_ray_batch(
                scene, cam, cfg, rng.base_key(0),
                jnp.asarray(ids, jnp.int32)))
            od = np.abs(o_ref - o_tpu).max(axis=1)
            row["oracle_rays"] = n_rays
            row["oracle_native"] = use_native
            row["oracle_rays_matching_1e4"] = float((od < 1e-4).mean())
            ok = ok and row["oracle_rays_matching_1e4"] > 0.95
        row["pass"] = bool(ok)
        failures += 0 if ok else 1
        rows.append(row)
        print(json.dumps(row), flush=True)
        write_out()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
