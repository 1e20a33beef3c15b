#!/usr/bin/env python
"""Op-level ablation timing of the tape recorder (real TPU).

The recorder's per-lane body measures ~12x the dense megakernel's
(ROADMAP.md "recorder per-iteration anomaly") even though the two bodies
are near-identical.  Same methodology as tools/mega_opabl.py: build
variants by exact-string surgery on kernels/record_mega.py, pin the
while loop to a FIXED trip count, time each.

Usage: python tools/rec_opabl.py [--abl all|name,...] [--trips 64]
"""
import argparse
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import jax.numpy as jnp  # noqa: F401,E402 (variants exec against these)
import numpy as np  # noqa: F401,E402

from first_raytracer_tpu.core import rng
from first_raytracer_tpu.scene.builders import random_scene

SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "first_raytracer_tpu", "kernels", "record_mega.py")

ABLATIONS = {
    "base": [],
    # Tape write: the one block mega doesn't have.
    "nowrite": [("        if not skip_write:",
                 "        if False:")],
    # Payload extraction matmul + winner-t replay inputs.
    "noextract": [("            res_s = extract_tbl(sph_ref, oh_s)",
                   "            res_s = sph_ref[:, 0:1] * jnp.ones((1, T),"
                   " f32)")],
    # Sphere sweep dot products (mega_opabl 'nodots' analog).
    "nodots": [("            dc = cx * dx + cy * dy + cz * dz",
                "            dc = cx * dx"),
               ("            oc_ = cx * ox + cy * oy + cz * oz",
                "            oc_ = cx * ox")],
    # Packed selection.
    "nopack": [("            ps, _ = packed_min(tall, iota_s, idx_bits_s)",
                "            ps = jnp.zeros((1, T), i32)")],
    # Second (next-sample camera) RNG domain.
    "nodraws2": [("        ju, jv, lu, lv = draws4(nrid.astype(u32), "
                  "jnp.zeros((1, T), u32))",
                  "        ju, jv, lu, lv = u1, u2, u3, coin")],
    # Bounce-domain RNG too (both threefry pairs gone).
    "nodraws": [("        u1, u2, u3, coin = draws4(ridu, dom2)",
                 "        u1, u2, u3, coin = ox * 0.5, oy * 0.5, "
                 "oz * 0.5, dx"),
                ("        ju, jv, lu, lv = draws4(nrid.astype(u32), "
                 "jnp.zeros((1, T), u32))",
                 "        ju, jv, lu, lv = u1, u2, u3, coin")],
    # Camera regeneration math.
    "nocamera": [("        cox, coy, coz, cdx, cdy, cdz = camera_ray(\n"
                  "            jnp.minimum(samp, S - 1), ju, jv, lu, lv)",
                  "        cox, coy, coz, cdx, cdy, cdz = "
                  "ox, oy, oz, dx, dy, dz")],
    # Tape BLOCK size: rpad 408 -> 8 rows at unchanged T=512.  The
    # tile=256 probe halved block and lanes together; this separates
    # them — if the whole-body slowdown is VMEM-residency pressure from
    # the (rpad, T) accumulator, this variant collapses to ~mega cost.
    "smallblock": [("    rpad = -(-(k_rays * D) // 8) * 8",
                    "    rpad = 8"),
                   ("            row = sampc * D + depth",
                    "            row = sampc * 0"),
                   # Post-process expects the full-height block; stub it
                   # but keep a data dependency so the kernel survives DCE.
                   ("    tape = (tape[:k_rays * D].reshape(k_rays, D, "
                    "lanes)\n            .transpose(1, 0, 2).reshape(D, "
                    "k_rays * lanes))[:, :num_rays]",
                    "    tape = jnp.zeros((D, num_rays), jnp.int32) "
                    "+ tape[0, 0].astype(jnp.int32)")],
    # ray_of / id arithmetic (3 calls per body).
    "noray": [("        rid, _ = ray_of(sampc)",
               "        rid = sampc"),
              ("        nrid, _ = ray_of(jnp.minimum(sampc + 1, S - 1))",
               "        nrid = sampc")],
}


def build_variant(name, repls, trips):
    with open(SRC) as f:
        src = f.read()
    for old, new in repls:
        assert old in src, f"{name}: pattern not found: {old[:60]!r}"
        src = src.replace(old, new)
    old_cond = ("    def cond(carry):\n"
                "        return (carry[0] < max_it) & jnp.any(carry[1] < S)")
    assert old_cond in src
    src = src.replace(old_cond,
                      "    def cond(carry):\n"
                      f"        return carry[0] < {trips}")
    modname = f"first_raytracer_tpu.kernels.rec_abl_{name}"
    mod = types.ModuleType(modname)
    mod.__dict__["__package__"] = "first_raytracer_tpu.kernels"
    sys.modules[modname] = mod
    exec(compile(src, f"<rec_abl:{name}>", "exec"), mod.__dict__)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trips", type=int, default=64)
    ap.add_argument("--abl", default="all")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    scene, cam, cfg = random_scene()
    key = rng.base_key(0)
    R = 1 << 17

    names = list(ABLATIONS) if args.abl == "all" else args.abl.split(",")
    base = None
    for name in names:
        mod = build_variant(name, ABLATIONS[name], args.trips)
        pack = mod.pack_scene_mega(scene)
        run = lambda: mod.record_paths_mega(  # noqa: E731
            pack, cam, cfg, key, num_rays=R, k_rays=8)
        try:
            jax.block_until_ready(run())
        except Exception as e:
            print(f"{name:10s} FAILED: {str(e)[:120]}", flush=True)
            continue
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            best = min(best, time.perf_counter() - t0)
        tiles = -(-R // (512 * 8))
        us = best / (args.trips * tiles) * 1e6
        if name == "base":
            base = best
        delta = f"  saves {100 * (1 - best / base):5.1f}%" if base else ""
        print(f"{name:10s} {best:.4f}s  {us:7.2f} us/body{delta}",
              flush=True)


if __name__ == "__main__":
    main()
