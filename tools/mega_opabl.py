#!/usr/bin/env python
"""Op-level ablation timing of the megakernel (real TPU).

Times kernel variants with selected op groups stubbed out, under a FIXED
bounce-loop trip count so control-flow changes can't skew the comparison.
Variants are built by exact-string surgery on kernels/megakernel.py source
and exec'd as scratch modules — nothing here changes shipped code.

Usage: python tools/mega_opabl.py [--trips 0(auto)] [--abl all|name,...]
"""
import argparse
import os
import sys
import time
import types

# Persistent compile cache: enabled below via utils.cache (env vars are too late
# here - sitecustomize imports jax first).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import numpy as np

from first_raytracer_tpu.core import rng
from first_raytracer_tpu.scene.builders import PRESETS

SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "first_raytracer_tpu", "kernels", "megakernel.py")

# Each ablation: list of (old, new) exact-string replacements.
ABLATIONS = {
    "base": [],
    "nosqrt": [("            sq = jnp.sqrt(disc)",
                "            sq = disc")],
    "rsqrt": [("            sq = jnp.sqrt(disc)",
               "            sq = disc * jax.lax.rsqrt(disc)")],
    "nopack": [("            ps, _ = packed_min(tall, iota_s, idx_bits_s)",
                "            ps = jnp.zeros((1, T), i32)")],
    "nodots": [("            dc = cx * dx + cy * dy + cz * dz",
                "            dc = cx * dx"),
               ("            oc_ = cx * ox + cy * oy + cz * oz",
                "            oc_ = cx * ox")],
    "noquad": [("            bq = od - dc\n            cq = oo - 2.0 * oc_ + c0",
                "            bq = od - dc\n            cq = oo - oc_")],
    "noflush": [("        rad_ref[0:K, :] = rad_ref[0:K, :] + ohf * rx\n"
                 "        rad_ref[K:2 * K, :] = rad_ref[K:2 * K, :] + ohf * ry\n"
                 "        rad_ref[2 * K:3 * K, :] = rad_ref[2 * K:3 * K, :] + ohf * rz",
                 "        rad_ref[0:K, :] = rad_ref[0:K, :] + ohf * rx")],
    "nowinner": [("            t_s = jnp.where(tnw > t_min, tnw,\n"
                  "                            jnp.where(tfw > t_min, tfw, f32(_BIG)))",
                  "            t_s = jnp.min(tall, axis=0)[None, :]")],
    "nodraws2": [("        ju, jv, lu, lv = draws4(nrid, jnp.zeros_like(nrid))",
                  "        ju, jv, lu, lv = u1, u2, u3, coin")],
    "noshade": [("        bz = 1.0 - 2.0 * u1",
                 "        is_metal = is_diel = jnp.zeros((1, T), jnp.bool_)\n"
                 "        is_check = jnp.zeros((1, T), jnp.bool_)\n"
                 "        bz = 1.0 - 2.0 * u1")],
}


def build_variant(name, repls, trips):
    with open(SRC) as f:
        src = f.read()
    for old, new in repls:
        assert old in src, f"{name}: pattern not found: {old[:60]!r}"
        src = src.replace(old, new)
    # Fixed trip count: the while cond ignores lane completion.
    old_cond = ("    def cond(carry):\n"
                "        return (carry[0] < max_it) & jnp.any(carry[1] < S)")
    assert old_cond in src
    src = src.replace(old_cond,
                      "    def cond(carry):\n"
                      f"        return carry[0] < {trips}")
    modname = f"first_raytracer_tpu.kernels.mega_abl_{name}"
    mod = types.ModuleType(modname)
    mod.__dict__["__package__"] = "first_raytracer_tpu.kernels"
    sys.modules[modname] = mod
    exec(compile(src, f"<mega_abl:{name}>", "exec"), mod.__dict__)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="random-spheres")
    ap.add_argument("--trips", type=int, default=0)
    ap.add_argument("--abl", default="all")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    scene, cam, cfg = PRESETS[args.preset]()
    key = rng.base_key(0)

    trips = args.trips
    if not trips:
        from first_raytracer_tpu.kernels.megakernel import (
            pack_scene_mega, render_pixels_mega)
        pack = pack_scene_mega(scene)
        _, _, its = render_pixels_mega(pack, cam, cfg, key, return_iters=True)
        trips = int(np.asarray(its).max())
        # while-loop body is 4x-unrolled: its counts bodies, trips are /4.
        trips = -(-trips // 4)
        print(f"# fixed trips = {trips} (max tile bodies "
              f"{int(np.asarray(its).max())})", flush=True)

    names = list(ABLATIONS) if args.abl == "all" else args.abl.split(",")
    base = None
    for name in names:
        mod = build_variant(name, ABLATIONS[name], trips)
        pack = mod.pack_scene_mega(scene)
        run = lambda: mod.render_pixels_mega(pack, cam, cfg, key)  # noqa: E731
        jax.block_until_ready(run())
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            best = min(best, time.perf_counter() - t0)
        if name == "base":
            base = best
        delta = f"  saves {100 * (1 - best / base):5.1f}%" if base else ""
        print(f"{name:10s} {best:.3f}s{delta}", flush=True)


if __name__ == "__main__":
    main()
