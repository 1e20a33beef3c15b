#!/usr/bin/env python
"""Graft a recorder-style tape write onto the DENSE megakernel (timing
probe, real TPU).

The recorder's whole body runs ~10x slower per lane than the megakernel's
near-identical body (ROADMAP "recorder per-iteration anomaly"), and the
ablation ladder + shape probe exclude every op group, the block size and
the loop length.  Remaining hypothesis: something about the recorder
PROGRAM crosses a Mosaic codegen cliff that the megakernel program does
not.  This probe adds the recorder's two distinguishing features to the
megakernel by source surgery — (a) a (408, T) f32 accumulator output
written with a one-hot row per iteration, (b) nothing else — and times
it.  If the grafted megakernel stays ~6-8 us/body, a megakernel-derived
recorder would run ~6x faster than today's, and diffing the two programs
isolates the cliff.

The tape CONTENT here is meaningless (row index is a timing stand-in);
only radiance output correctness is asserted (the graft must not perturb
the render).
"""
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import numpy as np

from first_raytracer_tpu.core import rng
from first_raytracer_tpu.scene.builders import random_scene

SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "first_raytracer_tpu", "kernels", "megakernel.py")

GRAFT = [
    # extra output ref in the kernel signature
    ("def _mega_kernel(cam_ref, key_ref, pix0_ref, sph_ref, mx_ref, tri_ref,\n"
     "                 rad_ref, seg_ref, it_ref, *,",
     "def _mega_kernel(cam_ref, key_ref, pix0_ref, sph_ref, mx_ref, tri_ref,\n"
     "                 rad_ref, seg_ref, it_ref, tape_ref, *,"),
    # zero-init + row iota (mirrors the recorder)
    ("    rad_ref[:, :] = jnp.zeros((3 * K, T), f32)",
     "    rad_ref[:, :] = jnp.zeros((3 * K, T), f32)\n"
     "    tape_ref[:, :] = jnp.zeros((408, T), f32)\n"
     "    iota_r = jax.lax.broadcasted_iota(i32, (408, T), 0)"),
    # the one-hot accumulate per iteration (recorder's write, stand-in row)
    ("        segs = segs + jnp.where(active, 1, 0)",
     "        segs = segs + jnp.where(active, 1, 0)\n"
     "        row = depth + (sampc & 7) * 51\n"
     "        val = jnp.where(hit, (ps + 1).astype(f32), 0.0)\n"
     "        tape_ref[:, :] = tape_ref[:, :] + (iota_r == row).astype(f32)"
     " * val"),
    # extra out spec / shape
    ("        out_specs=(\n"
     "            pl.BlockSpec((3 * k_pix, tile), lambda i: (0, i),\n"
     "                         memory_space=pltpu.VMEM),\n"
     "            pl.BlockSpec((1, tile), lambda i: (0, i),\n"
     "                         memory_space=pltpu.VMEM),\n"
     "            pl.BlockSpec((1, tile), lambda i: (0, i),\n"
     "                         memory_space=pltpu.VMEM),\n"
     "        ),",
     "        out_specs=(\n"
     "            pl.BlockSpec((3 * k_pix, tile), lambda i: (0, i),\n"
     "                         memory_space=pltpu.VMEM),\n"
     "            pl.BlockSpec((1, tile), lambda i: (0, i),\n"
     "                         memory_space=pltpu.VMEM),\n"
     "            pl.BlockSpec((1, tile), lambda i: (0, i),\n"
     "                         memory_space=pltpu.VMEM),\n"
     "            pl.BlockSpec((408, tile), lambda i: (0, i),\n"
     "                         memory_space=pltpu.VMEM),\n"
     "        ),"),
    ("        out_shape=(\n"
     "            jax.ShapeDtypeStruct((3 * k_pix, lanes), jnp.float32),\n"
     "            jax.ShapeDtypeStruct((1, lanes), jnp.int32),\n"
     "            jax.ShapeDtypeStruct((1, lanes), jnp.int32),\n"
     "        ),",
     "        out_shape=(\n"
     "            jax.ShapeDtypeStruct((3 * k_pix, lanes), jnp.float32),\n"
     "            jax.ShapeDtypeStruct((1, lanes), jnp.int32),\n"
     "            jax.ShapeDtypeStruct((1, lanes), jnp.int32),\n"
     "            jax.ShapeDtypeStruct((408, lanes), jnp.float32),\n"
     "        ),"),
    ("    rad, seg, its = pl.pallas_call(",
     "    rad, seg, its, _tape = pl.pallas_call("),
]


def build(name, repls):
    with open(SRC) as f:
        src = f.read()
    for old, new in repls:
        assert old in src, f"pattern not found: {old[:60]!r}"
        src = src.replace(old, new)
    modname = f"first_raytracer_tpu.kernels.mega_graft_{name}"
    mod = types.ModuleType(modname)
    mod.__dict__["__package__"] = "first_raytracer_tpu.kernels"
    sys.modules[modname] = mod
    exec(compile(src, f"<mega_graft:{name}>", "exec"), mod.__dict__)
    return mod


def main():
    scene, cam, cfg = random_scene()
    key = rng.base_key(0)
    for name, repls in (("base", []), ("tapegraft", GRAFT)):
        mod = build(name, repls)
        pack = mod.pack_scene_mega(scene)
        run = lambda: mod.render_pixels_mega(pack, cam, cfg, key)  # noqa
        rad0, _ = jax.block_until_ready(run())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        _, _, its = mod.render_pixels_mega(pack, cam, cfg, key,
                                           return_iters=True)
        its = int(np.asarray(its, np.int64).sum())
        out = dict(probe="tapegraft", variant=name,
                   seconds=round(ts[1], 4), its_total=its,
                   us_per_tile_it=round(ts[1] / max(its, 1) * 1e6, 2),
                   radiance_sum=float(np.asarray(rad0,
                                                 np.float64).sum()))
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
