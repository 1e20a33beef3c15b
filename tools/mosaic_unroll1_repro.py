#!/usr/bin/env python
"""Minimal repro harness for the megakernel ``unroll=1`` Mosaic failure.

Round-2 tuning found the megakernel fails to COMPILE at ``unroll=1``
(Mosaic internal error) while 2/4/8 compile and run fine
(kernels/megakernel.py body_x docstring).  Worked around by defaulting to
``unroll=2``; this harness exists to (a) confirm whether the failure still
reproduces on the current toolchain, and (b) bisect which body block
triggers it, by compiling a ladder of kernels from trivial to the full
megakernel — all at unroll=1 on a tiny config.

Each rung is compiled in a fenced try/except and reported as one JSON
line; run on the real chip (the failure is Mosaic-side, interpret mode
cannot reproduce it):

    timeout 3000 python tools/mosaic_unroll1_repro.py
"""
import functools
import json
import os
import sys
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _while_select_kernel(x_ref, o_ref, *, trips):
    """Rung 1: bare data-dependent while_loop with masked selects —
    the control-flow shape of the megakernel, none of the body."""

    def body(carry):
        it, acc = carry
        acc = jnp.where(acc < 100.0, acc + x_ref[:, :], acc)
        return it + 1, acc

    def cond(carry):
        return (carry[0] < trips) & jnp.any(carry[1] < 100.0)

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[:, :] * 0))
    o_ref[:, :] = acc


def _while_flush_kernel(x_ref, o_ref, *, trips, k):
    """Rung 2: while_loop + the one-hot block flush pattern (the
    (K, T) one-hot multiply-add into a 3K-row output block)."""
    T = x_ref.shape[1]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, T), 0)
    o_ref[:, :] = jnp.zeros((3 * k, T), jnp.float32)

    def body(carry):
        it, r = carry
        oh = (iota_k == (it % k)).astype(jnp.float32)
        o_ref[0:k, :] = o_ref[0:k, :] + oh * r
        o_ref[k:2 * k, :] = o_ref[k:2 * k, :] + oh * (r + 1.0)
        o_ref[2 * k:3 * k, :] = o_ref[2 * k:3 * k, :] + oh * (r + 2.0)
        return it + 1, r + x_ref[0:1, :]

    def cond(carry):
        return carry[0] < trips

    jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[0:1, :] * 0))


def rung(name, kernel, out_rows, trips=8, k=8, T=128):
    x = jnp.ones((8, T), jnp.float32)
    try:
        f = pl.pallas_call(
            functools.partial(kernel, trips=trips, **({"k": k} if "flush"
                                                      in name else {})),
            out_shape=jax.ShapeDtypeStruct((out_rows, T), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        jax.block_until_ready(jax.jit(f)(x))
        print(json.dumps({"rung": name, "ok": True}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001 - report and continue
        msg = "".join(traceback.format_exception_only(type(e), e))[-400:]
        print(json.dumps({"rung": name, "ok": False, "err": msg}),
              flush=True)
        return False


def full_megakernel_unroll1():
    from first_raytracer_tpu.kernels.megakernel import render_pixels_mega, \
        pack_scene_mega
    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.scene.builders import three_spheres

    scene, cam, cfg = three_spheres(nx=128, ny=8, spp=2)
    pack = pack_scene_mega(scene)
    try:
        rad, _ = render_pixels_mega(pack, cam, cfg, rng.base_key(0),
                                    tile=128, k_pix=8, unroll=1)
        jax.block_until_ready(rad)
        print(json.dumps({"rung": "full_megakernel_unroll1", "ok": True}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = "".join(traceback.format_exception_only(type(e), e))[-400:]
        print(json.dumps({"rung": "full_megakernel_unroll1", "ok": False,
                          "err": msg}), flush=True)


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    rung("while_select", _while_select_kernel, out_rows=8)
    rung("while_flush", _while_flush_kernel, out_rows=24)
    full_megakernel_unroll1()


if __name__ == "__main__":
    main()
