#!/usr/bin/env python
"""Mosaic capability probe: dynamic LANE-dim VMEM slices (r6 design gate).

The r5 fieldbench decomposition found per-sweep cost grows with TOTAL
cluster count (0.88 us/sweep at 65 clusters vs 1.58 at 256 — the
statically-unrolled per-cluster bodies are a program-size cost).  The
escape is ONE sweep body in a fori_loop over a data-driven cluster
worklist — which requires slicing the (16, KC*128) tables at a DYNAMIC
128-aligned lane offset.  Leading-dim dynamic VMEM slices are known
unsupported (tpu-env-facts); this probes the LANE-dim case:

  ref[:, pl.ds(pl.multiple_of(k * 128, 128), 128)]   k from SMEM

Prints one JSON line per variant: compiled+correct, or the Mosaic error.

Run ON THE REAL CHIP:  timeout 1800 python tools/dynslice_probe.py
"""
import functools
import json
import sys

sys.path.insert(0, ".")
from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _kernel(idx_ref, tab_ref, out_ref, *, n_pick, aligned):
    def body(i, acc):
        k = idx_ref[0, i]
        off = k * 128
        if aligned:
            off = pl.multiple_of(off, 128)
        blk = tab_ref[:, pl.ds(off, 128)]          # (8, 128) dynamic slice
        return acc + blk

    acc = jnp.zeros((8, 128), jnp.float32)
    out_ref[:, :] = jax.lax.fori_loop(0, n_pick, body, acc)


def run(aligned):
    kc = 32
    tab = (np.arange(kc * 128, dtype=np.float32)[None, :]
           * np.ones((8, 1), np.float32))
    picks = np.asarray([[3, 7, 31, 0]], np.int32)
    f = pl.pallas_call(
        functools.partial(_kernel, n_pick=4, aligned=aligned),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, kc * 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    got = np.asarray(f(jnp.asarray(picks), jnp.asarray(tab)))
    want = sum(tab[:, k * 128:(k + 1) * 128] for k in (3, 7, 31, 0))
    return bool(np.allclose(got, want))


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    for aligned in (True, False):
        try:
            ok = run(aligned)
            print(json.dumps({"stage": "dynslice_probe",
                              "aligned_hint": aligned, "compiled": True,
                              "correct": ok}), flush=True)
        except Exception as e:  # noqa: BLE001 — the error IS the result
            msg = str(e)
            for key in ("Not implemented", "Unsupported", "INTERNAL",
                        "Mosaic"):
                i = msg.find(key)
                if i >= 0:
                    msg = msg[i:i + 300]
                    break
            print(json.dumps({"stage": "dynslice_probe",
                              "aligned_hint": aligned, "compiled": False,
                              "error": msg[:300]}), flush=True)


if __name__ == "__main__":
    main()
