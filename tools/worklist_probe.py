#!/usr/bin/env python
"""Worklist-vs-static-gates mechanism probe (r6 traversal design gate).

r5 measured the gated-sweep architecture's costs: ~0.3-0.44 us per
static `pl.when` gate site per iteration plus a per-sweep fixed cost
that GROWS with total cluster count (0.88 us at 65 bodies -> 1.58 us at
256 — statically-unrolled program size).  The escape hatch is ONE sweep
body behind a scalar worklist: gate bits ride in SMEM words, a scalar
while-loop skips unset bits for ~free, and the body slices the cluster
tables at a DYNAMIC 128-aligned offset.

Variants (the sweep needs (128, 1) column operands, i.e. the mx-table
layout whose cluster axis is the LEADING dim):

- static:   today's architecture — 256 statically-unrolled bodies with
            static leading-dim slices, each behind a scalar-bit pl.when.
- wl_sub:   one body in a scalar while-loop, DYNAMIC leading-dim slice
            of the (KC*128, 8) mx-style table (the r2-era note says
            leading-dim dynamic VMEM slices fail — re-probed here).
- wl_lane:  one body, dynamic LANE-dim slice of a (8, KC*128) table
            (proven supported by tools/dynslice_probe.py) + an in-body
            (1,128)->(128,1) reshape per operand row.

Gate patterns with {16, 32, 64} active of 256 isolate the per-active-
cluster marginal cost of each mechanism.

Run ON THE REAL CHIP:  timeout 3000 python tools/worklist_probe.py
"""
import functools
import json
import sys
import time

sys.path.insert(0, ".")
from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

KC = 256
T = 512
ROWS = 4


def _sweep_cols(cx, cy, cz, c0, d, cur):
    """Sweep-shaped math on (128, 1) columns vs a (1, T) ray row."""
    dc = cx * d + cy * d + cz * d
    bq = dc - c0
    disc = bq * bq - c0
    sq = jnp.sqrt(jnp.abs(disc))
    tn = -bq - sq
    tf = sq - bq
    tall = jnp.where(tn > 0.001, tn, jnp.where(tf > 0.001, tf, 1e30))
    t_cl = jnp.min(tall, axis=0)[None, :]
    return jnp.minimum(cur, t_cl)


def _kernel(bits_ref, mx_ref, lane_ref, d_ref, out_ref, *, iters, kind):
    d = d_ref[0:1, :]

    def sweep_static(k):
        j0 = k * 128
        out_ref[0:1, :] = _sweep_cols(
            mx_ref[j0:j0 + 128, 0:1], mx_ref[j0:j0 + 128, 1:2],
            mx_ref[j0:j0 + 128, 2:3], mx_ref[j0:j0 + 128, 3:4],
            d, out_ref[0:1, :])

    def sweep_dyn_sub(k):
        off = pl.multiple_of(k * 128, 128)
        blk = mx_ref[pl.ds(off, 128), :]
        out_ref[0:1, :] = _sweep_cols(
            blk[:, 0:1], blk[:, 1:2], blk[:, 2:3], blk[:, 3:4],
            d, out_ref[0:1, :])

    def sweep_dyn_lane(k):
        off = pl.multiple_of(k * 128, 128)
        blk = lane_ref[:, pl.ds(off, 128)]        # (4, 128)
        cx = blk[0:1, :].reshape(128, 1)
        cy = blk[1:2, :].reshape(128, 1)
        cz = blk[2:3, :].reshape(128, 1)
        c0 = blk[3:4, :].reshape(128, 1)
        out_ref[0:1, :] = _sweep_cols(cx, cy, cz, c0, d, out_ref[0:1, :])

    def one_iter(_, acc):
        if kind == "static":
            for k in range(KC):
                word = bits_ref[0, k // 32]
                bit = (word >> (k % 32)) & 1
                pl.when(bit == 1)(functools.partial(sweep_static, k))
            return acc

        sweep = sweep_dyn_sub if kind == "wl_sub" else sweep_dyn_lane

        def cond(c):
            return c < KC

        def body(k):
            word = bits_ref[0, k // 32]
            bit = (word >> (k % 32)) & 1
            pl.when(bit == 1)(functools.partial(sweep, k))
            return k + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))
        return acc

    out_ref[0:1, :] = jnp.full((1, T), 1e30, jnp.float32)
    jax.lax.fori_loop(0, iters, one_iter, jnp.float32(0.0))


def run(kind, bits, iters):
    kern = functools.partial(_kernel, iters=iters, kind=kind)
    r = np.random.RandomState(0)
    mx = jnp.asarray(r.rand(KC * 128, 8).astype(np.float32))
    lane = jnp.asarray(r.rand(ROWS, KC * 128).astype(np.float32))
    d = jnp.asarray(np.random.RandomState(1).rand(1, T).astype(np.float32))
    f = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((KC * 128, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ROWS, KC * 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, T), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, T), jnp.float32))
    return np.asarray(f(jnp.asarray(bits), mx, lane, d))


def timed(kind, bits, iters, reps=3):
    out = run(kind, bits, iters)   # compile + readback sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(kind, bits, iters)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def bitmask(active):
    r = np.random.RandomState(42)
    picks = r.choice(KC, size=active, replace=False)
    words = np.zeros((1, KC // 32), np.uint32)
    for k in picks:
        words[0, k // 32] |= np.uint32(1) << np.uint32(k % 32)
    return words.astype(np.int32)


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    iters = 2000
    for kind in ("static", "wl_sub", "wl_lane"):
        base = None
        for active in (16, 32, 64):
            bits = bitmask(active)
            try:
                t, out = timed(kind, bits, iters)
            except Exception as e:  # noqa: BLE001 — the error IS data
                msg = str(e)
                for key in ("Not implemented", "Unsupported", "INTERNAL",
                            "Mosaic"):
                    i = msg.find(key)
                    if i >= 0:
                        msg = msg[i:i + 250]
                        break
                print(json.dumps({"stage": "worklist_probe", "kind": kind,
                                  "active": active, "error": msg[:250]}),
                      flush=True)
                break
            us_iter = t / iters * 1e6
            row = {"stage": "worklist_probe", "kind": kind,
                   "active": active, "iters": iters,
                   "us_per_iter": round(us_iter, 2),
                   "checksum": float(out.sum())}
            if base is None:
                base = (active, us_iter)
            else:
                row["us_per_extra_sweep"] = round(
                    (us_iter - base[1]) / (active - base[0]), 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__" and "--v2" not in sys.argv:
    main()


# ---- probe v2: ctz set-bit iteration + vector->scalar bitmask ----

def _kernel_v2(bits_ref, mx_ref, gate_ref, d_ref, w16_ref, out_ref, *,
               iters, kind):
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    d = d_ref[0:1, :]

    def sweep_dyn_sub(k):
        off = pl.multiple_of(k * 128, 128)
        blk = mx_ref[pl.ds(off, 128), :]
        out_ref[0:1, :] = _sweep_cols(
            blk[:, 0:1], blk[:, 1:2], blk[:, 2:3], blk[:, 3:4],
            d, out_ref[0:1, :])

    def one_iter_ctz(_, acc):
        # Iterate only over SET bits: k = ctz(word); word &= word - 1.
        # Trips == active count, not KC.
        for w in range(KC // 32):
            word0 = bits_ref[0, w].astype(u32)

            def cond(c):
                return c[0] != u32(0)

            def body(c):
                word, base = c
                low = word & (~word + u32(1))          # lowest set bit
                k = base + (31 - jax.lax.clz(low).astype(i32))
                sweep_dyn_sub(k)
                return (word & (word - u32(1)), base)

            jax.lax.while_loop(cond, body, (word0, jnp.int32(w * 32)))
        return acc

    def one_iter_extract(_, acc):
        # Vector->scalar bitmask: (KC, 1) gate vector -> 16 exact f32
        # half-word sums -> scalar words (then one ctz sweep pass so the
        # extraction feeds real consumers).
        g = gate_ref[:, 0:1]                            # (KC, 1) 0/1
        halves = []
        w16 = w16_ref[:, 0:1]
        for h in range(KC // 16):
            s = jnp.sum(g[h * 16:(h + 1) * 16, :] * w16)
            halves.append(s.astype(i32))
        for w in range(KC // 32):
            word0 = (halves[2 * w]
                     + halves[2 * w + 1] * i32(65536)).astype(u32)

            def cond(c):
                return c[0] != u32(0)

            def body(c):
                word, base = c
                low = word & (~word + u32(1))
                k = base + (31 - jax.lax.clz(low).astype(i32))
                sweep_dyn_sub(k)
                return (word & (word - u32(1)), base)

            jax.lax.while_loop(cond, body, (word0, jnp.int32(w * 32)))
        return acc

    out_ref[0:1, :] = jnp.full((1, T), 1e30, f32)
    body_fn = one_iter_ctz if kind == "wl_ctz" else one_iter_extract
    jax.lax.fori_loop(0, iters, body_fn, jnp.float32(0.0))


def run_v2(kind, bits, gates, iters):
    kern = functools.partial(_kernel_v2, iters=iters, kind=kind)
    r = np.random.RandomState(0)
    mx = jnp.asarray(r.rand(KC * 128, 8).astype(np.float32))
    d = jnp.asarray(np.random.RandomState(1).rand(1, T).astype(np.float32))
    f = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((KC * 128, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((KC, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, T), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, T), jnp.float32))
    w16 = jnp.asarray([[float(1 << b)] for b in range(16)], jnp.float32)
    return np.asarray(f(jnp.asarray(bits), mx, jnp.asarray(gates), d,
                        w16))


def main_v2():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    iters = 2000
    for kind in ("wl_ctz", "wl_extract"):
        base = None
        for active in (16, 32, 64):
            bits = bitmask(active)
            gates = np.zeros((KC, 1), np.float32)
            ubits = bits.view(np.uint32)
            for w in range(KC // 32):
                for b in range(32):
                    if int(ubits[0, w]) & (1 << b):
                        gates[w * 32 + b, 0] = 1.0
            try:
                out = run_v2(kind, bits, gates, iters)  # compile+sync
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    run_v2(kind, bits, gates, iters)
                    ts.append(time.perf_counter() - t0)
                ts.sort()
                t = ts[1]
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                for key in ("Not implemented", "Unsupported", "INTERNAL",
                            "Mosaic"):
                    i = msg.find(key)
                    if i >= 0:
                        msg = msg[i:i + 250]
                        break
                print(json.dumps({"stage": "worklist_probe_v2",
                                  "kind": kind, "active": active,
                                  "error": msg[:250]}), flush=True)
                break
            us_iter = t / iters * 1e6
            row = {"stage": "worklist_probe_v2", "kind": kind,
                   "active": active, "us_per_iter": round(us_iter, 2),
                   "checksum": float(out.sum())}
            if base is None:
                base = (active, us_iter)
            else:
                row["us_per_extra_sweep"] = round(
                    (us_iter - base[1]) / (active - base[0]), 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__" and "--v2" in sys.argv:
    main_v2()
