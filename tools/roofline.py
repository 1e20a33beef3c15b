#!/usr/bin/env python
"""Measured VPU/MXU roofline for THIS chip (VERDICT r4 item 2).

Three rounds defended the flat 38.6 Mpaths/s headline with an *estimated*
VPU peak (bench.py's 1-2e12 f32 FLOP/s).  This tool measures the actual
sustained rates through the axon tunnel so BASELINE.md can state headline
utilization against a number, not a guess:

- ``fma``: chained independent f32 FMAs at several shapes — small blocks
  (register-resident) for the hardware ceiling, (512, 512) blocks for the
  megakernel's actual working shape (sweep temporaries live in VMEM).
- ``sqrt``: sqrt+add chain (the sweep's discriminant root; transcendentals
  run slower than FMAs on the VPU and are ~8% of the kernel body).
- ``mxu``: chained f32 HIGHEST-precision (512,512)@(512,512) matmuls (the
  payload-extraction op class).

Each measurement runs the kernel at ``iters`` and ``2*iters`` trips and
differences the times, cancelling launch/tunnel overhead.  Output: JSON
rows + a summary line for BASELINE.md.

Run ON THE REAL CHIP:  timeout 3000 python tools/roofline.py
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _fma_kernel(c_ref, out_ref, *, iters, n_acc, rows, cols, op):
    f32 = jnp.float32
    # Mosaic iota is integer-only; build the f32 ramp via convert.
    base = (jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
            .astype(f32) * f32(1e-4) + f32(0.5))
    accs = tuple(base + f32(0.01 * i) for i in range(n_acc))
    # Runtime constants (SMEM): nothing about the recurrence is
    # compile-time foldable.
    c1 = c_ref[0, 0]
    c2 = c_ref[0, 1]

    def body(_, accs):
        if op == "sqrt":
            # sqrt keeps values in [~0.5, 1.2]: fixed-point-ish chain.
            return tuple(jnp.sqrt(a) + c2 for a in accs)
        return tuple(a * c1 + c2 for a in accs)

    accs = jax.lax.fori_loop(0, iters, body, accs)
    s = accs[0]
    for a in accs[1:]:
        s = s + a
    out_ref[:, :] = s


def run_fma(iters, n_acc, rows, cols, grid, op="fma"):
    kern = functools.partial(_fma_kernel, iters=iters, n_acc=n_acc,
                             rows=rows, cols=cols, op=op)
    c = jnp.asarray([[0.999999, 1.3e-6]], jnp.float32)
    f = pl.pallas_call(
        kern, grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rows, cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols * grid), jnp.float32))
    # np.asarray of a result slice is the sync: a device->host readback
    # cannot complete before the compute (block_until_ready alone has
    # returned early through the axon tunnel before — the r3 incident).
    import numpy as np
    return float(np.asarray(f(c)[0, 0]))


def _mxu_kernel(a_ref, out_ref, *, iters):
    f32 = jnp.float32

    def body(_, acc):
        p = jax.lax.dot_general(
            a_ref[:, :], acc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)
        return p * f32(0.002)  # keep magnitudes bounded

    acc = body(0, a_ref[:, :])
    acc = jax.lax.fori_loop(0, iters, body, acc)
    out_ref[:, :] = acc


def run_mxu(iters, n, grid):
    a = jnp.eye(n, dtype=jnp.float32) * 500.0  # inverse of the 0.002
    kern = functools.partial(_mxu_kernel, iters=iters)
    f = pl.pallas_call(
        kern, grid=(grid,),
        in_specs=[pl.BlockSpec((n, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n * grid), jnp.float32))
    import numpy as np
    return float(np.asarray(f(a)[0, 0]))


def timed(fn, reps=3):
    fn()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def measure(label, make_fn, flops_of):
    """Difference iters vs 4*iters to cancel fixed overhead."""
    t1 = timed(make_fn(1))
    t4 = timed(make_fn(4))
    dt = max(t4 - t1, 1e-9)
    flops = flops_of(3)  # the extra work between 4x and 1x
    rate = flops / dt
    row = dict(stage="roofline", test=label, t_1x=round(t1, 5),
               t_4x=round(t4, 5), flops=flops, flops_per_s=rate,
               sane=bool(t4 > 1.5 * t1))
    print(json.dumps(row), flush=True)
    return rate


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}), flush=True)
    results = {}

    # Small blocks: the ceiling.  8 accumulators x (8, 128) f32.
    # iters sized so device time >> the ~20 ms axon round-trip (the r5
    # first attempt was swamped by launch latency at 1x AND 2x).
    it0, grid = 1_500_000, 64
    results["fma_8x128"] = measure(
        "fma_8x128x8acc",
        lambda m: (lambda: run_fma(it0 * m, 8, 8, 128, grid)),
        lambda m: it0 * m * 8 * 8 * 128 * 2 * grid)

    # (64, 512) x 4 acc — intermediate.
    it1 = 400_000
    results["fma_64x512"] = measure(
        "fma_64x512x4acc",
        lambda m: (lambda: run_fma(it1 * m, 4, 64, 512, grid // 4)),
        lambda m: it1 * m * 4 * 64 * 512 * 2 * (grid // 4))

    # (512, 512) x 2 acc — the sweep's working shape (VMEM-resident).
    it2 = 60_000
    results["fma_512x512"] = measure(
        "fma_512x512x2acc",
        lambda m: (lambda: run_fma(it2 * m, 2, 512, 512, grid // 8)),
        lambda m: it2 * m * 2 * 512 * 512 * 2 * (grid // 8))

    # sqrt chain at the sweep shape.
    it3 = 60_000
    results["sqrt_512x512"] = measure(
        "sqrt_512x512x2acc",
        lambda m: (lambda: run_fma(it3 * m, 2, 512, 512, grid // 8,
                                   op="sqrt")),
        lambda m: it3 * m * 2 * 512 * 512 * 2 * (grid // 8))

    # MXU f32 HIGHEST (512,512)@(512,512).
    it4 = 8_000
    results["mxu_512"] = measure(
        "mxu_512_f32_highest",
        lambda m: (lambda: run_mxu(it4 * m, 512, 4)),
        lambda m: it4 * m * 2 * 512 ** 3 * 4)

    print(json.dumps({"stage": "roofline_summary", "device": str(dev),
                      **{k: round(v / 1e12, 4) for k, v in
                         results.items()}}), flush=True)


if __name__ == "__main__":
    main()
