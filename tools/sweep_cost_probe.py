#!/usr/bin/env python
"""Trustworthy sweep-cost / roofline measurement by SCENE-PAD differential.

The Pallas FMA microbenchmark (tools/roofline.py) produced times that did
not scale with its iteration count through the axon tunnel — the same
failure class as the r3 bench incident.  This probe instead derives the
sustained sweep op rate from two CHECKSUM-VERIFIED full renders:

  1. the headline scene (504 spheres -> Ns_pad = 512);
  2. the same scene plus 512 dummy far-away spheres (Ns_pad = 1024) —
     never hit, so the radiance checksum must be IDENTICAL, and the only
     added work is exactly 512 more sweep slots per traced segment.

  sweep_seconds_per_512slots = t(1024) - t(512)
  sustained_rate = segments x 512 x OPS_PER_SLOT / delta_t

Full renders take ~0.25-0.5 s (far above tunnel latency) and the checksum
equality proves both executions really happened.

OPS_PER_SLOT (f32 ops per (segment, padded sphere slot), counted from
kernels/megakernel.py's sweep + packed selection):
  dc (3), oc (3), bq (1), cq (2), disc (1), sqrt (1), tn/tf (2),
  2 compares + 2 selects (4), bitcast-and-or packing (3),
  min-reduce amortized (~1)  ->  ~21 vector ops  (~26 FLOPs counting
  FMAs as 2).

Run ON THE REAL CHIP:  timeout 3000 python tools/sweep_cost_probe.py
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")
from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from first_raytracer_tpu.core import rng  # noqa: E402
from first_raytracer_tpu.kernels.megakernel import (  # noqa: E402
    pack_scene_mega, render_pixels_mega)
from first_raytracer_tpu.scene.builders import random_scene  # noqa: E402

OPS_PER_SLOT = 21
FLOPS_PER_SLOT = 26


def pad_scene(scene, extra):
    """Append ``extra`` never-hit spheres (tiny, enormously far away)."""
    f32 = jnp.float32
    c = jnp.concatenate([scene.sphere_center,
                         jnp.full((extra, 3), 1e6, f32)
                         + jnp.arange(extra, dtype=f32)[:, None]])
    r = jnp.concatenate([scene.sphere_radius,
                         jnp.full((extra,), 1e-3, f32)])
    mat = jnp.concatenate([scene.sphere_mat,
                           jnp.zeros((extra,), scene.sphere_mat.dtype)])
    return dataclasses.replace(scene, sphere_center=c, sphere_radius=r,
                               sphere_mat=mat)


def timed(fn, reps=5):
    out = fn()
    checksum = float(jnp.sum(out[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], checksum, out


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    scene, cam, cfg = random_scene()
    key = rng.base_key(0)
    rows = []
    base_checksum = None
    base_segments = None
    for extra in (0, 512, 1024):
        s = pad_scene(scene, extra) if extra else scene
        pack = pack_scene_mega(s)
        t, checksum, out = timed(
            lambda pack=pack: render_pixels_mega(pack, cam, cfg, key))
        segments = int(np.asarray(out[1], np.int64).sum())
        ns_pad = pack.spheres.shape[1]
        row = dict(stage="sweep_probe", ns_pad=ns_pad,
                   seconds=round(t, 4), radiance_sum=checksum,
                   segments=segments)
        if base_checksum is None:
            base_checksum, base_segments = checksum, segments
            base_t = t
        else:
            rel = abs(checksum - base_checksum) / abs(base_checksum)
            row["checksum_rel_err"] = rel
            row["checksum_ok"] = bool(rel < 1e-6)
            row["segments_ok"] = segments == base_segments
            dt = t - base_t
            slots = ns_pad - 512
            if dt > 0:
                rate_ops = base_segments * slots * OPS_PER_SLOT / dt
                row["delta_seconds"] = round(dt, 4)
                row["sweep_ops_per_s"] = rate_ops
                row["sweep_flops_per_s"] = (base_segments * slots
                                            * FLOPS_PER_SLOT / dt)
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
