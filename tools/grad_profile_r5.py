#!/usr/bin/env python
"""Round-5 differentiable-pass breakdown on the real chip (VERDICT item 3).

Measures, for the headline grad workload (random_scene, R=2^17 rays):

1. record: the in-kernel tape recorder — r4's spp=1 sweeps (10 dispatches)
   vs r5's VMEM-batched sweeps (record_mega._spp_batches);
2. replay: value+grad of the bucketed replay — r4's equal-count quartile
   plan vs r5's depth-ladder plan (with planned-work accounting);
3. the pipelined steady-state step (the bench number).

Run ON THE REAL CHIP:  timeout 3000 python tools/grad_profile_r5.py
"""
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
from first_raytracer_tpu.diff.grad import (  # noqa: E402
    _loss_grads_planned, split_params)
from first_raytracer_tpu.diff.replay import plan_buckets  # noqa: E402
from first_raytracer_tpu.kernels.record_mega import (  # noqa: E402
    pack_scene_mega, record_paths_mega)
from first_raytracer_tpu.scene.builders import random_scene  # noqa: E402


def timed(fn, reps=5):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def legacy_plan(tape, max_groups=4):
    """r4's equal-count quartile plan (for the head-to-head)."""
    t = np.asarray(jax.device_get(tape))
    D, R = t.shape
    hit_any = t >= 0
    deepest = np.where(hit_any.any(axis=0),
                       (D - 1) - np.argmax(hit_any[::-1], axis=0), -1)
    need = np.maximum(np.minimum(deepest + 2, D), 1)
    order = np.argsort(need, kind="stable").astype(np.int32)
    sorted_need = need[order]
    groups, start = [], 0
    bounds = np.linspace(0, R, max_groups + 1).astype(np.int64)
    for g in range(max_groups):
        end = int(bounds[g + 1])
        if end <= start:
            continue
        trips = min(1 << max(int(sorted_need[start:end].max()) - 1,
                             0).bit_length(), D)
        groups.append((start, end - start, trips))
        start = end
    merged = [groups[0]]
    for s, n, tr in groups[1:]:
        ps, pn, ptr = merged[-1]
        if tr == ptr:
            merged[-1] = (ps, pn + n, ptr)
        else:
            merged.append((s, n, tr))
    return jnp.asarray(order), tuple(merged)


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}), flush=True)
    R = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 17)
    scene, cam, cfg = random_scene()
    key = rng.base_key(0)
    ids = jnp.arange(R, dtype=jnp.int32)
    params, _ = split_params(scene)
    target = jnp.zeros((R, 3), jnp.float32)
    gpack = pack_scene_mega(scene)

    def rec_new():
        return record_paths_mega(gpack, cam, cfg, key, num_rays=R)

    def rec_old():
        return record_paths_mega(gpack, cam, cfg, key, num_rays=R,
                                 spp_sizes=(1,) * cfg.spp)

    t_rec_old = timed(rec_old)
    print(json.dumps({"stage": "record", "kind": "spp1_sweeps",
                      "ms": round(t_rec_old * 1e3, 2)}), flush=True)
    t_rec_new = timed(rec_new)
    print(json.dumps({"stage": "record", "kind": "vmem_batched",
                      "ms": round(t_rec_new * 1e3, 2)}), flush=True)

    tape = rec_new()
    for name, plan in (("quartile", legacy_plan(tape)),
                       ("ladder", plan_buckets(tape))):
        order, groups = plan
        work = sum(n * t for _, n, t in groups)

        def g_step(plan=plan):
            return _loss_grads_planned(params, scene, cam, cfg, key, ids,
                                       target, tape, plan[0], plan[1])

        t_g = timed(g_step)
        print(json.dumps({"stage": "replay_grad", "plan": name,
                          "groups": [list(g) for g in groups],
                          "work_ray_trips": int(work),
                          "ms": round(t_g * 1e3, 2)}), flush=True)

    # Steady-state pipelined step (the bench shape).
    plan = plan_buckets(tape)
    for pipe in (4, 8):
        def steps():
            outs = []
            for _ in range(pipe):
                tp = rec_new()
                outs.append(_loss_grads_planned(
                    params, scene, cam, cfg, key, ids, target, tp,
                    plan[0], plan[1]))
            return outs

        t_p = timed(steps, reps=3)
        mpaths = R * pipe / t_p / 1e6
        print(json.dumps({"stage": "pipelined", "pipe": pipe,
                          "ms_per_step": round(t_p / pipe * 1e3, 2),
                          "mpaths_s": round(mpaths, 3)}), flush=True)


if __name__ == "__main__":
    main()
