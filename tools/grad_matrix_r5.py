#!/usr/bin/env python
"""Round-5 grad-throughput matrix + large-scene grad (VERDICT items 3/4).

Part A — headline scene (random_scene) step-throughput matrix over
  R in {2^17, 2^18} x recorder k_pix in {8, 16} x pipeline in {8, 16}:
  finds the steady-state optimum for BENCH_MODE=grad.
Part B — field5000: the clustered recorder (record_paths_mega_clustered)
  + gather-extraction bucketed replay, pipelined — the large-scene
  differentiable pass that r4 did not have.

Run ON THE REAL CHIP:  timeout 3000 python tools/grad_matrix_r5.py
"""
import json
import sys
import time

sys.path.insert(0, ".")
from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from first_raytracer_tpu.core import rng  # noqa: E402
from first_raytracer_tpu.diff.grad import (  # noqa: E402
    _loss_grads_planned, split_params)
from first_raytracer_tpu.diff.replay import plan_buckets  # noqa: E402
from first_raytracer_tpu.kernels.record_mega import (  # noqa: E402
    pack_scene_mega, record_paths_mega, record_paths_mega_clustered)
from first_raytracer_tpu.kernels.megakernel_clustered import (  # noqa: E402
    pack_scene_mega_clustered)
from first_raytracer_tpu.scene.builders import (random_scene,  # noqa: E402
                                                sphere_field)


def timeit(fn, reps=3):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def pipeline_mpaths(rec, grad_step, R, pipe):
    def steps():
        outs = []
        for _ in range(pipe):
            tp = rec()
            outs.append(grad_step(tp))
        return outs

    t = timeit(steps)
    return R * pipe / t / 1e6, t / pipe


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    key = rng.base_key(0)

    # --- Part A: headline matrix ---
    scene, cam, cfg = random_scene()
    gpack = pack_scene_mega(scene)
    params, _ = split_params(scene)
    for R in (1 << 17, 1 << 18):
        ids = jnp.arange(R, dtype=jnp.int32)
        target = jnp.zeros((R, 3), jnp.float32)
        for k_pix in (8, 16):
            def rec(R=R, k_pix=k_pix):
                return record_paths_mega(gpack, cam, cfg, key,
                                         num_rays=R, k_pix=k_pix)
            tape = rec()
            plan = plan_buckets(tape)

            def gstep(tp, R=R, ids=ids, target=target, plan=plan):
                return _loss_grads_planned(params, scene, cam, cfg, key,
                                           ids, target, tp, plan[0],
                                           plan[1])

            t_rec = timeit(rec)
            t_g = timeit(lambda: gstep(tape))
            print(json.dumps({"stage": "gradmatrix", "R": R,
                              "rec_ms": round(t_rec * 1e3, 2),
                              "grad_ms": round(t_g * 1e3, 2)}),
                  flush=True)
            for pipe in (8, 16):
                mp, per = pipeline_mpaths(rec, gstep, R, pipe)
                print(json.dumps({"stage": "gradmatrix", "R": R,
                                  "pipe": pipe,
                                  "ms_per_step": round(per * 1e3, 2),
                                  "mpaths_s": round(mp, 3)}), flush=True)

    # --- Part B: field5000 grad ---
    scene, cam, cfg = sphere_field(n=5000)
    cpak = pack_scene_mega_clustered(scene, sort_from=cam.origin)
    params, _ = split_params(scene)
    R = 1 << 17
    ids = jnp.arange(R, dtype=jnp.int32)
    target = jnp.zeros((R, 3), jnp.float32)

    for gm in ("slab", "hier"):
        def recc(gm=gm):
            return record_paths_mega_clustered(cpak, cam, cfg, key,
                                               num_rays=R, gate_mode=gm)

        t_rec = timeit(recc)
        print(json.dumps({"stage": "fieldgrad", "scene": "field5000",
                          "gate_mode": gm,
                          "rec_ms": round(t_rec * 1e3, 2)}), flush=True)

    def recc():  # production default for the pipelined numbers below
        return record_paths_mega_clustered(cpak, cam, cfg, key,
                                           num_rays=R)

    tape = recc()
    plan = plan_buckets(tape)

    def gstep(tp):
        return _loss_grads_planned(params, scene, cam, cfg, key, ids,
                                   target, tp, plan[0], plan[1])

    t_g = timeit(lambda: gstep(tape))
    print(json.dumps({"stage": "fieldgrad", "scene": "field5000",
                      "grad_ms": round(t_g * 1e3, 2)}), flush=True)
    for pipe in (4, 8):
        mp, per = pipeline_mpaths(recc, gstep, R, pipe)
        print(json.dumps({"stage": "fieldgrad", "scene": "field5000",
                          "pipe": pipe,
                          "ms_per_step": round(per * 1e3, 2),
                          "mpaths_s": round(mp, 3)}), flush=True)


if __name__ == "__main__":
    main()
