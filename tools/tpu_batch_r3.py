#!/usr/bin/env python
"""Round-3 batched TPU session: every pending on-chip validation and
measurement in ONE process, so the axon tunnel setup cost (minutes under
load) is paid once.  Each stage is independently fenced — a failure
prints the error and moves on.

Stages:
  1. clustered   — grid-streaming clustered kernel vs brute (correctness)
  2. crossover   — intersector throughput vs scene size -> CROSSOVER_r3.json
  3. recbench    — tape recorder variants (unique-scatter vs old timings)
  4. gradbench   — grad fast path: replay vs planned buckets, few configs
  5. acceptance  — full-size gates -> ACCEPTANCE_r3.json
  6. headline    — bench.py main() (megakernel headline, updates history)

Usage: timeout 6000 python tools/tpu_batch_r3.py [stage ...]
"""
import functools
import json
import os
import sys
import time
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np


def _timeit(f, n=3):
    jax.block_until_ready(f())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        best = min(best, time.perf_counter() - t0)
    return best


def stage_clustered():
    from first_raytracer_tpu.kernels.intersect_clustered import (
        intersect_clustered, pack_scene_clustered)
    from first_raytracer_tpu.render.integrator import intersect_brute
    from first_raytracer_tpu.scene.builders import random_scene, sphere_field

    # Ray counts sized so brute's (R, Np, 3) oc tensor stays ~1 GB: the
    # 16 GB chip OOMs (RESOURCE_EXHAUSTED) at 32k rays x 20k spheres.
    for name, scene, R in [("random", random_scene()[0], 1 << 15),
                           ("field20k", sphere_field(n=20000)[0], 1 << 12)]:
        pack = pack_scene_clustered(scene)
        r = np.random.default_rng(0)
        o = jnp.asarray(r.uniform(-8, 8, (R, 3)).astype(np.float32))
        d = r.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        p2, t2, h2 = map(np.asarray, jax.block_until_ready(
            intersect_clustered(scene, pack, o, d, 1e-3)))
        p1, t1, h1 = map(np.asarray, intersect_brute(scene, o, d, 1e-3))
        m = h1 & h2
        print(json.dumps(dict(
            stage="clustered", scene=name,
            K=int(pack.sph_clusters + pack.tri_clusters),
            hit_agree=float((h1 == h2).mean()),
            prim_agree=float((p1[m] == p2[m]).mean()),
            t_close=bool(np.allclose(t1[m], t2[m], rtol=1e-4, atol=1e-5)),
        )), flush=True)


def stage_crossover():
    import tools.crossover_bench as cb
    cb.main()


def stage_recbench():
    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.diff.replay import (record_paths,
                                                 record_paths_pool)
    from first_raytracer_tpu.kernels.intersect_pallas import (
        intersect_pallas, pack_scene_pallas)
    from first_raytracer_tpu.render.camera import generate_rays
    from first_raytracer_tpu.scene.builders import random_scene

    scene, cam, cfg = random_scene()
    accel = pack_scene_pallas(scene)
    key = rng.base_key(0)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def rec_lock(scene, cam, cfg, key, ids, accel):
        cam_u = rng.camera_uniforms(key, ids)
        o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
        return record_paths(scene, o, d, ids, key, cfg, accel=accel,
                            intersect_fn=intersect_pallas)

    @functools.partial(jax.jit, static_argnames=("cfg", "ps"))
    def rec_pool(scene, cam, cfg, key, ids, accel, ps):
        return record_paths_pool(scene, cam, cfg, key, ids, accel=accel,
                                 intersect_fn=intersect_pallas,
                                 pool_size=ps)

    R = 1 << 16
    ids = jnp.arange(R, dtype=jnp.int32)
    t = _timeit(lambda: rec_lock(scene, cam, cfg, key, ids, accel))
    print(json.dumps(dict(stage="recbench", which="lock", R=R, s=round(t, 4),
                          mpaths=round(R / t / 1e6, 3))), flush=True)
    for ps in (1 << 13, 1 << 14, 1 << 15):
        t = _timeit(lambda: rec_pool(scene, cam, cfg, key, ids, accel, ps))
        print(json.dumps(dict(stage="recbench", which=f"pool{ps}", R=R,
                              s=round(t, 4),
                              mpaths=round(R / t / 1e6, 3))), flush=True)


def stage_gradbench():
    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.diff.grad import (plan_replay_chunks,
                                               render_loss_and_grads_planned,
                                               render_loss_and_grads_tape,
                                               split_params)
    from first_raytracer_tpu.diff.replay import (live_trips, plan_buckets,
                                                 record_paths_pool)
    from first_raytracer_tpu.kernels.intersect_pallas import (
        intersect_pallas, pack_scene_pallas)
    from first_raytracer_tpu.scene.builders import random_scene

    scene, cam, cfg = random_scene()
    accel = pack_scene_pallas(scene)
    key = rng.base_key(0)
    params, _ = split_params(scene)

    @functools.partial(jax.jit, static_argnames=("cfg", "ps"))
    def rec(scene, cam, cfg, key, ids, accel, ps):
        return record_paths_pool(scene, cam, cfg, key, ids, accel=accel,
                                 intersect_fn=intersect_pallas, pool_size=ps)

    for logr, logp in ((16, 14), (17, 15)):
        R, P = 1 << logr, 1 << logp
        ids = jnp.arange(R, dtype=jnp.int32)
        target = jnp.zeros((R, 3), jnp.float32)
        t_rec = _timeit(lambda: rec(scene, cam, cfg, key, ids, accel, P))
        tape = rec(scene, cam, cfg, key, ids, accel, P)
        trips = live_trips(tape)
        tape_trim = tape[:trips]
        t_rep = _timeit(lambda: render_loss_and_grads_tape(
            params, scene, cam, cfg, key, ids, target, tape_trim))
        plan = plan_buckets(tape)
        denom = jnp.float32(R * 3)

        def planned():
            chunks = plan_replay_chunks(tape, ids, target, plan)
            return render_loss_and_grads_planned(
                params, scene, cam, cfg, key, ids, target, chunks, denom)

        t_pl = _timeit(planned)
        print(json.dumps(dict(
            stage="gradbench", R=R, pool=P, trips=trips,
            buckets=[(int(b), int(n)) for _, b, n in plan],
            rec_s=round(t_rec, 4), replay_s=round(t_rep, 4),
            planned_s=round(t_pl, 4),
            mpaths_replay=round(R / (t_rec + t_rep) / 1e6, 3),
            mpaths_planned=round(R / (t_rec + t_pl) / 1e6, 3),
        )), flush=True)


def stage_acceptance():
    import tools.acceptance as acc
    sys.argv = ["acceptance.py", "--out",
                os.path.join(_ROOT, "ACCEPTANCE_r3.json")]
    rc = acc.main()
    print(json.dumps(dict(stage="acceptance", rc=rc)), flush=True)


def stage_headline():
    import bench
    bench.main()


# Driver-artifact stages first: under tunnel congestion a cold Pallas
# compile can take tens of minutes, and acceptance/headline are the
# artifacts a round cannot ship without (their kernels are cache-warm
# from earlier rounds, so they are also the cheapest).
STAGES = dict(acceptance=stage_acceptance, headline=stage_headline,
              gradbench=stage_gradbench, recbench=stage_recbench,
              clustered=stage_clustered, crossover=stage_crossover)


def _run_stage(name):
    t0 = time.perf_counter()
    try:
        STAGES[name]()
        ok = True
    except Exception:
        traceback.print_exc()
        ok = False
    print(json.dumps(dict(stage=name, done=True, ok=ok,
                          seconds=round(time.perf_counter() - t0, 1))),
          flush=True)
    return ok


def main():
    """With stage args: run them in-process.  With none (or ``all``):
    run EVERY stage, each in a fresh subprocess — an error that wedges
    the axon session (e.g. a device OOM leaves every later op in the
    same process failing JaxRuntimeError forever) then costs one stage,
    not the batch.
    """
    import subprocess
    which = sys.argv[1:] or ["all"]
    if which == ["all"]:
        for name in STAGES:
            rc = subprocess.call([sys.executable, os.path.abspath(__file__),
                                  name])
            print(json.dumps(dict(stage=name, subprocess_rc=rc)),
                  flush=True)
        return
    ok = True
    for name in which:
        ok = _run_stage(name) and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
