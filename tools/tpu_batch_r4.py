#!/usr/bin/env python
"""Round-4 batched TPU session: every pending on-chip validation and
measurement in ONE process sequence, so the axon tunnel setup cost
(minutes under load) is paid once per stage at most.

Stages (driver artifacts first — a round cannot ship without them):
  acceptance  — full-size gates -> ACCEPTANCE_r4.json (VERDICT r3 item 5)
  headline    — bench.py main() TWICE; reproducibility gate: the two
                medians must agree within 5% (VERDICT r3 items 1-2)
  gradbench   — record->replay split with the in-kernel recorder vs the
                pool recorder; on-chip tape correctness gate; the >=1.5
                Mpaths/s target [VERDICT r3 item 3]
  fieldbench  — clustered megakernel full-trace on sphere_field(5k/20k)
                + the 504-sphere headline scene (VERDICT r3 item 4)
  crossover   — intersector throughput vs scene size -> CROSSOVER_r4.json

Each stage runs in a fresh subprocess (a wedged axon session costs one
stage, not the batch).  After all stages the artifact check FAILS THE
BATCH if an expected artifact is missing — round 3 silently shipped
without ACCEPTANCE_r3.json.

Usage: timeout 9000 python tools/tpu_batch_r4.py [stage ...]
"""
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
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        times.append(time.perf_counter() - t0)
    times.sort()
    if times[-1] / max(times[0], 1e-12) > 3.0:
        # Same guard class as bench.py: a tunnel transient that returns
        # without a device round-trip must not become a recorded number.
        print(json.dumps(dict(warning="timing spread >3x, suspect "
                                      "tunnel artifact",
                              times=[round(t, 5) for t in times])),
              flush=True)
    return times[len(times) // 2]


def stage_acceptance():
    import tools.acceptance as acc
    rc = acc.main(argv=["--out", os.path.join(_ROOT, "ACCEPTANCE_r4.json")])
    print(json.dumps(dict(stage="acceptance", rc=rc)), flush=True)
    if rc:
        raise SystemExit(rc)


def stage_headline():
    """bench.py twice; the driver-facing number must reproduce."""
    import bench
    vals = []
    for i in range(2):
        import io
        import contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = bench.main()
        out = buf.getvalue().strip().splitlines()[-1]
        print(out, flush=True)
        if rc:
            raise SystemExit(rc)
        vals.append(json.loads(out)["value"])
    spread = abs(vals[1] - vals[0]) / max(vals)
    print(json.dumps(dict(stage="headline", runs=vals,
                          spread=round(spread, 4),
                          reproducible=bool(spread < 0.05))), flush=True)
    if spread >= 0.05:
        raise SystemExit(3)


def stage_gradbench():
    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.diff.grad import (render_loss_and_grads_tape,
                                               split_params)
    from first_raytracer_tpu.diff.replay import (live_trips,
                                                 record_paths_pool)
    from first_raytracer_tpu.kernels.intersect_pallas import (
        intersect_pallas, pack_scene_pallas)
    from first_raytracer_tpu.kernels.record_mega import (pack_scene_mega,
                                                         record_paths_mega)
    from first_raytracer_tpu.scene.builders import random_scene
    import functools

    scene, cam, cfg = random_scene()
    accel = pack_scene_pallas(scene)
    mpack = pack_scene_mega(scene)
    key = rng.base_key(0)
    params, _ = split_params(scene)

    @functools.partial(jax.jit, static_argnames=("cfg", "ps"))
    def rec_pool(scene, cam, cfg, key, ids, accel, ps):
        return record_paths_pool(scene, cam, cfg, key, ids, accel=accel,
                                 intersect_fn=intersect_pallas,
                                 pool_size=ps)

    # On-chip tape correctness: the Mosaic-compiled recorder must agree
    # with the XLA pool recorder (interpret-mode equality is proven in
    # tests; this is the real-chip gate).
    R0 = 1 << 14
    ids0 = jnp.arange(R0, dtype=jnp.int32)
    t_mega = np.asarray(record_paths_mega(mpack, cam, cfg, key,
                                          num_rays=R0))
    t_pool = np.asarray(rec_pool(scene, cam, cfg, key, ids0, accel,
                                 1 << 13))
    agree = float((t_mega == t_pool).mean())
    print(json.dumps(dict(stage="gradbench", check="tape_agreement",
                          R=R0, agree=agree)), flush=True)
    if agree < 0.999:
        raise SystemExit(4)

    from first_raytracer_tpu.diff.grad import render_loss_and_grads_bucketed
    from first_raytracer_tpu.diff.replay import plan_buckets

    # Baseline probe: the DENSE megakernel's per-tile-iteration cost on
    # the same scene (its counter x bench seconds) — the recorder should
    # match it per iteration; r4 measurements say it doesn't (~8x), and
    # this plus the skip_write variant isolate where the time goes.
    from first_raytracer_tpu.kernels.megakernel import (
        pack_scene_mega as _psm_dense, render_pixels_mega)
    dpack = _psm_dense(scene)
    t_mega = _timeit(lambda: render_pixels_mega(dpack, cam, cfg, key))
    _, _, mits = render_pixels_mega(dpack, cam, cfg, key,
                                    return_iters=True)
    mits = np.asarray(mits, np.int64)
    print(json.dumps(dict(stage="gradbench", check="mega_its",
                          seconds=round(t_mega, 4),
                          its_total=int(mits.sum()),
                          us_per_tile_it=round(
                              t_mega / max(int(mits.sum()), 1) * 1e6, 2))),
          flush=True)

    R = 1 << 17
    t_nw = _timeit(lambda: record_paths_mega(mpack, cam, cfg, key,
                                             num_rays=R, k_rays=8,
                                             skip_write=True))
    print(json.dumps(dict(stage="gradbench", check="rec_skip_write",
                          R=R, rec_s=round(t_nw, 4))), flush=True)

    # Recorder lane-load sweep with iteration counts: k_rays trades
    # one-hot tape-write cost against lane occupancy; the per-tile trip
    # counts separate "too many iterations" from "slow iterations"
    # (k_rays=64's output block + temporaries exceed scoped VMEM — capped
    # at 32).
    for kr, ur in ((8, 2), (16, 2), (32, 2), (8, 4)):
        t = _timeit(lambda: record_paths_mega(mpack, cam, cfg, key,
                                              num_rays=R, k_rays=kr,
                                              unroll=ur))
        _, its = record_paths_mega(mpack, cam, cfg, key, num_rays=R,
                                   k_rays=kr, unroll=ur,
                                   return_iters=True)
        its = np.asarray(its, np.int64)
        print(json.dumps(dict(
            stage="gradbench", check="k_rays_sweep", R=R, k_rays=kr,
            unroll=ur, rec_s=round(t, 4), tiles=int(its.size),
            its_total=int(its.sum()), its_mean=round(float(its.mean()), 1),
            us_per_tile_it=round(t / max(int(its.sum()), 1) * 1e6, 2),
        )), flush=True)

    for logr in (16, 17):
        R = 1 << logr
        ids = jnp.arange(R, dtype=jnp.int32)
        target = jnp.zeros((R, 3), jnp.float32)
        kr = int(os.environ.get("GRADBENCH_KRAYS", 32))
        t_rec_mega = _timeit(
            lambda: record_paths_mega(mpack, cam, cfg, key, num_rays=R,
                                      k_rays=kr))
        t_rec_pool = _timeit(
            lambda: rec_pool(scene, cam, cfg, key, ids, accel, 1 << 14))
        tape = record_paths_mega(mpack, cam, cfg, key, num_rays=R,
                                 k_rays=kr)
        trips = live_trips(tape)
        tape_trim = tape[:trips]
        t_rep = _timeit(lambda: render_loss_and_grads_tape(
            params, scene, cam, cfg, key, ids, target, tape_trim))
        plan = plan_buckets(tape)
        t_buck = _timeit(lambda: render_loss_and_grads_bucketed(
            params, scene, cam, cfg, key, ids, target, tape, plan=plan))
        best_rep = min(t_rep, t_buck)

        # Steady-state throughput: P back-to-back record+grad rounds, one
        # block at the end — async dispatch overlaps the ~30 ms tunnel
        # round-trip with device work, exactly as a jitted fit loop runs.
        P = 4

        def chained():
            outs = []
            for _ in range(P):
                tp = record_paths_mega(mpack, cam, cfg, key, num_rays=R,
                                       k_rays=kr)
                outs.append(render_loss_and_grads_bucketed(
                    params, scene, cam, cfg, key, ids, target, tp,
                    plan=plan))
            return outs

        t_pipe = _timeit(chained) / P
        print(json.dumps(dict(
            stage="gradbench", R=R, trips=trips, k_rays=kr,
            buckets=[list(g) for g in plan[1]],
            rec_mega_s=round(t_rec_mega, 4),
            rec_pool_s=round(t_rec_pool, 4),
            replay_flat_s=round(t_rep, 4),
            replay_bucketed_s=round(t_buck, 4),
            pipelined_step_s=round(t_pipe, 4),
            mpaths_grad=round(R / (t_rec_mega + best_rep) / 1e6, 3),
            mpaths_grad_pipelined=round(R / t_pipe / 1e6, 3),
            target_1p5=bool(R / t_pipe / 1e6 >= 1.5),
        )), flush=True)


def stage_fieldbench():
    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.kernels.megakernel import (pack_scene_mega,
                                                        render_pixels_mega)
    from first_raytracer_tpu.kernels.megakernel_clustered import (
        pack_scene_mega_clustered, render_pixels_mega_clustered)
    from first_raytracer_tpu.scene.builders import random_scene, sphere_field

    key = rng.base_key(0)
    rows = []

    def write_out():
        # After every scene, so a late-stage crash keeps earlier rows.
        with open(os.path.join(_ROOT, "FIELDBENCH_r4.json"), "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rows": rows}, f,
                      indent=1)

    # (scene, gate modes to measure): the mode sweep on field5000
    # decomposes gating cost vs benefit — "all" is the no-gate cost
    # baseline, "slab" the single-phase per-cluster any-gates, "two" the
    # bounce-origin-box phase split.
    # "all" (ungated) fails to COMPILE past ~8 clusters: without pl.when
    # scoping, Mosaic stacks every cluster sweep's temporaries (55.9 MB
    # scoped VMEM at 65 clusters) — the gates also bound live ranges.
    # Variants: (gate_mode, mapping, tile_w, k_pix); FIELD_VARIANTS env
    # overrides as "mode:mapping:tile_w:k_pix,..." for sweeps.
    default_variants = (("slab", "stride", 128, 32),)
    env_v = os.environ.get("FIELD_VARIANTS", "")
    if env_v:
        default_variants = tuple(
            (a, b, int(c), int(d))
            for a, b, c, d in (tok.split(":")
                               for tok in env_v.split(",") if tok))
    cases = [("random500", random_scene(), default_variants),
             ("field5000", sphere_field(n=5000), default_variants),
             ("field20000", sphere_field(n=20000), default_variants)]
    for name, (scene, cam, cfg), variants in cases:
      for mode, mapping, tw, kp in variants:
        cpak = pack_scene_mega_clustered(scene, sort_from=cam.origin)
        rad, seg, its, _ = render_pixels_mega_clustered(
            cpak, cam, cfg, key, return_iters=True, gate_mode=mode,
            mapping=mapping, tile_w=tw, k_pix=kp)  # compile + warm
        t = _timeit(lambda: render_pixels_mega_clustered(
            cpak, cam, cfg, key, gate_mode=mode, mapping=mapping,
            tile_w=tw, k_pix=kp))
        segs = int(np.asarray(seg, np.int64).sum())
        occ = segs / max(int(np.asarray(its, np.int64).sum()) * 512, 1)
        row = dict(stage="fieldbench", scene=name, kernel="mega-clustered",
                   gate_mode=mode, mapping=mapping, tile_w=tw, k_pix=kp,
                   clusters=cpak.clusters, seconds=round(t, 4),
                   mpaths=round(cfg.num_rays / t / 1e6, 2),
                   mrays=round(segs / t / 1e6, 2),
                   occupancy=round(occ, 3),
                   radiance_sum=float(np.asarray(rad, np.float64).sum()))
        # Cross-check radiance against the dense megakernel where its
        # (Ns_pad, T) sweep temporaries still fit scoped VMEM — ~1k
        # primitives; at 5k the dense kernel itself fails to compile
        # (30 MB > 16 MB scoped vmem), which is the reason the clustered
        # kernel exists.  Large-scene correctness is pinned by the
        # interpret-mode tests + the crossover stage's intersect checks.
        if scene.num_primitives <= 1024:
            mpack = pack_scene_mega(scene)
            rad_d, _ = render_pixels_mega(mpack, cam, cfg, key)
            d = np.abs(np.asarray(rad) - np.asarray(rad_d)) / cfg.spp
            row["vs_dense_frac_gt_1e3"] = float((d > 1e-3).mean())
            t_d = _timeit(lambda: render_pixels_mega(mpack, cam, cfg, key))
            row["dense_mpaths"] = round(cfg.num_rays / t_d / 1e6, 2)
        rows.append(row)
        print(json.dumps(row), flush=True)
        write_out()


def stage_crossover():
    os.environ.setdefault("CROSSOVER_ROUND", "4")
    import tools.crossover_bench as cb
    cb.main()


def stage_ablate():
    """Dense-megakernel tile-size sweep — the one knob never measured
    (k_pix/unroll were swept in r2 at tile=512 only)."""
    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.kernels.megakernel import (pack_scene_mega,
                                                        render_pixels_mega)
    from first_raytracer_tpu.scene.builders import random_scene

    scene, cam, cfg = random_scene()
    pack = pack_scene_mega(scene)
    key = rng.base_key(0)
    for tile in (256, 512, 1024):
        try:
            t = _timeit(lambda: render_pixels_mega(pack, cam, cfg, key,
                                                   tile=tile))
            print(json.dumps(dict(stage="ablate", tile=tile,
                                  seconds=round(t, 4),
                                  mpaths=round(cfg.num_rays / t / 1e6,
                                               2))), flush=True)
        except Exception as e:  # per-tile fence: a Mosaic reject is data
            print(json.dumps(dict(stage="ablate", tile=tile,
                                  error=str(e)[:200])), flush=True)


STAGES = dict(acceptance=stage_acceptance, headline=stage_headline,
              gradbench=stage_gradbench, fieldbench=stage_fieldbench,
              crossover=stage_crossover, ablate=stage_ablate)

# (stage, artifact that must exist afterwards; None = stdout-only)
ARTIFACTS = dict(acceptance="ACCEPTANCE_r4.json",
                 fieldbench="FIELDBENCH_r4.json",
                 crossover="CROSSOVER_r4.json")


def _run_stage(name):
    t0 = time.perf_counter()
    try:
        STAGES[name]()
        ok = True
    except SystemExit as e:
        ok = not e.code
    except Exception:
        traceback.print_exc()
        ok = False
    print(json.dumps(dict(stage=name, done=True, ok=ok,
                          seconds=round(time.perf_counter() - t0, 1))),
          flush=True)
    return ok


def main():
    import subprocess
    which = sys.argv[1:] or ["all"]
    if which == ["all"]:
        ok = True
        for name in STAGES:
            rc = subprocess.call([sys.executable, os.path.abspath(__file__),
                                  name])
            print(json.dumps(dict(stage=name, subprocess_rc=rc)),
                  flush=True)
            ok = ok and rc == 0
            art = ARTIFACTS.get(name)
            if art and not os.path.exists(os.path.join(_ROOT, art)):
                print(json.dumps(dict(stage=name, missing_artifact=art)),
                      flush=True)
                ok = False
        print(json.dumps(dict(batch_ok=ok)), flush=True)
        sys.exit(0 if ok else 1)
    ok = True
    for name in which:
        ok = _run_stage(name) and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
