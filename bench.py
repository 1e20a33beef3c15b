#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline workload [BASELINE.json:8]: the random-spheres "final scene"
(~500 spheres) at 1200x800 @ 10spp, depth 50, on the real TPU chip.
Metric: Mpaths/s (paths = nx*ny*spp camera paths traced to termination);
also reports Mrays/s (true traced path segments per second, from the
integrator's counters).

Fast path (measured fastest on-chip): the persistent-lane megakernel
(kernels/megakernel.py).  The flat-BVH walk exists for capability parity
but lockstep gather-walks lose to the fused dense kernel at this scene
size on a vector machine.  Override with
BENCH_MODE=wavefront/regenerative/grad and BENCH_INTERSECT=brute/bvh
(grad mode: differentiable-pass value+grad throughput over
BENCH_GRAD_RAYS rays).

The reference publishes no numbers and its mount is empty (BASELINE.md), so
``vs_baseline`` is the ratio against the best previously recorded value in
BENCH_HISTORY.json (>1 means faster than any earlier round), 1.0 on first
run.

Result-integrity guards (added r4 after the round-3 incident where a PJRT
tunnel transient returned from ``block_until_ready`` without a real device
round-trip and recorded a physically impossible 153x "speedup"; VERDICT r3):

- median of >=3 repeats instead of min-of-2 (an optimistic outlier can no
  longer win);
- repeats disagreeing by >3x fail the run (a hung/no-op execution is not a
  measurement);
- the implied sweep-FLOP rate (segments x padded-primitive sweep cost /
  median time) must stay below a generous multiple of the chip's f32 VPU
  peak — the r3 artifact implied ~5e16 FLOP/s on a ~2e12 FLOP/s unit;
- the headline radiance checksum must match the committed golden
  (bench_golden.json) to 1%, so a no-op execution cannot score.

On any guard failure: one JSON line with an "error" key, exit 2, and the
history file is left untouched.
"""
import json
import os
import sys
import time

# Persistent compile cache: enabled below via utils.cache (env vars are too late
# here - sitecustomize imports jax first).

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import jax.numpy as jnp

from first_raytracer_tpu.accel.build import build_bvh
from first_raytracer_tpu.core import rng
from first_raytracer_tpu.kernels.intersect_pallas import (intersect_pallas,
                                                          pack_scene_pallas)
from first_raytracer_tpu.render.api import render_ray_batch
from first_raytracer_tpu.render.camera import generate_rays
from first_raytracer_tpu.render.integrator import trace_rays
from first_raytracer_tpu.render.regenerative import render_rays_regenerative
from first_raytracer_tpu.scene.builders import random_scene

HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_HISTORY.json")
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_golden.json")
# Generous per-chip f32 op-rate ceiling for the plausibility guard.  The
# chip's sustained sweep rate was MEASURED in r5 at 2.0e12 FLOP/s via the
# checksum-verified scene-pad differential (tools/sweep_cost_probe.py,
# BASELINE.md "Measured roofline"); 5e13 sits 25x above it — anything
# implying more is a timing artifact, not a render (the r3 incident
# implied ~8e16).
MAX_PLAUSIBLE_FLOPS = 5e13
MAX_REPEAT_SPREAD = 3.0


def _fail(reason, **extra):
    print(json.dumps(dict(error=reason, **extra)))
    return 2


def check_spread(times, max_spread=MAX_REPEAT_SPREAD):
    """None if repeat timings agree to ``max_spread``x, else a reason."""
    if max(times) / max(min(times), 1e-12) > max_spread:
        return "repeat timings disagree by >%gx" % max_spread
    return None


def check_flops(segments, np_pad, seconds,
                max_flops=MAX_PLAUSIBLE_FLOPS):
    """None if the implied sweep-FLOP rate is physically possible.

    A dense sweep costs ~10 f32 ops per (segment, padded primitive); the
    implied rate must stay below a generous multiple of the VPU peak.
    Culling intersectors do less work than this estimate, which only makes
    the guard more lenient — it catches impossible timings, not
    inefficiency.
    """
    if not segments:
        return None
    implied = segments * np_pad * 10.0 / max(seconds, 1e-12)
    if implied > max_flops:
        return ("implied FLOP rate %.3g/s is physically impossible"
                % implied)
    return None


def check_checksum(checksum, golden, rtol=1e-2):
    """None if the radiance checksum matches the golden to ``rtol``."""
    rel = abs(checksum - golden) / max(abs(golden), 1e-9)
    if not rel < rtol:
        return ("radiance checksum %.6g mismatches golden %.6g "
                "(rel %.3g)" % (checksum, golden, rel))
    return None


def main():
    # Headline workload unless BENCH_SCENE overrides (fieldN -> the
    # N-sphere large-scene stress preset, e.g. BENCH_SCENE=field20000
    # BENCH_MODE=megacluster for the clustered-megakernel path).
    scene_sel = os.environ.get("BENCH_SCENE", "")
    if scene_sel.startswith("trifield"):
        from first_raytracer_tpu.scene.builders import triangle_field
        scene, cam, cfg = triangle_field(n=int(scene_sel[8:] or 20000))
        metric_name = f"Mpaths/s {scene_sel} {cfg.nx}x{cfg.ny}@{cfg.spp}spp"
    elif scene_sel.startswith("field"):
        from first_raytracer_tpu.scene.builders import sphere_field
        scene, cam, cfg = sphere_field(n=int(scene_sel[5:] or 20000))
        metric_name = f"Mpaths/s {scene_sel} {cfg.nx}x{cfg.ny}@{cfg.spp}spp"
    else:
        scene, cam, cfg = random_scene()  # 1200x800 @ 10spp, ~500 spheres
        metric_name = "Mpaths/s final-scene 1200x800@10spp"
    mode = os.environ.get("BENCH_MODE", "mega")
    # Field scenes default to the clustered intersector: the dense pallas
    # intersector's VMEM tile cannot hold 5k+ padded spheres (it is also
    # only used for the untimed instrumentation pass in mega/grad modes).
    isect = os.environ.get(
        "BENCH_INTERSECT",
        "clustered" if scene_sel.startswith(("field", "trifield"))
        else "pallas")
    pool = int(os.environ.get("BENCH_POOL", 1 << 17))
    chunk = int(os.environ.get("BENCH_CHUNK", 1 << 17))
    repeats = max(3, int(os.environ.get("BENCH_REPEATS", 3)))

    if isect == "pallas":
        accel, intersect_fn = pack_scene_pallas(scene), intersect_pallas
    elif isect == "clustered":
        from first_raytracer_tpu.kernels.intersect_clustered import (
            intersect_clustered, pack_scene_clustered)
        accel, intersect_fn = (pack_scene_clustered(scene),
                               intersect_clustered)
    elif isect == "bvh":
        print("# NOTE: BENCH_INTERSECT=bvh selects the lockstep flat-BVH "
              "walk — a DIAGNOSTICS-ONLY traversal-correctness oracle, "
              "100-200x slower than the production intersectors "
              "(CROSSOVER_r3.json); not a performance path.",
              file=sys.stderr)
        accel, intersect_fn = build_bvh(scene, max_leaf=4), None
    else:
        accel, intersect_fn = None, None

    key = rng.base_key(0)
    total = cfg.num_rays

    if mode == "mega":
        # Persistent-lane megakernel (kernels/megakernel.py): the whole
        # tracer in one pallas_call — fastest path by ~12x over the
        # XLA-orchestrated wavefront loops.
        from first_raytracer_tpu.kernels.megakernel import (
            pack_scene_mega, render_pixels_mega)
        mpack = pack_scene_mega(scene)

        def run():
            rad, seg = render_pixels_mega(mpack, cam, cfg, key)
            return rad, seg
    elif mode == "megacluster":
        # Clustered megakernel (kernels/megakernel_clustered.py): the
        # large-scene fast path — persistent lanes + gated per-cluster
        # sweeps, clusters sorted front-to-back from the camera.
        from first_raytracer_tpu.kernels.megakernel_clustered import (
            pack_scene_mega_clustered, render_pixels_mega_clustered)
        cpak = pack_scene_mega_clustered(scene, sort_from=cam.origin)
        # wl (worklist gating, r5) is the measured default for sphere
        # fields (field20000 3.21 vs hier 1.53 Mpaths/s); slab wins on
        # triangle-heavy scenes (FIELDBENCH_r5).
        gate = os.environ.get("BENCH_GATE", "wl")

        def run():
            rad, seg = render_pixels_mega_clustered(cpak, cam, cfg, key,
                                                    gate_mode=gate)
            return rad, seg
    elif mode == "grad":
        # Differentiable-pass throughput [BASELINE.json:11]: value+grad of
        # an MSE pixel loss w.r.t. the full DIFF_FIELDS parameter set via
        # the record->replay path (diff/replay.py): the intersector runs
        # once outside the AD graph (early-exit while_loop), the replay's
        # O(R) bounce math is differentiated with remat.  BENCH_GRAD_METHOD
        # =scan selects round 2's direct reverse-mode scan for comparison.
        from first_raytracer_tpu.diff.grad import (render_loss_and_grads,
                                                   split_params)
        # Default batch 2^17: measured r4 sweet spot — large enough to
        # amortize the per-step launch latency the pipeline can't hide.
        # R is the per-step batch; `total` becomes R x pipeline depth for
        # throughput accounting ONLY (a closure over `total` here would
        # silently record pipe x R rays per step — it happened).
        R_grad = int(os.environ.get("BENCH_GRAD_RAYS", 1 << 17))
        total = R_grad
        method = os.environ.get("BENCH_GRAD_METHOD", "replay")
        ids = jnp.arange(R_grad, dtype=jnp.int32)
        params, _ = split_params(scene)
        target = jnp.zeros((R_grad, 3), jnp.float32)

        if method == "replay":
            # Two-step fast path: tape record (selection, no AD) + payload-
            # matmul replay of only the live tape rows.  The recorder is
            # the in-kernel megakernel tracer (kernels/record_mega.py) by
            # default — BENCH_GRAD_REC=pool selects round 3's compacted-
            # pool XLA recorder for comparison.  The trim depth is
            # data-deterministic (fixed seed), so it is computed once
            # outside the timed loop.
            import functools

            from first_raytracer_tpu.diff.grad import (
                render_loss_and_grads_tape)
            from first_raytracer_tpu.diff.replay import (live_trips,
                                                         record_paths_pool)
            # Recorder: dense megakernel tape for reference-scale scenes,
            # CLUSTERED megakernel tape for large ones (field presets /
            # past the 2^14 dense bound) — override with BENCH_GRAD_REC.
            rec_kind = os.environ.get("BENCH_GRAD_REC", "")
            if not rec_kind:
                # Dense recorder bound is VMEM (~1k padded primitives),
                # not the 2^14 packed-id cap.
                big = max(scene.num_spheres,
                          scene.num_triangles) > 1024
                rec_kind = ("megacluster"
                            if big
                            or scene_sel.startswith(("field", "trifield"))
                            else "mega")
            if rec_kind == "mega":
                from first_raytracer_tpu.kernels.record_mega import (
                    pack_scene_mega as _pack_mega, record_paths_mega)
                gpack = _pack_mega(scene)
                kr = int(os.environ.get("BENCH_GRAD_KRAYS", 32))

                def rec_tape():
                    return record_paths_mega(gpack, cam, cfg, key,
                                             num_rays=R_grad, k_rays=kr)
            elif rec_kind == "megacluster":
                from first_raytracer_tpu.kernels.megakernel_clustered \
                    import pack_scene_mega_clustered
                from first_raytracer_tpu.kernels.record_mega import (
                    record_paths_mega_clustered)
                cgpack = pack_scene_mega_clustered(scene,
                                                   sort_from=cam.origin)

                def rec_tape():
                    return record_paths_mega_clustered(
                        cgpack, cam, cfg, key, num_rays=R_grad)
            else:
                gpool = int(os.environ.get("BENCH_GRAD_POOL", 1 << 14))

                @functools.partial(jax.jit,
                                   static_argnames=("cfg", "ps"))
                def rec(scene, cam, cfg, key, ids, accel, ps):
                    return record_paths_pool(scene, cam, cfg, key, ids,
                                             accel=accel,
                                             intersect_fn=intersect_fn,
                                             pool_size=ps)

                def rec_tape():
                    return rec(scene, cam, cfg, key, ids, accel, gpool)

            # Replay: depth-bucketed by default (each bucket runs only
            # its own trip count); BENCH_GRAD_REPLAY=flat for the
            # single-trip-count replay.  The plan is data-deterministic
            # (fixed seed) so it is computed once outside the timed loop.
            # Throughput is measured over BENCH_GRAD_PIPELINE back-to-back
            # record+grad steps with one device sync at the end — the
            # steady-state shape of a fit loop, where async dispatch
            # overlaps the per-call host round-trip with device work.
            pipe = max(1, int(os.environ.get("BENCH_GRAD_PIPELINE", 16)))
            replay_kind = os.environ.get("BENCH_GRAD_REPLAY", "bucketed")
            if replay_kind == "bucketed":
                from first_raytracer_tpu.diff.grad import (
                    render_loss_and_grads_bucketed)
                from first_raytracer_tpu.diff.replay import plan_buckets
                plan = plan_buckets(rec_tape())

                def step():
                    tape = rec_tape()
                    return render_loss_and_grads_bucketed(
                        params, scene, cam, cfg, key, ids, target, tape,
                        plan=plan)
            else:
                trips = live_trips(rec_tape())

                def step():
                    tape = rec_tape()
                    return render_loss_and_grads_tape(
                        params, scene, cam, cfg, key, ids, target,
                        tape[:trips])

            total = R_grad * pipe

            def run():
                return [step() for _ in range(pipe)]
        else:
            def run():
                return render_loss_and_grads(params, scene, cam, cfg, key,
                                             ids, target, accel,
                                             intersect_fn=intersect_fn,
                                             method=method)
    elif mode == "regenerative":
        def run():
            return render_rays_regenerative(
                scene, cam, cfg, key, jnp.int32(0), total, accel,
                intersect_fn, pool_size=pool)
    else:
        blocks = [jnp.minimum(jnp.arange(s, s + chunk, dtype=jnp.int32),
                              total - 1) for s in range(0, total, chunk)]

        def run():
            outs = [render_ray_batch(scene, cam, cfg, key, b, accel,
                                     intersect_fn) for b in blocks]
            return outs[-1]

    warm = jax.block_until_ready(run())  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        times.append(time.perf_counter() - t0)
    times.sort()
    best = times[len(times) // 2]  # median: robust to optimistic outliers
    # Guard: repeats that disagree wildly are not a measurement (a tunnel
    # hiccup or a host stall, either way unusable).
    err = check_spread(times)
    if err:
        return _fail(err, times=[round(t, 4) for t in times])

    # Guard: the headline radiance checksum must match the committed golden
    # (loose 1% — covers kernel ulp drift, not a different image; a no-op
    # or garbage execution cannot match).  A new mode/scene key is only
    # RECORDED after every other guard (spread above, implied-FLOP below)
    # has passed on the same run — a bogus first run must not bless itself
    # or poison later honest runs (ADVICE r4).  BENCH_RECORD_GOLDEN=1
    # forces re-recording an existing key (e.g. after a deliberate
    # semantics change).
    pending_golden = None
    if mode in ("mega", "megacluster"):
        checksum = float(jnp.sum(warm[0]))
        gold = {}
        try:
            with open(GOLDEN) as f:
                gold = json.load(f)
        except (OSError, json.JSONDecodeError):
            pass
        gkey = "radiance_sum_%s_%dx%d_%dspp" % (
            "_".join(filter(None, (mode, scene_sel))) or "mega",
            cfg.nx, cfg.ny, cfg.spp)
        if mode == "mega" and not scene_sel:
            gkey = "radiance_sum_mega_%dx%d_%dspp" % (cfg.nx, cfg.ny,
                                                      cfg.spp)
        if gkey in gold and not os.environ.get("BENCH_RECORD_GOLDEN"):
            err = check_checksum(checksum, gold[gkey])
            if err:
                return _fail(err)
        else:
            pending_golden = (gkey, checksum, gold)

    # True segment count: the megakernel reports it directly; the other
    # modes run one instrumented chunked pass (not timed).
    import functools

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def seg_count(scene, cam, cfg, key, ids, accel):
        cam_u = rng.camera_uniforms(key, ids)
        o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
        _, segs = trace_rays(scene, o, d, ids, key, cfg, accel=accel,
                             intersect_fn=intersect_fn, return_stats=True)
        return jnp.sum(segs.astype(jnp.int64))

    if mode in ("mega", "megacluster"):
        import numpy as _np
        # warm already holds the deterministic (rad, seg) — no extra
        # full-frame render just to read counters.
        segments = int(_np.asarray(warm[1], _np.int64).sum())
    else:
        # Grad mode times `pipe` repetitions of the SAME R_grad ray ids, so
        # the instrumented pass counts ids 0..R_grad once and scales by the
        # repetition factor (ADVICE r4: iterating 0..R_grad*pipe counted a
        # different ray population than was benched).
        count_rays = R_grad if mode == "grad" else total
        chunk = min(chunk, count_rays)
        segments = 0
        for s in range(0, count_rays, chunk):
            ids = jnp.minimum(jnp.arange(s, s + chunk, dtype=jnp.int32),
                              count_rays - 1)
            segments += int(seg_count(scene, cam, cfg, key, ids, accel))
        segments *= total // count_rays

    mpaths = total / best / 1e6
    mrays = segments / best / 1e6

    # Guard: physical plausibility of the measured rate.
    np_pad = max(-(-scene.num_primitives // 128) * 128, 128)
    err = check_flops(segments, np_pad, best)
    if err:
        return _fail(err, segments=segments, seconds=round(best, 6))

    # All guards passed — safe to record a first-run golden checksum now.
    if pending_golden is not None:
        gkey, checksum, gold = pending_golden
        gold[gkey] = checksum
        try:
            with open(GOLDEN, "w") as f:
                json.dump(gold, f, indent=1)
        except OSError:
            pass

    # vs_baseline is only meaningful against a like-for-like history entry:
    # the headline config compares to the best earlier headline run; other
    # modes (grad/wavefront/...) compare to their own per-mode key so a
    # grad-pass number never reads as "0.004x of the megakernel".
    headline = mode == "mega" and isect == "pallas" and not scene_sel
    hist_key = ("best_mpaths_s" if headline
                else "best_mpaths_s_" + "_".join(
                    filter(None, (scene_sel, mode, isect))))
    hist = {}
    try:
        with open(HISTORY) as f:
            hist = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    prev = hist.get(hist_key)
    vs = (mpaths / prev) if prev else 1.0
    # Every mode records its own best under a per-mode key; only the
    # headline config (megakernel + pallas on the full scene) additionally
    # updates the round-over-round summary fields.
    hist[hist_key] = max(mpaths, prev or 0.0)
    if headline:
        hist.update(last_mpaths_s=mpaths, last_mrays_s=mrays, seconds=best,
                    mode=mode, intersect=isect,
                    device=str(jax.devices()[0]))
    try:
        with open(HISTORY, "w") as f:
            json.dump(hist, f)
    except OSError:
        pass

    print(json.dumps({
        "metric": metric_name,
        "value": round(mpaths, 3),
        "unit": "Mpaths/s",
        "vs_baseline": round(vs, 3),
        "mrays_s": round(mrays, 2),
        "seconds": round(best, 3),
        "mode": mode,
        "intersect": isect,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
