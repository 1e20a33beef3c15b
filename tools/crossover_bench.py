#!/usr/bin/env python
"""Acceleration-structure crossover benchmark (VERDICT r2 item 3).

Measures closest-hit throughput vs scene size for every intersector on the
real chip and records where the two-level clustered Pallas kernel
(kernels/intersect_clustered.py) overtakes the dense paths:

- ``brute``: XLA dense (R, Np) distance matrix (render/integrator.py) —
  scales to any Np but does O(R*Np) HBM-visible work.
- ``pallas``: fused dense VMEM sweep (kernels/intersect_pallas.py) — the
  ~500-primitive headline winner; its (Np, TILE_R) temporaries stop
  fitting VMEM around ~1-2k primitives, so it is skipped above that.
- ``bvh``: lockstep flat-BVH walk (accel/traverse.py).
- ``clustered``: two-level device BVH — AABB-gated cluster sweeps.

Every intersector is also cross-checked against brute force on the same
rays (winner ids + t) before timing, so the speed table is only reported
for agreeing implementations.

Writes CROSSOVER_r3.json at the repo root; run on the real TPU:

    timeout 3000 python tools/crossover_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from first_raytracer_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from first_raytracer_tpu.accel.build import build_bvh
from first_raytracer_tpu.core import rng
from first_raytracer_tpu.kernels.intersect_clustered import (
    intersect_clustered, pack_scene_clustered)
from first_raytracer_tpu.kernels.intersect_pallas import (intersect_pallas,
                                                          pack_scene_pallas)
from first_raytracer_tpu.render.camera import generate_rays
from first_raytracer_tpu.render.integrator import intersect_brute
from first_raytracer_tpu.scene.builders import sphere_field

# Output name carries the round (CROSSOVER_OUT or CROSSOVER_ROUND env) so a
# later round's run never silently overwrites an earlier artifact.
_round = os.environ.get("CROSSOVER_ROUND", "4")
OUT = os.environ.get(
    "CROSSOVER_OUT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 f"CROSSOVER_r{_round}.json"))

# Three sizes span the regimes (dense wins / transition / clustered wins);
# every additional size costs ~4 cold Pallas/XLA compiles, which under
# tunnel congestion (tens of minutes each) is the real budget.  Empty/
# whitespace tokens (e.g. a trailing comma) are ignored.
SIZES = tuple(
    int(s.strip()) for s in os.environ.get("CROSSOVER_SIZES",
                                           "500,5000,20000").split(",")
    if s.strip())
R = 1 << 17          # camera rays per timing pass
REPEATS = 3
PALLAS_DENSE_MAX = 2_048   # (Np, 512) f32 temporaries stop fitting VMEM


_INNER = 8           # intersect calls fused per device dispatch


def _repeat_timer(isect_fn):
    """Per-dispatch remote latency on the axon tunnel is ~30 ms — larger
    than many kernels' whole runtime — so time ``_INNER`` dependent calls
    inside ONE jitted program and divide.  The ``o + acc * 1e-30`` carry
    makes each iteration depend on the last (XLA cannot CSE the body to a
    single call), at the cost of one add per element.
    """
    @jax.jit
    def run(o, d):
        def body(_, acc):
            _, t, _ = isect_fn(o + acc * 1e-30, d)
            return jnp.minimum(t, 1e30).sum() * 1e-30
        return jax.lax.fori_loop(0, _INNER, body, jnp.float32(0.0))

    def timed(o, d):
        jax.block_until_ready(run(o, d))  # compile + warm
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            jax.block_until_ready(run(o, d))
            best = min(best, time.perf_counter() - t0)
        return best / _INNER

    return timed


def main():
    dev = str(jax.devices()[0])
    rows = []
    for n in SIZES:
        scene, cam, cfg = sphere_field(n=n)
        key = rng.base_key(0)
        ids = jnp.arange(R, dtype=jnp.int32)
        cam_u = rng.camera_uniforms(key, ids)
        o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
        np_prims = scene.num_primitives

        paths = {}
        paths["brute"] = lambda o_, d_: intersect_brute(scene, o_, d_, 1e-3)

        if np_prims <= PALLAS_DENSE_MAX:
            ppack = pack_scene_pallas(scene)
            paths["pallas"] = lambda o_, d_: intersect_pallas(
                scene, ppack, o_, d_, 1e-3)

        bvh = build_bvh(scene, max_leaf=4)
        from first_raytracer_tpu.accel.traverse import intersect_bvh
        paths["bvh"] = lambda o_, d_: intersect_bvh(scene, bvh, o_, d_,
                                                    1e-3)

        cpack = pack_scene_clustered(scene)
        paths["clustered"] = lambda o_, d_: intersect_clustered(
            scene, cpack, o_, d_, 1e-3)

        # Correctness gate on a slice before timing anything (slice sized
        # so brute's (R, Np, 3) tensor stays ~1 GB at 50k prims).
        r_g = 4096 if np_prims <= 8192 else 2048
        ref = tuple(np.asarray(x) for x in paths["brute"](o[:r_g],
                                                          d[:r_g]))
        agree = {}
        for name, fn in paths.items():
            got = tuple(np.asarray(x) for x in fn(o[:r_g], d[:r_g]))
            m = ref[2] & got[2]
            agree[name] = dict(
                hit_agree=float((ref[2] == got[2]).mean()),
                prim_agree=float((ref[0][m] == got[0][m]).mean()),
                t_close=bool(np.allclose(ref[1][m], got[1][m], rtol=1e-4,
                                         atol=1e-5)),
            )

        row = {"n_prims": int(np_prims),
               "clusters": int(cpack.sph_clusters + cpack.tri_clusters),
               "rays": R, "agree": agree, "mrays_s": {}, "rays_timed": {}}
        for name, fn in paths.items():
            # brute's (R, Np, 3) tensor at 50k prims is tens of GB; time
            # it on fewer rays (a rate is a rate — noted in rays_timed).
            r_t = R if not (name == "brute" and np_prims > 8192) else 1 << 11
            secs = _repeat_timer(fn)(o[:r_t], d[:r_t])
            row["mrays_s"][name] = round(r_t / secs / 1e6, 2)
            row["rays_timed"][name] = r_t
        rows.append(row)
        print(json.dumps(row))

    # Crossover summary: first size where clustered beats every dense path.
    cross = None
    for row in rows:
        m = row["mrays_s"]
        others = [v for k, v in m.items() if k != "clustered"]
        if others and m.get("clustered", 0) >= max(others):
            cross = row["n_prims"]
            break
    out = {"device": dev, "rows": rows, "clustered_wins_from_n": cross}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"crossover_n": cross, "out": OUT}))


if __name__ == "__main__":
    sys.exit(main())
