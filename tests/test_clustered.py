"""Clustered Pallas intersector: equivalence, packing, and edge cases.

The two-level device BVH (kernels/intersect_clustered.py) must be a
drop-in replacement for intersect_brute: same winner convention
(lexicographic (t, gid)), same (prim, t, hit) contract, on every scene
shape — sphere-only, triangle-only, mixed, and at cluster-capacity
boundaries.  Runs in Pallas interpret mode on the CPU mesh (real-TPU
compile covered by tools/crossover_bench.py and acceptance).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from first_raytracer_tpu.kernels.intersect_clustered import (
    ClusteredScenePack, intersect_clustered, pack_scene_clustered)
from first_raytracer_tpu.render.integrator import intersect_brute
from first_raytracer_tpu.scene.builders import (camera_showcase,
                                                random_scene, sphere_field,
                                                three_spheres,
                                                triangle_scene)


def _rays(n=700, seed=0, lo=-8.0, hi=8.0):
    r = np.random.default_rng(seed)
    o = r.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check_matches_brute(scene, n_rays=700, seed=0, max_leaf=128,
                         t_rtol=1e-5):
    pack = pack_scene_clustered(scene, max_leaf=max_leaf)
    o, d = _rays(n_rays, seed)
    p1, t1, h1 = map(np.asarray, intersect_brute(scene, o, d, 1e-3))
    p2, t2, h2 = map(np.asarray, intersect_clustered(
        scene, pack, o, d, 1e-3, interpret=True))
    np.testing.assert_array_equal(h1, h2)
    m = h1
    np.testing.assert_array_equal(p1[m], p2[m])
    np.testing.assert_allclose(t1[m], t2[m], rtol=t_rtol, atol=1e-6)
    return pack


@pytest.mark.parametrize("builder", [three_spheres, random_scene,
                                     triangle_scene, camera_showcase])
def test_clustered_matches_brute_presets(builder):
    scene = builder()[0]
    _check_matches_brute(scene)


def test_clustered_matches_brute_large_field():
    """5k-sphere field — many clusters, the regime the kernel exists for."""
    scene = sphere_field(n=5000)[0]
    # t to 1e-4 rel: at field scale |t| ~ 1e3 the brute (R, Np) and the
    # kernel's (P, R) evaluation contract FMAs differently (winner ids
    # still agree exactly).
    pack = _check_matches_brute(scene, n_rays=1024, seed=3, t_rtol=1e-4)
    assert pack.sph_clusters > 30  # genuinely clustered, not one leaf


@pytest.mark.parametrize("max_leaf", [1, 7, 128])
def test_clustered_leaf_size_invariance(max_leaf):
    """Winner selection is cluster-partition-invariant (the lexicographic
    (t, gid) fold does not depend on how primitives land in clusters)."""
    scene = random_scene(seed=7)[0]
    _check_matches_brute(scene, max_leaf=max_leaf)


def test_clustered_small_leaf_equals_large_leaf():
    scene = triangle_scene()[0]
    o, d = _rays(300, 5)
    outs = []
    for ml in (2, 128):
        pack = pack_scene_clustered(scene, max_leaf=ml)
        outs.append(tuple(map(np.asarray, intersect_clustered(
            scene, pack, o, d, 1e-3, interpret=True))))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_array_equal(outs[0][2], outs[1][2])


def test_pack_validates_inputs():
    scene = three_spheres()[0]
    with pytest.raises(ValueError):
        pack_scene_clustered(scene, max_leaf=0)
    with pytest.raises(ValueError):
        pack_scene_clustered(scene, max_leaf=129)
    with pytest.raises(ValueError):
        pack_scene_clustered(scene, vmem_budget_bytes=64)


def test_pack_shapes_and_sentinels():
    scene = random_scene(seed=7)[0]
    pack = pack_scene_clustered(scene)
    assert isinstance(pack, ClusteredScenePack)
    sph = np.asarray(pack.sph)
    assert sph.shape[0] % 8 == 0 and sph.shape[1] == 128
    sph = sph.reshape(-1, 8, 128)   # (K_pad, plane, slot)
    # every live slot's gid row is a valid global id; sentinel slots miss
    gids = sph[:pack.sph_clusters, 4, :]
    live = sph[:pack.sph_clusters, 0, :] < 1e29
    assert live.sum() == scene.num_spheres
    ids = np.sort(gids[live].astype(np.int64))
    np.testing.assert_array_equal(ids, np.arange(scene.num_spheres))
    # padded cluster boxes are inverted (never gate-hit)
    box = np.asarray(pack.sph_box)
    if box.shape[0] > pack.sph_clusters:
        assert (box[pack.sph_clusters:, 0:3] >
                box[pack.sph_clusters:, 3:6]).all()


def test_clustered_in_integrator():
    """Full wavefront render with the clustered intersector equals the
    brute-force render (the intersect_fn contract end-to-end)."""
    import jax

    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.render.camera import generate_rays
    from first_raytracer_tpu.render.integrator import trace_rays

    scene, cam, cfg0 = three_spheres()
    import dataclasses
    cfg = dataclasses.replace(cfg0, nx=40, ny=20, spp=2)
    key = jax.random.PRNGKey(0)
    ids = jnp.arange(cfg.nx * cfg.ny * cfg.spp, dtype=jnp.uint32)
    cam_u = rng.camera_uniforms(key, ids)
    o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
    pack = pack_scene_clustered(scene)

    def isect(scene_, accel, o_, d_, t_min):
        return intersect_clustered(scene_, accel, o_, d_, t_min,
                                   interpret=True)

    rad_cl = np.asarray(trace_rays(scene, o, d, ids, key, cfg,
                                   accel=pack, intersect_fn=isect))
    rad_bf = np.asarray(trace_rays(scene, o, d, ids, key, cfg))
    np.testing.assert_allclose(rad_cl, rad_bf, rtol=1e-5, atol=1e-6)
