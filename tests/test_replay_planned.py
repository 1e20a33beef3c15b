"""Bucketed (depth-sorted) replay vs the flat tape replay.

plan_buckets sorts rays by recorded path length so each bucket replays
only its own trip count; per-ray radiance is identical (replay is per-ray
independent), so the loss and every gradient must match the flat replay
up to f32 summation order.
"""
import jax.numpy as jnp
import numpy as np

from first_raytracer_tpu.core import rng
from first_raytracer_tpu.diff.grad import (render_loss_and_grads_bucketed,
                                           render_loss_and_grads_tape,
                                           split_params)
from first_raytracer_tpu.diff.replay import (live_trips, plan_buckets,
                                             record_paths)
from first_raytracer_tpu.render.camera import generate_rays
from first_raytracer_tpu.scene.builders import random_scene, three_spheres


def _setup(preset, **kw):
    scene, cam, cfg = preset(**kw)
    key = rng.base_key(1)
    ids = jnp.arange(cfg.num_rays, dtype=jnp.int32)
    cam_u = rng.camera_uniforms(key, ids)
    o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
    tape = record_paths(scene, o, d, ids, key, cfg)
    r = np.random.RandomState(0)
    target = jnp.asarray(r.rand(cfg.num_rays, 3).astype(np.float32))
    return scene, cam, cfg, key, ids, target, tape


def test_plan_covers_all_rays():
    scene, cam, cfg, key, ids, target, tape = _setup(
        random_scene, nx=16, ny=8, spp=2)
    order, groups = plan_buckets(tape)
    assert sorted(np.asarray(order).tolist()) == list(range(cfg.num_rays))
    assert sum(n for _, n, _ in groups) == cfg.num_rays
    # Trip counts are nondecreasing and within the tape depth.
    trips = [t for _, _, t in groups]
    assert trips == sorted(trips) and trips[-1] <= tape.shape[0]


def test_bucketed_matches_flat_replay():
    for preset, kw in ((random_scene, dict(nx=16, ny=8, spp=2)),
                       (three_spheres, dict(nx=16, ny=8, spp=2))):
        scene, cam, cfg, key, ids, target, tape = _setup(preset, **kw)
        params, _ = split_params(scene)
        l_flat, g_flat = render_loss_and_grads_tape(
            params, scene, cam, cfg, key, ids, target,
            tape[:live_trips(tape)])
        l_b, g_b = render_loss_and_grads_bucketed(
            params, scene, cam, cfg, key, ids, target, tape)
        np.testing.assert_allclose(float(l_b), float(l_flat), rtol=1e-5)
        for k in g_flat:
            np.testing.assert_allclose(np.asarray(g_b[k]),
                                       np.asarray(g_flat[k]),
                                       rtol=1e-4, atol=1e-6, err_msg=k)


def test_bucketed_work_is_smaller():
    """The plan's total (rays x trips) work must beat flat replay on a
    depth-skewed tape (the reason it exists)."""
    scene, cam, cfg, key, ids, target, tape = _setup(
        random_scene, nx=16, ny=8, spp=4)
    order, groups = plan_buckets(tape)
    flat = cfg.num_rays * live_trips(tape)
    planned = sum(n * t for _, n, t in groups)
    assert planned < flat, (planned, flat)


def test_gather_extraction_matches_onehot(monkeypatch):
    """Large-scene extraction fallback (plain gather) must produce the
    same loss and gradients as the one-hot matmul path."""
    import first_raytracer_tpu.diff.replay as replay_mod

    scene, cam, cfg, key, ids, target, tape = _setup(
        random_scene, nx=16, ny=8, spp=2)
    params, _ = split_params(scene)
    trips = live_trips(tape)
    l1, g1 = render_loss_and_grads_tape(params, scene, cam, cfg, key, ids,
                                        target, tape[:trips])
    monkeypatch.setattr(replay_mod, "_ONEHOT_MAX", 1)
    # New jit trace so the patched constant takes effect.
    l2, g2 = render_loss_and_grads_tape.__wrapped__(
        params, scene, cam, cfg, key, ids, target, tape[:trips])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    # Material-parameter grads match tightly.  Geometry grads are looser:
    # swapping the extraction op changes XLA fusion/rounding in the
    # rematerialized bounce math by ~1 ulp, which can flip a knife-edge
    # root selection for a ray or two — at this tiny R that moves a
    # center/radius grad entry by a visible fraction (the same
    # compilation-noise class as the kernel-vs-wavefront deviations).
    # Exactness of the gather path itself is pinned by the isolated
    # vjp comparison and the FD suites.
    for k in ("albedo", "albedo2", "fuzz", "ref_idx"):
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=1e-3, atol=1e-5, err_msg=k)
    for k in ("sphere_center", "sphere_radius"):
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        scale = max(float(np.abs(a).max()), 1e-6)
        np.testing.assert_allclose(b, a, rtol=0, atol=0.35 * scale,
                                   err_msg=k)


def test_large_scene_grad_end_to_end():
    """sphere_field(5000): record with the clustered intersector, replay
    with the gather extraction (one-hot would materialize (R, 5120));
    gradients must be finite and the albedo gradient nonzero."""
    import jax
    from first_raytracer_tpu.kernels.intersect_clustered import (
        intersect_clustered, pack_scene_clustered)
    from first_raytracer_tpu.scene.builders import sphere_field

    scene, cam, cfg = sphere_field(n=5000, nx=16, ny=8, spp=1)
    key = rng.base_key(0)
    ids = jnp.arange(cfg.num_rays, dtype=jnp.int32)
    cam_u = rng.camera_uniforms(key, ids)
    o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
    accel = pack_scene_clustered(scene)

    def isect(s, a, o_, d_, tm):
        return intersect_clustered(s, a, o_, d_, tm, interpret=True)

    tape = record_paths(scene, o, d, ids, key, cfg, accel=accel,
                        intersect_fn=isect)
    params, _ = split_params(scene, fields=("albedo", "sphere_center"))
    target = jnp.zeros((cfg.num_rays, 3), jnp.float32)
    loss, grads = render_loss_and_grads_bucketed(
        params, scene, cam, cfg, key, ids, target, tape)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
    assert float(jnp.abs(grads["albedo"]).max()) > 0.0


def test_fit_step_replay_converges():
    """The fast fit step (in-kernel record + bucketed replay grads) must
    reduce the loss recovering a perturbed albedo."""
    import dataclasses
    import optax
    from first_raytracer_tpu.diff.grad import make_fit_step_replay

    scene, cam, cfg = random_scene(nx=16, ny=8, spp=2)
    key = rng.base_key(0)
    ids = jnp.arange(cfg.num_rays, dtype=jnp.int32)
    cam_u = rng.camera_uniforms(key, ids)
    from first_raytracer_tpu.diff.grad import ray_radiance, split_params as sp
    params_true, _ = sp(scene, fields=("albedo",))
    target = ray_radiance(params_true, scene, cam, cfg, key, ids)
    bad = dataclasses.replace(scene, albedo=scene.albedo * 0.6)
    params, _ = sp(bad, fields=("albedo",))
    opt = optax.adam(0.05)
    step = make_fit_step_replay(bad, cam, cfg, ids, target, opt,
                                interpret=True)
    state = opt.init(params)
    losses = []
    for _ in range(5):
        loss, params, state = step(params, state, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.6, losses
