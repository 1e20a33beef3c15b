"""Megakernel tape recorder vs the wavefront recorders (VERDICT r3 item 3).

The recorder (kernels/record_mega.py) must produce the exact tape contract
of ``diff.replay.record_paths``: same shape, -1 for miss/dead, ORIGINAL
scene primitive ids, identical entries for identical RNG streams — so the
differentiable replay consumes either tape unchanged.  Interpret mode
exercises the compiled dataflow on CPU (SURVEY.md §5.2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from first_raytracer_tpu.core import rng
from first_raytracer_tpu.diff.replay import record_paths
from first_raytracer_tpu.kernels.record_mega import (pack_scene_mega,
                                                     record_paths_mega)
from first_raytracer_tpu.render.camera import generate_rays
from first_raytracer_tpu.scene.builders import (camera_showcase,
                                                random_scene, three_spheres,
                                                triangle_scene)


def _wavefront_tape(scene, cam, cfg, key, ids):
    cam_u = rng.camera_uniforms(key, ids)
    o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cam_u)
    return np.asarray(record_paths(scene, o, d, ids, key, cfg))


@pytest.mark.parametrize("preset,kw,min_agree", [
    (three_spheres, dict(nx=32, ny=16, spp=4), 0.999),
    # The tetrahedron bases are COPLANAR with the floor quad: the
    # recorder's packed-min (17-bit truncated t, the forward megakernel's
    # documented tie-break) legitimately resolves those exact-plane ties
    # to the other primitive ~0.5% of the time.
    (triangle_scene, dict(nx=32, ny=16, spp=2), 0.99),
    (camera_showcase, dict(nx=32, ny=16, spp=4), 0.999),
    (random_scene, dict(nx=24, ny=12, spp=2), 0.999),
], ids=["three-spheres", "triangle-mesh", "camera-effects",
        "random-spheres"])
def test_recorder_matches_wavefront_tape(preset, kw, min_agree):
    scene, cam, cfg = preset(**kw)
    key = rng.base_key(0)
    ids = jnp.arange(cfg.num_rays, dtype=jnp.int32)
    ref = _wavefront_tape(scene, cam, cfg, key, ids)
    pack = pack_scene_mega(scene)
    got = np.asarray(record_paths_mega(pack, cam, cfg, key,
                                       interpret=True))
    assert got.shape == ref.shape
    # The kernels share every f32 op with the wavefront path except the
    # documented cbrt/rsqrt ulp deviations and the packed-min tie-break,
    # which can flip rare near-tie winners; demand near-total agreement,
    # not bitwise.
    agree = (got == ref).mean()
    assert agree > min_agree, f"tape agreement {agree:.4%}"


def test_recorder_ray0_offset_slices_the_full_tape():
    scene, cam, cfg = three_spheres(nx=32, ny=16, spp=2)
    key = rng.base_key(3)
    pack = pack_scene_mega(scene)
    full = np.asarray(record_paths_mega(pack, cam, cfg, key,
                                        interpret=True))
    ray0, n = 100, 256
    part = np.asarray(record_paths_mega(pack, cam, cfg, key, ray0=ray0,
                                        num_rays=n, interpret=True))
    np.testing.assert_array_equal(part, full[:, ray0:ray0 + n])


def test_recorder_multi_tile_and_k_rays():
    """Grid-stride mapping: multiple tiles x k_rays slots reassemble to
    the flat ray order."""
    scene, cam, cfg = three_spheres(nx=40, ny=8, spp=2)
    key = rng.base_key(0)
    ids = jnp.arange(cfg.num_rays, dtype=jnp.int32)
    ref = _wavefront_tape(scene, cam, cfg, key, ids)
    pack = pack_scene_mega(scene)
    got = np.asarray(record_paths_mega(pack, cam, cfg, key, interpret=True,
                                       tile=128, k_rays=2))
    assert (got == ref).mean() > 0.999


def test_replay_consumes_recorder_tape():
    """Gradients from the recorder tape match the wavefront-recorded path
    end-to-end (loss + every parameter gradient)."""
    from first_raytracer_tpu.diff.grad import (render_loss_and_grads_tape,
                                               split_params)
    from first_raytracer_tpu.diff.replay import live_trips

    scene, cam, cfg = random_scene(nx=16, ny=8, spp=2)
    key = rng.base_key(1)
    R = cfg.num_rays
    ids = jnp.arange(R, dtype=jnp.int32)
    target = jnp.zeros((R, 3), jnp.float32)
    params, _ = split_params(scene)

    ref_tape = jnp.asarray(_wavefront_tape(scene, cam, cfg, key, ids))
    pack = pack_scene_mega(scene)
    mega_tape = record_paths_mega(pack, cam, cfg, key, interpret=True)

    trips = live_trips(ref_tape)
    l1, g1 = render_loss_and_grads_tape(params, scene, cam, cfg, key, ids,
                                        target, ref_tape[:trips])
    l2, g2 = render_loss_and_grads_tape(params, scene, cam, cfg, key, ids,
                                        target, mega_tape[:trips])
    assert np.allclose(float(l1), float(l2), rtol=1e-5)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_recorder_exact_pixel_decode_at_large_ray_ids():
    """Full-frame ray ids reach ~10M, where a plain f32 reciprocal decode
    of rid // spp is one ulp from misdecoding the pixel (the recorder
    uses a remainder-corrected floor-div).  Record a slice high in the id
    space of a full-size config and compare against the wavefront
    recorder at the same ids."""
    from first_raytracer_tpu.scene.builders import random_scene as _rs

    scene, cam, cfg = _rs()          # 1200x800 @ 10spp: ids up to 9.6M
    key = rng.base_key(0)
    ray0, n = 9_500_000, 512
    ids = jnp.arange(ray0, ray0 + n, dtype=jnp.int32)
    ref = _wavefront_tape(scene, cam, cfg, key, ids)
    pack = pack_scene_mega(scene)
    got = np.asarray(record_paths_mega(pack, cam, cfg, key, ray0=ray0,
                                       num_rays=n, interpret=True))
    agree = (got == ref).mean()
    assert agree > 0.999, f"tape agreement {agree:.4%} at large ray ids"


def test_legacy_recorder_matches_mega_impl():
    """The standalone recorder kernel (impl="legacy", kept as the Mosaic
    codegen-cliff repro) must produce the same tape as the production
    megakernel-backed implementation."""
    scene, cam, cfg = random_scene(nx=24, ny=12, spp=2)
    key = rng.base_key(0)
    pack = pack_scene_mega(scene)
    v2 = np.asarray(record_paths_mega(pack, cam, cfg, key, interpret=True))
    legacy = np.asarray(record_paths_mega(pack, cam, cfg, key,
                                          interpret=True, impl="legacy"))
    agree = (v2 == legacy).mean()
    assert agree > 0.999, f"legacy/mega tape agreement {agree:.4%}"
