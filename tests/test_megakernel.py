"""Megakernel tests: interpret-mode equivalence with the wavefront
integrator on all scene presets (SURVEY.md §5.2 'sanitizer' runs).

The megakernel re-derives the whole pipeline (camera, threefry RNG,
intersect, scatter, sky) in-kernel, so these tests pin it against
``render_image`` — identical RNG stream, so images match to float
associativity except where the ``cbrt``-replacement perturbs a
near-silhouette sample (bounded statistically)."""
import numpy as np
import pytest

from first_raytracer_tpu.kernels.megakernel import (pack_scene_mega,
                                                    render_image_mega,
                                                    render_pixels_mega)
from first_raytracer_tpu.render.api import render_image
from first_raytracer_tpu.scene.builders import (camera_showcase,
                                                random_scene, three_spheres,
                                                triangle_scene)


@pytest.mark.parametrize("preset,kw", [
    (three_spheres, dict(nx=32, ny=16, spp=4)),
    (triangle_scene, dict(nx=32, ny=16, spp=2)),
    (camera_showcase, dict(nx=32, ny=16, spp=4)),
    (random_scene, dict(nx=24, ny=12, spp=2)),
], ids=["three-spheres", "triangle-mesh", "camera-effects",
        "random-spheres"])
def test_megakernel_matches_wavefront(preset, kw):
    scene, cam, cfg = preset(**kw)
    ref = np.asarray(render_image(scene, cam, cfg))
    img = np.asarray(render_image_mega(scene, cam, cfg, interpret=True))
    diff = np.abs(ref - img)
    # Bulk of pixels bit-close; allow rare cbrt-ulp silhouette flips.
    assert (diff > 1e-3).mean() < 0.01, diff.max()
    assert np.median(diff) < 1e-5


def test_megakernel_grid_stride_mapping():
    """Radiance lands on the right pixel for every lane/j combination.

    Forces multiple tiles *and* k_pix > 1 with a tiny tile so the
    (3K, T) unpack path is exercised end-to-end.
    """
    scene, cam, cfg = three_spheres(nx=40, ny=8, spp=2)
    ref = np.asarray(render_image(scene, cam, cfg))
    img = np.asarray(render_image_mega(scene, cam, cfg, interpret=True,
                                       tile=128, k_pix=2))
    diff = np.abs(ref - img)
    assert (diff > 1e-3).mean() < 0.01
    assert np.median(diff) < 1e-5


def test_megakernel_segment_counts():
    """Segment totals agree with the integrator's stats counter."""
    from first_raytracer_tpu.core import rng
    import jax.numpy as jnp
    from first_raytracer_tpu.render.camera import generate_rays
    from first_raytracer_tpu.render.integrator import trace_rays

    scene, cam, cfg = three_spheres(nx=16, ny=8, spp=2)
    key = rng.base_key(0)
    ids = jnp.arange(cfg.num_rays, dtype=jnp.int32)
    cu = rng.camera_uniforms(key, ids)
    o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, ids, cu)
    _, segs_ref = trace_rays(scene, o, d, ids, key, cfg, return_stats=True)

    pack = pack_scene_mega(scene)
    _, segs = render_pixels_mega(pack, cam, cfg, key, interpret=True)
    assert int(np.asarray(segs).sum()) == int(np.asarray(segs_ref).sum())


def test_megakernel_sharded_matches_single():
    """8-device tiles mesh == single-device megakernel, bit-identical.

    Sharding invariance (SURVEY.md §4.5c): RNG keyed by global ray id, so
    the pixel blocks are computed identically wherever they land.
    """
    from first_raytracer_tpu.kernels.megakernel import (
        render_image_mega_sharded)
    from first_raytracer_tpu.parallel.mesh import make_render_mesh

    scene, cam, cfg = three_spheres(nx=40, ny=8, spp=2)
    mesh = make_render_mesh(8, 1)
    single = np.asarray(render_image_mega(scene, cam, cfg, interpret=True,
                                          tile=128, k_pix=2))
    sharded = np.asarray(render_image_mega_sharded(
        scene, cam, cfg, mesh, interpret=True, tile=128, k_pix=2))
    np.testing.assert_array_equal(single, sharded)


def test_megakernel_occupancy_metrics():
    from first_raytracer_tpu.utils.metrics import megakernel_occupancy

    scene, cam, cfg = three_spheres(nx=32, ny=8, spp=2)
    m = megakernel_occupancy(scene, cam, cfg, interpret=True, tile=128,
                             k_pix=2)
    assert m["segments"] > cfg.num_rays  # >= 1 segment per path
    assert 0 < m["lane_occupancy"] <= 1


@pytest.mark.parametrize("nx,ny,spp", [
    (8, 4, 1),      # image smaller than a tile, single sample
    (7, 5, 3),      # nothing divides anything
    (16, 8, 100),   # deep sample loop (the book's spp)
])
def test_megakernel_shape_edges(nx, ny, spp):
    scene, cam, cfg = three_spheres(nx=nx, ny=ny, spp=spp)
    ref = np.asarray(render_image(scene, cam, cfg))
    img = np.asarray(render_image_mega(scene, cam, cfg, interpret=True,
                                       tile=128, k_pix=2))
    d = np.abs(ref - img)
    assert (d > 1e-3).mean() < 0.02, d.max()
    assert np.median(d) < 1e-5


def test_megakernel_triangles_only_scene():
    """ns=0 path: the sphere sweep and its winner-t replay are compiled
    out entirely; triangle winner replay supplies t/normals/materials."""
    import dataclasses

    import jax.numpy as jnp

    from first_raytracer_tpu.scene.builders import PRESETS

    scene, cam, cfg = PRESETS["triangle-mesh"](nx=48, ny=24, spp=2)
    tri_only = dataclasses.replace(
        scene,
        sphere_center=jnp.zeros((0, 3), jnp.float32),
        sphere_radius=jnp.zeros((0,), jnp.float32),
        sphere_mat=jnp.zeros((0,), jnp.int32),
    )
    ref = np.asarray(render_image(tri_only, cam, cfg))
    img = np.asarray(render_image_mega(tri_only, cam, cfg, interpret=True))
    diff = np.abs(ref - img)
    assert (diff > 1e-3).mean() < 0.01, diff.max()
