"""Clustered megakernel (kernels/megakernel_clustered.py) correctness.

The clustered variant must be an exact drop-in for the dense megakernel —
same RNG stream, same scatter math, same radiance — with the dense sweep
replaced by gated per-cluster sweeps.  Because its per-cluster selection
is EXACT (min t, no packed truncation) while the fold order only differs
on exact ties, the two kernels agree bit-for-bit on every canonical scene
(verified below), and both carry the same documented statistical deviation
vs the wavefront path (cbrt/rsqrt ulps).
"""
import numpy as np
import pytest

from first_raytracer_tpu.kernels.megakernel import render_image_mega
from first_raytracer_tpu.kernels.megakernel_clustered import (
    pack_scene_mega_clustered, render_image_mega_clustered,
    render_pixels_mega_clustered)
from first_raytracer_tpu.render.api import render_image
from first_raytracer_tpu.scene.builders import (camera_showcase,
                                                random_scene, sphere_field,
                                                three_spheres,
                                                triangle_scene)


@pytest.mark.parametrize("preset,kw", [
    (three_spheres, dict(nx=32, ny=16, spp=4)),
    (triangle_scene, dict(nx=32, ny=16, spp=2)),
    (camera_showcase, dict(nx=32, ny=16, spp=4)),
    (random_scene, dict(nx=24, ny=12, spp=2)),
], ids=["three-spheres", "triangle-mesh", "camera-effects",
        "random-spheres"])
def test_clustered_matches_dense_megakernel(preset, kw):
    scene, cam, cfg = preset(**kw)
    dense = np.asarray(render_image_mega(scene, cam, cfg, interpret=True))
    clus = np.asarray(render_image_mega_clustered(scene, cam, cfg,
                                                  interpret=True))
    # Exact-tie fold-order differences are the only permitted deviation;
    # none occur on these scenes.
    np.testing.assert_allclose(clus, dense, rtol=0, atol=1e-6)


def test_clustered_on_sphere_field_matches_wavefront():
    """The kernel's reason to exist: a multi-cluster field scene renders
    the wavefront image within the kernel-family statistical bound."""
    scene, cam, cfg = sphere_field(n=600, nx=32, ny=16, spp=2)
    ref = np.asarray(render_image(scene, cam, cfg))
    img = np.asarray(render_image_mega_clustered(scene, cam, cfg,
                                                 interpret=True))
    d = np.abs(ref - img)
    assert (d > 1e-3).mean() < 0.03
    assert np.median(d) < 1e-5
    # And bit-equal to the dense megakernel (same family, same ties).
    dense = np.asarray(render_image_mega(scene, cam, cfg, interpret=True))
    np.testing.assert_allclose(img, dense, rtol=0, atol=1e-6)


def test_cluster_sort_is_a_pure_reordering():
    """Front-to-back cluster sorting must not change the image (the fold
    is order-independent away from exact ties)."""
    from first_raytracer_tpu.core import rng

    scene, cam, cfg = sphere_field(n=400, nx=24, ny=12, spp=2)
    key = rng.base_key(0)
    p_sorted = pack_scene_mega_clustered(scene, sort_from=cam.origin)
    p_plain = pack_scene_mega_clustered(scene)
    r1, _ = render_pixels_mega_clustered(p_sorted, cam, cfg, key,
                                         interpret=True)
    r2, _ = render_pixels_mega_clustered(p_plain, cam, cfg, key,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=0, atol=1e-6)


def test_clustered_sharded_matches_single_device():
    """Tiles-DP sharding over the 8-device CPU mesh is bit-identical to
    the single-device clustered render (globally-keyed RNG + pix0)."""
    from first_raytracer_tpu.kernels.megakernel_clustered import (
        render_image_mega_clustered_sharded)
    from first_raytracer_tpu.parallel.mesh import make_render_mesh

    # ny=64 gives 4 real stride tiles, so every shard owns a non-empty
    # distinct tile range (a single-tile config would pass vacuously).
    scene, cam, cfg = sphere_field(n=300, nx=64, ny=64, spp=1)
    single = np.asarray(render_image_mega_clustered(
        scene, cam, cfg, interpret=True, tile=128, k_pix=2))
    import jax
    mesh = make_render_mesh(num_tile_shards=4, num_spp_shards=1,
                            devices=jax.devices()[:4])
    sharded = np.asarray(render_image_mega_clustered_sharded(
        scene, cam, cfg, mesh, interpret=True, tile=128, k_pix=2))
    np.testing.assert_allclose(sharded, single, rtol=0, atol=1e-6)


def test_clustered_segment_counts_match_dense():
    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.kernels.megakernel import (pack_scene_mega,
                                                        render_pixels_mega)

    scene, cam, cfg = sphere_field(n=400, nx=24, ny=12, spp=2)
    key = rng.base_key(0)
    _, seg_c = render_pixels_mega_clustered(
        pack_scene_mega_clustered(scene), cam, cfg, key, interpret=True)
    _, seg_d = render_pixels_mega(pack_scene_mega(scene), cam, cfg, key,
                                  interpret=True)
    assert int(np.asarray(seg_c).sum()) == int(np.asarray(seg_d).sum())


import pytest as _pytest


@_pytest.mark.parametrize("mapping", ["band", "stride", "rect"])
def test_all_pixel_mappings_match_dense(mapping):
    """Every selectable pixel mapping (band default, stride, rect) must
    reassemble to the same image as the dense megakernel — the mapping
    only permutes which lane traces which pixel."""
    from first_raytracer_tpu.kernels.megakernel_clustered import (
        render_pixels_mega_clustered)
    from first_raytracer_tpu.core import rng as _rng
    from first_raytracer_tpu.kernels.megakernel import (pack_scene_mega,
                                                        render_pixels_mega)

    scene, cam, cfg = sphere_field(n=400, nx=64, ny=32, spp=2)
    key = _rng.base_key(0)
    dense, _ = render_pixels_mega(pack_scene_mega(scene), cam, cfg, key,
                                  interpret=True)
    pack = pack_scene_mega_clustered(scene, sort_from=cam.origin)
    got, _ = render_pixels_mega_clustered(pack, cam, cfg, key,
                                          interpret=True, tile=128,
                                          k_pix=2, mapping=mapping)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               rtol=0, atol=1e-6)


@_pytest.mark.parametrize("preset,kw", [
    (random_scene, dict(nx=24, ny=12, spp=2)),
    (sphere_field, dict(n=600, nx=24, ny=12, spp=2)),
    (triangle_scene, dict(nx=24, ny=12, spp=2)),
], ids=["random-spheres", "sphere-field", "triangle-mesh"])
def test_adjacency_gate_mode_matches_slab(preset, kw):
    """gate_mode="adj" (hit-point-cell adjacency phase 1 + exact slab
    phase 2) and gate_mode="hier" (supergroup slab gates — the r5
    default direction: one gate per <=8 spatially-grouped clusters) must
    be pure scheduling changes: same radiance, same segment counts as
    the slab-gated kernel (which itself bit-matches the dense
    megakernel)."""
    from first_raytracer_tpu.core import rng as _rng

    scene, cam, cfg = preset(**kw)
    pack = pack_scene_mega_clustered(scene, sort_from=cam.origin)
    key = _rng.base_key(0)
    r_slab, s_slab = render_pixels_mega_clustered(
        pack, cam, cfg, key, interpret=True, gate_mode="slab")
    for gm in ("adj", "hier", "wl"):
        r_g, s_g, its, swp = render_pixels_mega_clustered(
            pack, cam, cfg, key, interpret=True, gate_mode=gm,
            return_iters=True)
        np.testing.assert_allclose(np.asarray(r_g), np.asarray(r_slab),
                                   rtol=0, atol=1e-6, err_msg=gm)
        assert (np.asarray(s_g) == np.asarray(s_slab)).all(), gm
        # The sweep counter is live and bounded by ungated cost
        # (it counts sphere AND triangle cluster sweeps).
        trips = int(np.asarray(its).sum())
        assert 0 < int(np.asarray(swp).sum()) <= trips * (
            pack.clusters + pack.tri_clusters)


def test_hier_supergroups_active_at_scale():
    """Supergrouping only engages past 16 clusters; every other committed
    test runs below that, so this one pins the ACTUAL hier machinery
    (multi-child spans, super boxes, fired-group child sweeps) against
    slab on a scene big enough to form real supergroups."""
    from first_raytracer_tpu.core import rng as _rng

    scene, cam, cfg = sphere_field(n=2500, nx=16, ny=8, spp=1)
    pack = pack_scene_mega_clustered(scene, sort_from=cam.origin)
    assert pack.clusters > 16
    assert len(pack.super_spans) < pack.clusters          # grouped
    assert max(b - a for a, b in pack.super_spans) > 1    # multi-child
    key = _rng.base_key(0)
    r_slab, s_slab = render_pixels_mega_clustered(
        pack, cam, cfg, key, interpret=True, gate_mode="slab")
    for gm in ("hier", "wl"):
        r_g, s_g = render_pixels_mega_clustered(
            pack, cam, cfg, key, interpret=True, gate_mode=gm)
        np.testing.assert_allclose(np.asarray(r_g), np.asarray(r_slab),
                                   rtol=0, atol=1e-6, err_msg=gm)
        assert (np.asarray(s_g) == np.asarray(s_slab)).all(), gm


def test_pack_layout_reuse_is_static_and_correct():
    """make_fit_step_replay repacks per optimizer step; a frozen
    ClusterLayout must keep every jit-STATIC pack attribute bit-identical
    across repacks of a PERTURBED scene (no per-step Mosaic recompile —
    r5 review finding) while boxes/payloads track the new geometry."""
    import dataclasses as _dc
    import jax.numpy as _jnp
    from first_raytracer_tpu.core import rng as _rng
    from first_raytracer_tpu.kernels.record_mega import (
        record_paths_mega_clustered)
    from first_raytracer_tpu.diff.replay import record_paths
    from first_raytracer_tpu.render.camera import generate_rays

    scene, cam, cfg = sphere_field(n=600, nx=16, ny=8, spp=2)
    pack0, layout = pack_scene_mega_clustered(
        scene, sort_from=cam.origin, return_layout=True)
    # Identity repack reproduces the fresh pack exactly.
    pack_same = pack_scene_mega_clustered(scene, sort_from=cam.origin,
                                          layout=layout)
    np.testing.assert_array_equal(np.asarray(pack_same.boxes),
                                  np.asarray(pack0.boxes))
    np.testing.assert_array_equal(np.asarray(pack_same.sph),
                                  np.asarray(pack0.sph))
    # Perturb geometry: statics identical, recorder still correct.
    moved = _dc.replace(
        scene, sphere_center=scene.sphere_center
        + _jnp.full((scene.num_spheres, 3), 0.03, _jnp.float32))
    pack1 = pack_scene_mega_clustered(moved, sort_from=cam.origin,
                                      layout=layout)
    for f in ("clusters", "tri_clusters", "super_spans",
              "tri_super_spans", "grid_lo", "grid_inv", "grid_dims",
              "phase1_margin"):
        assert getattr(pack1, f) == getattr(pack0, f), f
    key = _rng.base_key(1)
    ids = np.arange(cfg.num_rays, dtype=np.int32)
    import jax.numpy as jnp2
    idsj = jnp2.asarray(ids)
    cam_u = _rng.camera_uniforms(key, idsj)
    o, d = generate_rays(cam, cfg.nx, cfg.ny, cfg.spp, idsj, cam_u)
    ref = np.asarray(record_paths(moved, o, d, idsj, key, cfg))
    got = np.asarray(record_paths_mega_clustered(
        pack1, cam, cfg, key, num_rays=cfg.num_rays, interpret=True))
    # The uniform shift aligns many grid spheres at identical heights, so
    # the near-tie flip class is a little denser than on the canonical
    # scenes (0.9963 measured) — still the documented ulp-tie class.
    assert (got == ref).mean() > 0.995
