"""Pallas intersect kernel tests (SURVEY.md §7 step 4): interpret-mode
equivalence with the pure-JAX brute-force path — the 'sanitizer' run of
SURVEY.md §5.2 — on spheres, triangles, and mixed scenes."""
import functools

import jax.numpy as jnp
import numpy as np
import pytest

from first_raytracer_tpu.kernels.intersect_pallas import (intersect_pallas,
                                                          pack_scene_pallas)
from first_raytracer_tpu.render.integrator import intersect_brute
from first_raytracer_tpu.scene.builders import (random_scene, three_spheres,
                                                triangle_scene)

INTERPRET = functools.partial(intersect_pallas, interpret=True)


def _rays(n, seed, spread=6.0):
    r = np.random.RandomState(seed)
    o = (r.randn(n, 3) * spread).astype(np.float32)
    d = r.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("preset,nrays", [
    (three_spheres, 700),     # non-multiple of TILE_R exercises padding
    (triangle_scene, 512),
    (random_scene, 1024),
], ids=["three-spheres", "triangle-mesh", "random-spheres"])
def test_pallas_matches_brute(preset, nrays):
    scene, _, _ = preset()
    pack = pack_scene_pallas(scene)
    o, d = _rays(nrays, 7)
    pb, tb, hb = intersect_brute(scene, o, d, 1e-3)
    pp, tp, hp = INTERPRET(scene, pack, o, d, 1e-3)
    pb, tb, hb = map(np.asarray, (pb, tb, hb))
    pp, tp, hp = map(np.asarray, (pp, tp, hp))
    # Hit masks and winners agree except possibly at float knife edges.
    assert (hb != hp).mean() < 0.002
    both = hb & hp
    agree = pb[both] == pp[both]
    assert agree.mean() > 0.998
    np.testing.assert_allclose(tb[both][agree], tp[both][agree], rtol=5e-5)


def test_pallas_render_matches_brute_render():
    """Full wavefront render with the Pallas intersector == brute render."""
    from first_raytracer_tpu.core import rng
    from first_raytracer_tpu.render.api import render_ray_batch

    scene, cam, cfg = three_spheres(nx=16, ny=8, spp=2)
    pack = pack_scene_pallas(scene)
    key = rng.base_key(0)
    ids = jnp.arange(cfg.num_rays, dtype=jnp.int32)
    a = np.asarray(render_ray_batch(scene, cam, cfg, key, ids))
    b = np.asarray(render_ray_batch(
        scene, cam, cfg, key, ids, pack, intersect_fn=INTERPRET))
    diff = np.abs(a - b).max(axis=1)
    assert (diff > 1e-4).mean() < 0.005, diff.max()
