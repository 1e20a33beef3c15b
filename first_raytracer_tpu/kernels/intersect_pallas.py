"""Pallas TPU kernel: fused brute-force closest hit.

TPU-native re-architecture of the #1 hot function — the reference's
``world->hit(...)`` traversal (SURVEY.md §3.3) — as a Pallas kernel
(SURVEY.md §7 step 4a): a tile of rays and the entire scene SoA live in
VMEM; the (prims x rays) distance matrix, its masking, and the closest-hit
arg-reduction are all fused on-chip, so HBM sees only the (R,) ray streams
in and the (R,) winner streams out (the XLA fallback materializes/refuses
to fuse parts of the (R, Np) matrix at larger sizes).

Layout choices (see pallas_guide.md "Tiling Constraints"):
- rays are transposed to coordinate-planes ``(3, R)`` / ``(8, R)`` so the
  128-lane axis runs along rays;
- primitives are padded to a sublane multiple with never-hit sentinels
  (sphere center at 1e30 with radius 0; all-zero triangles have a zero
  Möller-Trumbore determinant), so masks cost nothing extra;
- the same oc-form float32 formulas as geometry/{sphere,triangle}.py, so
  hit ranking is consistent with the recompute path and the oracle.

The kernel returns (t, prim); the integrator recomputes the differentiable
hit record, so — like the BVH walk — this kernel needs no gradient rules.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.sphere import BIG

# Python-float mirror of BIG: jnp scalars become captured constants inside
# a pallas kernel, which pallas_call rejects.
_BIG = 1e30

__all__ = ["intersect_pallas", "pack_scene_pallas", "PallasScenePack"]

# Rays per grid step: (prims_pad x TILE_R) f32 temporaries must fit VMEM.
TILE_R = 512
_LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class PallasScenePack:
    """Scene SoA repacked for the kernel (padded, plane-major)."""

    spheres: jax.Array    # (8, Ns_pad) f32: cx cy cz r pad pad pad pad
    tris: jax.Array       # (16, Nt_pad) f32: v0 v1 v2 coords (9 rows) + pad
    sphere_rows: int      # static true Ns (<= Ns_pad)
    tri_rows: int         # static true Nt


# Primitive counts are *static* metadata (they gate kernel structure), the
# packed planes are data leaves.
jax.tree_util.register_dataclass(
    PallasScenePack, data_fields=("spheres", "tris"),
    meta_fields=("sphere_rows", "tri_rows"))


def pack_scene_pallas(scene) -> PallasScenePack:
    """Host-side repack (runs once per scene, like the BVH build)."""
    ns = scene.num_spheres
    nt = scene.num_triangles
    ns_pad = max(_round_up(ns, _LANE), _LANE)
    nt_pad = max(_round_up(nt, _LANE), _LANE)
    sph = np.full((8, ns_pad), 1e30, np.float32)
    sph[3:] = 0.0
    if ns:
        c = np.asarray(scene.sphere_center, np.float32)
        sph[0, :ns] = c[:, 0]
        sph[1, :ns] = c[:, 1]
        sph[2, :ns] = c[:, 2]
        sph[3, :ns] = np.asarray(scene.sphere_radius, np.float32)
    tri = np.zeros((16, nt_pad), np.float32)
    if nt:
        for row, (arr, k) in enumerate(
                (np.asarray(getattr(scene, f"tri_v{i}"), np.float32), j)
                for i in range(3) for j in range(3)):
            tri[row, :nt] = arr[:, k]
    return PallasScenePack(
        spheres=jnp.asarray(sph), tris=jnp.asarray(tri),
        sphere_rows=ns, tri_rows=nt)


def _intersect_kernel(o_ref, d_ref, sph_ref, tri_ref, t_ref, prim_ref, *,
                      t_min, ns, nt, ns_pad, nt_pad):
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]

    t_best = jnp.full(ox.shape, _BIG, jnp.float32)
    prim_best = jnp.zeros(ox.shape, jnp.int32)

    if ns:
        cx = sph_ref[0, :][:, None]   # (Ns_pad, 1)
        cy = sph_ref[1, :][:, None]
        cz = sph_ref[2, :][:, None]
        r = sph_ref[3, :][:, None]
        # oc-form quadratic, broadcast (Ns_pad, TILE_R).
        ocx = ox[None, :] - cx
        ocy = oy[None, :] - cy
        ocz = oz[None, :] - cz
        b = ocx * dx[None, :] + ocy * dy[None, :] + ocz * dz[None, :]
        c_coef = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - c_coef
        has_root = disc > 0
        sq = jnp.sqrt(jnp.where(has_root, disc, 0.0))
        t_near = -b - sq
        t_far = -b + sq
        near_ok = has_root & (t_near > t_min) & (t_near < _BIG)
        far_ok = has_root & (t_far > t_min) & (t_far < _BIG)
        t_s = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, _BIG))
        t_best = jnp.min(t_s, axis=0)
        prim_best = jnp.argmin(t_s, axis=0).astype(jnp.int32)

    if nt:
        v = [tri_ref[row, :][:, None] for row in range(9)]
        e1x, e1y, e1z = v[3] - v[0], v[4] - v[1], v[5] - v[2]
        e2x, e2y, e2z = v[6] - v[0], v[7] - v[1], v[8] - v[2]
        dxb, dyb, dzb = dx[None, :], dy[None, :], dz[None, :]
        px = dyb * e2z - dzb * e2y
        py = dzb * e2x - dxb * e2z
        pz = dxb * e2y - dyb * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > 1e-9
        inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tx = ox[None, :] - v[0]
        ty = oy[None, :] - v[1]
        tz = oz[None, :] - v[2]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vv = (dxb * qx + dyb * qy + dzb * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (ok & (u >= 0.0) & (vv >= 0.0) & (u + vv <= 1.0)
               & (tt > t_min) & (tt < _BIG))
        t_t = jnp.where(hit, tt, _BIG)
        t_tri = jnp.min(t_t, axis=0)
        p_tri = jnp.argmin(t_t, axis=0).astype(jnp.int32) + ns
        better = t_tri < t_best
        t_best = jnp.where(better, t_tri, t_best)
        prim_best = jnp.where(better, p_tri, prim_best)

    t_ref[0, :] = t_best
    prim_ref[0, :] = prim_best


@functools.partial(jax.jit,
                   static_argnames=("ns", "nt", "t_min", "interpret"))
def _intersect_call(o_t, d_t, sph, tri, ns, nt, t_min, interpret=False):
    r_pad = o_t.shape[1]
    ns_pad = sph.shape[1]
    nt_pad = tri.shape[1]
    grid = (r_pad // TILE_R,)
    kernel = functools.partial(
        _intersect_kernel, t_min=t_min, ns=ns, nt=nt,
        ns_pad=ns_pad, nt_pad=nt_pad)
    t, prim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ns_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, nt_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ),
        interpret=interpret,
    )(o_t, d_t, sph, tri)
    return t[0], prim[0]


def intersect_pallas(scene, accel, origin, direction, t_min,
                     interpret: bool = False):
    """Drop-in ``intersect_fn`` for the integrator (accel: PallasScenePack).

    Returns (prim, t, hit) like ``intersect_brute``/``intersect_bvh``.
    """
    pack = accel
    r = origin.shape[0]
    r_pad = max(_round_up(r, TILE_R), TILE_R)
    o_t = jnp.zeros((3, r_pad), jnp.float32).at[:, :r].set(origin.T)
    # Padded rays get direction 0 -> b = 0, disc <= -c_coef < 0 for real
    # spheres -> miss; harmless.
    d_t = jnp.zeros((3, r_pad), jnp.float32).at[:, :r].set(direction.T)
    t, prim = _intersect_call(
        o_t, d_t, pack.spheres, pack.tris, pack.sphere_rows, pack.tri_rows,
        float(t_min), interpret)
    t = t[:r]
    prim = prim[:r]
    return prim, t, t < BIG
