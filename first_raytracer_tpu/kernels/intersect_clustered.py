"""Pallas TPU kernel: two-level BVH-clustered closest hit.

The device-side acceleration-structure story (SURVEY.md §3.3/§7 step 4a;
the north-star's "stackless BVH walk over an SoA primitive buffer"): the
reference descends a pointer tree per ray [E: bvh.h bvh_node::hit]; a
per-ray pointer chase is the worst possible TPU program (scalar, divergent,
gather-bound).  The TPU-native re-architecture is a *two-level* scheme:

- **Top level (device, culled):** the host SAH build's leaves become K
  clusters — contiguous runs of the permuted primitive array, each with an
  AABB.  Clusters stream through the *grid* in blocks of ``C_BLK`` (the
  inner, sequential grid dimension; the (t, gid) output block for a ray
  tile is revisited across cluster steps — the standard TPU accumulator
  pattern).  Inside a step the ``C_BLK`` clusters are statically unrolled;
  per ray *tile*, one slab test against each cluster box (bounded above by
  the tile's current best t) decides — via ``pl.when`` — whether that
  cluster's slots are swept at all.  Divergence is tile-granular, which is
  exactly the granularity TPU control flow is free at; the per-*ray*
  early-out the reference gets from its tree is recovered by shrinking the
  slab interval as hits accumulate.  (All indices are static within a
  step: Mosaic has no leading-dim dynamic VMEM slice, which rules out the
  resident-array + ``fori_loop`` formulation.)
- **Bottom level (dense):** a hit cluster is swept exactly like the dense
  kernel (``intersect_pallas``) — a (P=128 slots x TILE_R rays) f32
  distance block on the VPU, sphere oc-form / Möller-Trumbore, identical
  formulas to geometry/{sphere,triangle}.py so per-(ray, prim) t's are
  bit-comparable with every other intersector.

Winner selection is the lexicographic min of (t, global id): within a
cluster, a sublane min over t then an equality-match min over the gid row;
across clusters, a strict-< fold with a gid tie-break.  This equals the
brute-force argmin convention (lowest global id among the min-t set), so
results are interchangeable with intersect_brute/intersect_pallas up to
ulp-level FMA-contraction noise in t itself.

Global ids travel as an f32 row of the geometry block (exact for ids
< 2^24 — asserted at pack time), so no cross-lane integer gather is ever
needed: slot->gid resolution is a masked min, not a permute.

Capacity: only one ``C_BLK``-cluster block lives in VMEM at a time, so
scene size is bounded by HBM, not VMEM; the (soft) pack budget just guards
against pathological cluster counts.
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

_BIG = 1e30          # python mirror (pallas_call rejects captured jnp scalars)
_LANE = 128          # cluster slot capacity = one lane register
TILE_R = 512         # rays per grid step
C_BLK = 16           # clusters per grid step (statically unrolled)

__all__ = ["intersect_clustered", "pack_scene_clustered",
           "ClusteredScenePack"]


def _round_up(x, m):
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class ClusteredScenePack:
    """BVH-leaf-clustered scene SoA (resident in VMEM during the sweep)."""

    sph: jax.Array       # (Ks*8, 128) f32: per cluster cx cy cz r gid pad*3
    tri: jax.Array       # (Kt*16, 128) f32: v0 v1 v2 coords (9 rows) + gid
    sph_box: jax.Array   # (Ks, 8) f32 SMEM: mnx mny mnz mxx mxy mxz pad pad
    tri_box: jax.Array   # (Kt, 8) f32
    sph_clusters: int    # static true Ks (arrays are padded up)
    tri_clusters: int


jax.tree_util.register_dataclass(
    ClusteredScenePack,
    data_fields=("sph", "tri", "sph_box", "tri_box"),
    meta_fields=("sph_clusters", "tri_clusters"))


def _cluster_type(bmin, bmax, gids, max_leaf):
    """SAH-cluster one primitive type; returns (boxes (K,8), slot ids list).

    Reuses the flat-BVH builder: its preorder leaves ARE the clusters
    (contiguous SAH-partitioned runs), so cluster quality == leaf quality.
    """
    # Same sweep-SAH recursion as accel/build.py, applied to one primitive
    # type (the kernel keeps types in separate slot planes, so clusters
    # must be type-pure — a Scene-level FlatBVH's leaves are not).
    n = bmin.shape[0]
    clusters = []

    centroid = 0.5 * (bmin + bmax)

    def area(mn, mx):
        e = np.maximum(mx - mn, 0.0)
        return e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0]

    def split_sah(order, axis):
        k = len(order)
        lmn = np.minimum.accumulate(bmin[order], axis=0)
        lmx = np.maximum.accumulate(bmax[order], axis=0)
        rmn = np.minimum.accumulate(bmin[order][::-1], axis=0)[::-1]
        rmx = np.maximum.accumulate(bmax[order][::-1], axis=0)[::-1]
        i = np.arange(1, k)
        cost = area(lmn, lmx)[:-1] * i + area(rmn, rmx)[1:] * (k - i)
        return int(np.argmin(cost)) + 1

    def rec(ids):
        if len(ids) <= max_leaf:
            clusters.append(ids)
            return
        ext = centroid[ids].max(axis=0) - centroid[ids].min(axis=0)
        axis = int(np.argmax(ext))
        order = ids[np.argsort(centroid[ids, axis], kind="stable")]
        s = min(max(split_sah(order, axis), 1), len(order) - 1)
        rec(order[:s])
        rec(order[s:])

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * n + 64))
    try:
        rec(np.arange(n, dtype=np.int64))
    finally:
        sys.setrecursionlimit(old)

    boxes = np.zeros((len(clusters), 8), np.float32)
    for k, ids in enumerate(clusters):
        boxes[k, 0:3] = bmin[ids].min(axis=0)
        boxes[k, 3:6] = bmax[ids].max(axis=0)
    return boxes, [gids[ids] for ids in clusters]


def pack_scene_clustered(scene, max_leaf: int = _LANE,
                         vmem_budget_bytes: int = 8 << 20
                         ) -> ClusteredScenePack:
    """Host-side clustering + repack (runs once per scene, like the BVH).

    max_leaf <= 128 (one cluster = one lane register of slots).
    """
    if not 0 < max_leaf <= _LANE:
        raise ValueError(f"max_leaf must be in (0, {_LANE}]")
    from ..geometry.aabb import sphere_aabb_np, triangle_aabb_np

    scene_np = scene.as_numpy()
    ns, nt = scene.num_spheres, scene.num_triangles
    if ns + nt >= 1 << 24:
        raise ValueError("global ids must stay exact in f32 (< 2^24)")

    def pack_type(boxes, cluster_gids, rows, fill):
        # 2D plane-major layout (cluster-k's plane r is row k*rows + r):
        # Mosaic happily lowers static-row reads of a 2D VMEM ref, while
        # 3D blocks + reshape lower as (rejected) gathers.
        k = len(cluster_gids)
        k_pad = max(_round_up(k, C_BLK), C_BLK)
        geo = np.full((k_pad * rows, _LANE), 0.0, np.float32)
        box = np.zeros((k_pad, 8), np.float32)
        box[:, 0:3] = _BIG          # padded clusters: inverted box, no hit
        box[:, 3:6] = -_BIG
        box[:k] = boxes
        for kk, gids in enumerate(cluster_gids):
            fill(geo[kk * rows:(kk + 1) * rows], gids)
        return geo, box, k

    def _inverted_boxes(k):
        box = np.zeros((k, 8), np.float32)
        box[:, 0:3] = _BIG          # inverted box: slab test never passes
        box[:, 3:6] = -_BIG
        return box

    sph = np.zeros((C_BLK * 8, _LANE), np.float32)
    sph_box = _inverted_boxes(C_BLK)
    ks = 0
    if ns:
        bmin, bmax = sphere_aabb_np(scene_np.sphere_center,
                                    scene_np.sphere_radius)
        boxes, cl = _cluster_type(bmin, bmax, np.arange(ns), max_leaf)

        def fill_s(blk, gids):
            # sentinel: centre at 1e30, radius 0 -> disc < 0 -> miss
            blk[0, :] = _BIG
            m = len(gids)
            c = scene_np.sphere_center[gids]
            blk[0, :m] = c[:, 0]
            blk[1, :m] = c[:, 1]
            blk[2, :m] = c[:, 2]
            blk[3, :m] = scene_np.sphere_radius[gids]
            blk[4, :m] = gids.astype(np.float32)

        sph, sph_box, ks = pack_type(boxes, cl, 8, fill_s)

    tri = np.zeros((C_BLK * 16, _LANE), np.float32)
    tri_box = _inverted_boxes(C_BLK)
    kt = 0
    if nt:
        bmin, bmax = triangle_aabb_np(scene_np.tri_v0, scene_np.tri_v1,
                                      scene_np.tri_v2)
        boxes, cl = _cluster_type(bmin, bmax, np.arange(nt), max_leaf)

        def fill_t(blk, gids):
            # sentinel: zero triangle -> zero determinant -> miss
            m = len(gids)
            for row, (arr, j) in enumerate(
                    (getattr(scene_np, f"tri_v{i}"), j)
                    for i in range(3) for j in range(3)):
                blk[row, :m] = arr[gids, j]
            blk[9, :m] = (gids + ns).astype(np.float32)

        tri, tri_box, kt = pack_type(boxes, cl, 16, fill_t)

    vmem = sph.nbytes + tri.nbytes
    if vmem > vmem_budget_bytes:
        raise ValueError(
            f"clustered scene needs {vmem / 2**20:.1f} MiB VMEM "
            f"(> {vmem_budget_bytes / 2**20:.0f} MiB budget); use the "
            "dense sweep or a streaming variant for scenes this large")

    return ClusteredScenePack(
        sph=jnp.asarray(sph), tri=jnp.asarray(tri),
        sph_box=jnp.asarray(sph_box), tri_box=jnp.asarray(tri_box),
        sph_clusters=ks, tri_clusters=kt)


def _box_gate(box_ref, k, ox, oy, oz, ix, iy, iz, t_min, t_cur):
    """(scalar cluster box k) x (ray tile) slab test -> (any_hit, mask).

    Same min/max slab form as geometry/aabb.py aabb_hit, with the upper
    bound per ray = its current best t (the device-side analog of the
    reference's shrinking ``closest_so_far``).
    """
    mnx, mny, mnz = box_ref[k, 0], box_ref[k, 1], box_ref[k, 2]
    mxx, mxy, mxz = box_ref[k, 3], box_ref[k, 4], box_ref[k, 5]
    t0x, t1x = (mnx - ox) * ix, (mxx - ox) * ix
    t0y, t1y = (mny - oy) * iy, (mxy - oy) * iy
    t0z, t1z = (mnz - oz) * iz, (mxz - oz) * iz
    near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                  jnp.maximum(t0y, t1y)),
                      jnp.maximum(t0z, t1z))
    ok = jnp.maximum(near, t_min) <= jnp.minimum(far, t_cur)
    return jnp.any(ok)


def _fold(t_ref, gid_ref, t_cl, gid_cl):
    """Lexicographic (t, gid) fold of one cluster's winners into the tile
    accumulators (gid rides as f32; exact < 2^24)."""
    t_cur = t_ref[0, :]
    g_cur = gid_ref[0, :]
    better = (t_cl < t_cur) | ((t_cl == t_cur) & (t_cl < _BIG)
                               & (gid_cl < g_cur))
    t_ref[0, :] = jnp.where(better, t_cl, t_cur)
    gid_ref[0, :] = jnp.where(better, gid_cl, g_cur)


def _ray_tile(o_ref, d_ref):
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    # IEEE: 1/0 = inf; the min/max slab form absorbs it (aabb.py note).
    return ox, oy, oz, dx, dy, dz, 1.0 / dx, 1.0 / dy, 1.0 / dz


def _sphere_pass_kernel(o_ref, d_ref, sbox_ref, sph_ref, t_ref, gid_ref,
                        *, t_min):
    ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_tile(o_ref, d_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        t_ref[0, :] = jnp.full(ox.shape, _BIG, jnp.float32)
        gid_ref[0, :] = jnp.full(ox.shape, _BIG, jnp.float32)

    for k in range(C_BLK):          # static unroll within the block
        hit_any = _box_gate(sbox_ref, k, ox, oy, oz, ix, iy, iz,
                            t_min, t_ref[0, :])

        @pl.when(hit_any)
        def _(k=k):
            # static 2D row reads (the proven intersect_pallas idiom);
            # anything fancier (3D blocks, reshapes) lowers as a Mosaic
            # gather and is rejected.
            row = lambda r_: sph_ref[8 * k + r_, :][:, None]   # noqa: E731
            cx, cy, cz = row(0), row(1), row(2)
            r, gid = row(3), row(4)
            ocx = ox[None, :] - cx
            ocy = oy[None, :] - cy
            ocz = oz[None, :] - cz
            b = ocx * dx[None, :] + ocy * dy[None, :] + ocz * dz[None, :]
            c_coef = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b * b - c_coef
            has_root = disc > 0
            sq = jnp.sqrt(jnp.where(has_root, disc, 0.0))
            t_near, t_far = -b - sq, -b + sq
            near_ok = has_root & (t_near > t_min) & (t_near < _BIG)
            far_ok = has_root & (t_far > t_min) & (t_far < _BIG)
            t_s = jnp.where(near_ok, t_near,
                            jnp.where(far_ok, t_far, _BIG))   # (128, R)
            t_cl = jnp.min(t_s, axis=0)
            gid_cl = jnp.min(jnp.where(t_s == t_cl[None, :],
                                       jnp.broadcast_to(gid, t_s.shape),
                                       _BIG), axis=0)
            _fold(t_ref, gid_ref, t_cl, gid_cl)


def _tri_pass_kernel(o_ref, d_ref, tbox_ref, t_in_ref, gid_in_ref,
                     tri_ref, t_ref, gid_ref, *, t_min):
    ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_tile(o_ref, d_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        # seed from the sphere pass (or _BIG fills when there were none)
        t_ref[0, :] = t_in_ref[0, :]
        gid_ref[0, :] = gid_in_ref[0, :]

    for k in range(C_BLK):
        hit_any = _box_gate(tbox_ref, k, ox, oy, oz, ix, iy, iz,
                            t_min, t_ref[0, :])

        @pl.when(hit_any)
        def _(k=k):
            v = [tri_ref[16 * k + row, :][:, None] for row in range(9)]
            gid = tri_ref[16 * k + 9, :][:, None]
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
            t_cl = jnp.min(t_t, axis=0)
            gid_cl = jnp.min(jnp.where(t_t == t_cl[None, :],
                                       jnp.broadcast_to(gid, t_t.shape),
                                       _BIG), axis=0)
            _fold(t_ref, gid_ref, t_cl, gid_cl)


def _pass_call(kernel, o_t, d_t, box, geo, seeds, rows, interpret):
    """One geometry-type pass: grid = (ray tiles, cluster blocks).

    Cluster blocks are the INNER (sequential) grid dim, so the (1, TILE_R)
    output block for a ray tile stays resident while every cluster block
    streams past it — the standard TPU accumulator pattern.  All in-kernel
    cluster indices are static (k < C_BLK); the dynamic position comes
    entirely from the BlockSpec index maps.
    """
    r_pad = o_t.shape[1]
    grid = (r_pad // TILE_R, box.shape[0] // C_BLK)
    ray_spec = pl.BlockSpec((3, TILE_R), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, TILE_R), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec, ray_spec,
                  pl.BlockSpec((C_BLK, 8), lambda i, j: (j, 0),
                               memory_space=pltpu.SMEM)]
                 + [acc_spec] * len(seeds)
                 + [pl.BlockSpec((C_BLK * rows, _LANE),
                                 lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM)],
        out_specs=(acc_spec, acc_spec),
        out_shape=(jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, r_pad), jnp.float32)),
        interpret=interpret,
    )(o_t, d_t, box, *seeds, geo)


@functools.partial(jax.jit,
                   static_argnames=("ks", "kt", "t_min", "interpret"))
def _clustered_call(o_t, d_t, sph, tri, sbox, tbox, ks, kt, t_min,
                    interpret=False):
    r_pad = o_t.shape[1]
    t = gid = None
    if ks:
        t, gid = _pass_call(
            functools.partial(_sphere_pass_kernel, t_min=t_min),
            o_t, d_t, sbox, sph, (), 8, interpret)
    if kt:
        if t is None:
            t = jnp.full((1, r_pad), _BIG, jnp.float32)
            gid = jnp.full((1, r_pad), _BIG, jnp.float32)
        t, gid = _pass_call(
            functools.partial(_tri_pass_kernel, t_min=t_min),
            o_t, d_t, tbox, tri, (t, gid), 16, interpret)
    if t is None:               # empty scene: vacuous miss
        t = jnp.full((1, r_pad), _BIG, jnp.float32)
        gid = jnp.full((1, r_pad), _BIG, jnp.float32)
    return t[0], gid[0]


def intersect_clustered(scene, accel, origin, direction, t_min,
                        interpret: bool = False):
    """Drop-in ``intersect_fn`` (accel: ClusteredScenePack).

    Returns (prim, t, hit) with the intersect_brute/intersect_pallas
    contract; prim is the lexicographic-(t, gid) winner.
    """
    pack = accel
    r = origin.shape[0]
    r_pad = max(_round_up(r, TILE_R), TILE_R)
    # Padded rays: far-away origin with a finite direction -> every slab
    # interval is entirely negative -> no cluster gate ever fires for them
    # (d = 0 would make the slab test vacuously true via inf arithmetic).
    o_t = jnp.full((3, r_pad), _BIG, jnp.float32).at[:, :r].set(origin.T)
    d_t = jnp.ones((3, r_pad), jnp.float32).at[:, :r].set(direction.T)
    t, gid = _clustered_call(
        o_t, d_t, pack.sph, pack.tri, pack.sph_box, pack.tri_box,
        pack.sph_clusters, pack.tri_clusters, float(t_min), interpret)
    t = t[:r]
    hit = t < BIG
    prim = jnp.where(hit, gid[:r], 0.0).astype(jnp.int32)
    return prim, t, hit
