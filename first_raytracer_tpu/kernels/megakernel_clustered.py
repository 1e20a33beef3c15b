"""Pallas TPU clustered megakernel: the whole tracer, culling large scenes.

The dense megakernel (kernels/megakernel.py) sweeps EVERY padded sphere per
bounce iteration — at ~500 primitives that is the fastest thing this
machine can do (ROADMAP.md cost model), but the sweep scales linearly with
scene size: at 20k primitives it would be ~40x slower, and the only large-
scene path was the ~13x-slower XLA wavefront loop over the clustered
intersector (VERDICT r3 item 4).  This kernel keeps the megakernel's
persistent-lane design and adds the two-level culling of
``intersect_clustered`` *inside* the bounce loop:

- **Clusters**: the host SAH-partitions the spheres into contiguous runs
  of <=128 slots (one lane register) with AABBs, optionally sorted
  front-to-back from the camera so each ray's shrinking best-t kills far
  clusters early.  Sphere columns are laid out cluster-major, so a
  cluster's geometry is a static 128-column slice of the resident VMEM
  tables — Mosaic-friendly, no dynamic leading-dim slicing.
- **Tile-granular gates**: per bounce iteration each cluster's box is
  slab-tested against the whole 512-lane ray tile, bounded above by each
  lane's current best t; ``pl.when(any lane passes)`` decides whether the
  cluster's 128 slots are swept at all.  Divergence is tile-granular —
  the only granularity TPU control flow is free at — so lanes should be
  COHERENT.  The shipped default mapping is ``band`` (each tile owns a
  contiguous block of ``k_pix*tile`` pixels): the r4 measurement campaign
  (FIELDBENCH_r4.json) showed occupancy dominates once tile-granular
  culling saturates under isotropic bounce directions, and band at
  k_pix=96 beat both the image-wide ``stride`` mapping and the 2D
  ``rect`` (tile_w x tile_h rectangle) mapping on every field scene.
  ``rect``/``stride`` remain selectable (``mapping=``) for regimes where
  their trade wins.
- **Worklist gates** (``gate_mode="wl"``, r5, DEFAULT): the end-of-r5
  probes (tools/worklist_probe.py) overturned two assumptions at once —
  dynamic 128-aligned VMEM slices work on BOTH dims, and the statically
  unrolled per-cluster bodies cost 12-18x more than a single dynamic
  body.  So sphere gating is now data-driven: batched slab intervals
  for ALL supergroups at once, gate bits extracted to scalar words
  (exact f32 half-word sums), ctz set-bit iteration over a two-round
  schedule (round A: supers whose slab entry lies within a static
  near-cap of the origins, tightening best-t; round B: the remainder
  re-gated against the tightened t), each fired super sweeping its
  children through ONE dynamic-offset sweep body.  Bit-exact vs slab;
  field20000 3.21 vs hier's 1.53 Mpaths/s, no small-scene regression
  (FIELDBENCH_r5.json wl rows).
- **Hierarchical gates** (``gate_mode="hier"``, r5): the r5 sweep
  counter overturned the r4 story — slab gates already fire (only
  8-22% of clusters are swept per iteration on the field scenes); what
  costs is the PER-SITE overhead: ~0.3 us per gate site plus ~1.1 us
  fixed per sweep invocation (reduction pair + one-hot + extraction
  matmul), regardless of predicate or sweep arithmetic
  (FIELDBENCH_r5.json fit; ROADMAP.md "r5 resolution").  ``hier``
  therefore SAH-groups <=8 clusters spatially under ONE slab gate and
  sweeps a fired group as ONE fused (G*128, T) sweep — ~8x fewer gate
  sites and ~8x fewer per-sweep fixed costs.
- **Adjacency gates** (``gate_mode="adj"``, r5, kept as a measured
  negative result): a uniform hit-point cell grid + static
  cell->cluster adjacency table drive phase-1 sweeps, with exact slab
  gates as phase 2.  Correct (bit-matches slab) but REGRESSES 1.5-2x on
  the field scenes: its 256 extra scalar gate sites cost more than the
  sweeps it reorders, per the same per-site economics above.
- **Exact selection**: per swept cluster the winner is the exact
  (min t, min slot) — no packed-mantissa truncation — folded across
  clusters; the winner's 16 payload rows (geometry + material, material
  *type* carried as table rows since SAH order destroys the dense pack's
  group-sort) are extracted with a (16,128)x(128,T) one-hot MXU matmul
  under the same ``pl.when``, so extraction cost also scales with
  clusters actually hit.
- Everything else — in-kernel Threefry RNG, camera rays, branch-free
  3-way scatter, sky, pixel-boundary flush, in-lane sample regeneration —
  is the megakernel's, same RNG stream, same radiance semantics.

Triangles keep the dense megakernel treatment (group-sorted table, packed
selection + winner-t replay): every large-scene workload here is sphere-
heavy and the dense tri sweep is already exact about its budget.

Reference lineage: this is ``bvh_node::hit`` [E: bvh.h] (SURVEY.md §3.3)
re-architected for a vector machine — the per-ray pointer chase becomes
per-tile cluster gates over a flat SoA, the reference's shrinking
``closest_so_far`` becomes the per-lane best-t bound on the slab test.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_clustered import _cluster_type
from .megakernel import (_BIG, _TRI_ROWS, TILE, _bits_to_unit, _cam_smem,
                         _cbrt, _recip, _threefry2x32, _unit3)

__all__ = ["pack_scene_mega_clustered", "MegaClusteredPack",
           "ClusterLayout",
           "render_pixels_mega_clustered", "render_image_mega_clustered",
           "render_image_mega_clustered_sharded"]

_LANE = 128           # cluster slot capacity
_SPH_ROWS = 16
# Sphere payload rows (cluster-major columns):
#   0-2 center, 3 radius, 4 param (fuzz|ref_idx), 5-7 albedo,
#   8-10 albedo2, 11 tex_scale, 12 ORIGINAL scene index (emit_tape;
#   the sweep reads c0 from the mx table, so this payload slot is free),
#   13 mat type (0/1/2), 14 tex type (0/1), 15 1/radius (0 sentinel).
PIX_PER_LANE = 96     # pixels per lane — same as the dense kernel.  The
                      # r4 mapping/gating campaign (FIELDBENCH_r4.json)
                      # showed tile-granular culling saturates under
                      # isotropic bounce directions, so occupancy wins:
                      # band mapping at K=96 measured 11.8 vs 9.8 Mrays/s
                      # (K=32) on sphere_field(5000), occupancy 0.77 vs
                      # 0.61.


def _round_up(x, m):
    return (x + m - 1) // m * m


# Shared dummy adjacency block for non-"adj" gate modes (the kernel only
# dereferences adj_ref under gate_mode == "adj").
_DUMMY_ADJ = None  # created lazily (jnp at import time would init a backend)


def _dummy_adj():
    global _DUMMY_ADJ
    if _DUMMY_ADJ is None:
        globals()["_DUMMY_ADJ"] = jnp.zeros((8, _LANE), jnp.float32)
    return _DUMMY_ADJ


@dataclasses.dataclass(frozen=True)
class MegaClusteredPack:
    """Host-packed clustered scene for the clustered megakernel."""

    sph: jax.Array       # (16, KC*128) f32 payload, cluster-major columns
    sph_mx: jax.Array    # (KC*128, 8) f32 column table: cx cy cz c0
    boxes: jax.Array     # (KC, 8) f32 SMEM: mnx mny mnz mxx mxy mxz pad
    tris: jax.Array      # (24, Nt_pad) f32 — dense megakernel layout
    sphere_rows: int     # true Ns
    tri_rows: int
    clusters: int        # KC (true, unpadded — table is exactly KC*128)
    tri_groups: tuple
    has_checker: bool
    # Phase-1 margin (scene units): clusters whose box overlaps the
    # tile's ray-origin box inflated by this are swept FIRST each
    # iteration (scalar-cheap test), tightening every lane's best t
    # before the per-lane slab gates run on the rest.  Default: half the
    # median cluster extent.
    phase1_margin: float = 0.0
    # gate_mode="adj" (r5): uniform cell grid over robust scene bounds +
    # static cell->cluster adjacency.  ``adj`` is (C_pad, KC_pad) f32
    # (1.0 where the margin-inflated cell box overlaps the cluster box);
    # grid_* are static tuples the kernel folds in as constants.
    adj: jax.Array = None          # (C_pad, KC_pad) f32
    grid_lo: tuple = (0.0, 0.0, 0.0)
    grid_inv: tuple = (1.0, 1.0, 1.0)   # 1 / cell size per axis
    grid_dims: tuple = (1, 1, 1)
    # gate_mode="hier" (r5): spatial supergroups of <=8 clusters, one
    # slab gate per supergroup (the measured per-cluster gate overhead
    # of ~0.42 us/iteration dominates large scenes).
    super_boxes: jax.Array = None  # (KS, 8) f32 SMEM
    super_spans: tuple = ((0, 1),)  # (start, end) cluster spans per super
    # Triangle clusters (r5): same two-level scheme as spheres.
    tri_boxes: jax.Array = None        # (KT, 8) f32 SMEM
    tri_super_boxes: jax.Array = None  # (KTS, 8) f32 SMEM
    tri_clusters: int = 1
    tri_super_spans: tuple = ((0, 1),)


jax.tree_util.register_dataclass(
    MegaClusteredPack,
    data_fields=("sph", "sph_mx", "boxes", "tris", "adj", "super_boxes",
                 "tri_boxes", "tri_super_boxes"),
    meta_fields=("sphere_rows", "tri_rows", "clusters", "tri_groups",
                 "has_checker", "phase1_margin", "grid_lo", "grid_inv",
                 "grid_dims", "super_spans", "tri_clusters",
                 "tri_super_spans"))


def _build_cell_grid(bmin_all, bmax_all, boxes_np, target_cells=256,
                     max_per_axis=16, adj_scale=0.5):
    """Uniform cell grid + cell->cluster adjacency (host, once per scene).

    Bounds come from per-axis PERCENTILES of the primitive AABBs so one
    huge outlier (the r=1000 ground sphere) cannot stretch the grid over
    dead space; hit points outside the grid clamp to the boundary cells,
    whose adjacency covers the boundary clusters (phase 2's exact slab
    gates make out-of-grid gating a performance matter only).  A cell is
    adjacent to a cluster when the cell box, inflated by ``adj_scale`` x
    the median cluster extent (the expected "next hit is nearby" radius),
    overlaps the cluster's AABB.
    """
    lo = np.percentile(bmin_all, 2, axis=0).astype(np.float64)
    hi = np.percentile(bmax_all, 98, axis=0).astype(np.float64)
    hi = np.maximum(hi, lo + 1e-3)
    ext = hi - lo
    active = ext > 1e-6
    cell = float(np.prod(ext[active]) / target_cells) ** (
        1.0 / max(int(active.sum()), 1))
    dims = np.clip(np.ceil(ext / max(cell, 1e-9)).astype(np.int64), 1,
                   max_per_axis)
    while int(np.prod(dims)) > 2 * target_cells:
        dims[int(np.argmax(dims))] -= 1
    gx, gy, gz = (int(d) for d in dims)
    csz = ext / dims
    inv = np.where(csz > 1e-12, 1.0 / np.where(csz > 1e-12, csz, 1.0), 0.0)

    adj = _cell_adj(tuple(lo), tuple(inv), (gx, gy, gz), boxes_np,
                    adj_scale)
    return (adj, tuple(float(x) for x in lo),
            tuple(float(x) for x in inv), (gx, gy, gz))


def _cell_adj(grid_lo, grid_inv, grid_dims, boxes_np, adj_scale=0.5):
    """(cells_pad, clusters_pad) overlap table for a FIXED cell grid —
    also used by layout-reusing repacks (grid frozen, boxes current)."""
    lo = np.asarray(grid_lo, np.float64)
    inv = np.asarray(grid_inv, np.float64)
    gx, gy, gz = grid_dims
    csz = np.where(inv > 0, 1.0 / np.where(inv > 0, inv, 1.0), 0.0)
    cext = (boxes_np[:, 3:6] - boxes_np[:, 0:3]).max(axis=1)
    m = (float(np.median(cext[cext > 0]) * adj_scale)
         if (cext > 0).any() else 0.0)
    ix, iy, iz = np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz),
                             indexing="ij")
    idx = np.stack([ix, iy, iz], axis=-1).reshape(-1, 3)  # cell-major
    cell_lo = lo[None, :] + idx * csz[None, :] - m
    cell_hi = lo[None, :] + (idx + 1) * csz[None, :] + m
    kc = boxes_np.shape[0]
    ov = ((cell_lo[:, None, :] <= boxes_np[None, :, 3:6])
          & (cell_hi[:, None, :] >= boxes_np[None, :, 0:3])).all(axis=2)
    c_pad = -(-(gx * gy * gz) // 8) * 8
    kc_pad = -(-kc // _LANE) * _LANE
    adj = np.zeros((c_pad, kc_pad), np.float32)
    adj[:gx * gy * gz, :kc] = ov.astype(np.float32)
    return adj


@dataclasses.dataclass(frozen=True)
class ClusterLayout:
    """Frozen clustering DECISIONS, for repack-without-retrace.

    ``make_fit_step_replay`` repacks the scene every optimizer step; the
    pack's geometry-derived jit STATICS (cluster count, supergroup
    spans, grid scalars, phase-1 margin) would otherwise change with
    every parameter nudge and force a full Mosaic recompile per step
    (r5 review finding).  A layout captured at step 0 freezes the
    memberships and scalars; cluster/super BOXES and payload tables are
    recomputed from the CURRENT geometry on every repack, so gating
    stays conservative/correct as parameters move — only cluster
    *quality* drifts with large geometry changes.
    """
    sph_slots: tuple          # tuple of int tuples (cluster memberships)
    super_spans: tuple
    tri_slots: tuple
    tri_super_spans: tuple
    grid_lo: tuple
    grid_inv: tuple
    grid_dims: tuple
    phase1_margin: float


def _group_clusters(boxes, slot_ids, sort_from, fan_out=8):
    """Spatial supergroups of <=``fan_out`` clusters (gate_mode="hier").

    Returns (slot_ids, spans) with clusters reordered supergroup-major:
    supers sorted front-to-back from ``sort_from``, children keeping
    their camera order.  Small cluster counts stay singleton spans.
    """
    kc = len(slot_ids)
    spans = tuple((k, k + 1) for k in range(kc))
    if kc <= 16:
        return slot_ids, spans
    sb, sgroups = _cluster_type(boxes[:, 0:3].astype(np.float64),
                                boxes[:, 3:6].astype(np.float64),
                                np.arange(kc), fan_out)
    sgroups = [np.sort(g) for g in sgroups]  # keep camera order
    if sort_from is not None:
        scn = 0.5 * (sb[:, 0:3] + sb[:, 3:6])
        sd2 = ((scn - np.asarray(sort_from, np.float32)) ** 2).sum(1)
        sorder = np.argsort(sd2, kind="stable")
        sgroups = [sgroups[i] for i in sorder]
    slot_ids = [slot_ids[i] for i in np.concatenate(sgroups)]
    spans, off = [], 0
    for g in sgroups:
        spans.append((off, off + len(g)))
        off += len(g)
    return slot_ids, tuple(spans)


def _member_boxes(bmin, bmax, slot_ids):
    """Per-cluster AABBs from current member geometry."""
    boxes = np.zeros((len(slot_ids), 8), np.float32)
    for k, gids in enumerate(slot_ids):
        boxes[k, 0:3] = bmin[gids].min(axis=0)
        boxes[k, 3:6] = bmax[gids].max(axis=0)
    return boxes


def _span_boxes(boxes, spans):
    """Supergroup AABBs = union of each span's cluster boxes."""
    sb = np.zeros((len(spans), 8), np.float32)
    for i, (a, b) in enumerate(spans):
        sb[i, 0:3] = boxes[a:b, 0:3].min(axis=0)
        sb[i, 3:6] = boxes[a:b, 3:6].max(axis=0)
    return sb


def pack_scene_mega_clustered(scene, max_leaf: int = _LANE,
                              sort_from=None, layout: ClusterLayout = None,
                              return_layout: bool = False,
                              super_fanout: int = 8):
    """SAH-cluster + repack (host, once per scene).

    ``sort_from`` (3-vector, typically the camera origin): clusters are
    ordered by box-center distance so the in-kernel fold visits near
    clusters first and the best-t bound prunes far ones — the flat-array
    analog of the reference BVH's near-child-first descent.

    ``layout`` (from a previous ``return_layout=True`` call on the same
    scene topology) reuses the frozen clustering decisions so every
    jit-static pack attribute is bit-identical across repacks — the
    per-step repack in ``make_fit_step_replay`` then never retraces.
    """
    from ..geometry.aabb import sphere_aabb_np

    s = scene.as_numpy() if hasattr(scene, "as_numpy") else scene
    ns, nt = s.sphere_center.shape[0], s.tri_v0.shape[0]
    if not 0 < max_leaf <= _LANE:
        raise ValueError(f"max_leaf must be in (0, {_LANE}]")
    mtype_all = np.asarray(s.mat_type, np.int64)
    textype_all = np.asarray(s.tex_type, np.int64)
    has_checker = bool((textype_all == 1).any())

    def mat_rows(mat_ids):
        m = np.asarray(mat_ids)
        mt = mtype_all[m]
        param = np.where(
            mt == 1, np.asarray(s.fuzz, np.float32)[m],
            np.where(mt == 2, np.asarray(s.ref_idx, np.float32)[m],
                     np.float32(1.0)))
        return np.stack([
            param.astype(np.float32),
            *(np.asarray(s.albedo, np.float32)[m, k] for k in range(3)),
            *(np.asarray(s.albedo2, np.float32)[m, k] for k in range(3)),
            np.asarray(s.tex_scale, np.float32)[m],
        ])  # (8, N)

    # --- spheres: SAH clusters, cluster-major columns ---
    kc = 1
    sph = np.zeros((_SPH_ROWS, _LANE), np.float32)
    sph[0:3] = _BIG
    sph[12] = np.float32(_BIG)
    mx = np.zeros((_LANE, 8), np.float32)
    mx[:, 0:3] = _BIG
    mx[:, 3] = np.float32(np.inf)
    boxes_np = np.zeros((1, 8), np.float32)
    boxes_np[:, 0:3] = _BIG
    boxes_np[:, 3:6] = -_BIG
    super_spans = ((0, 1),)
    sboxes_np = boxes_np
    if ns:
        bmin, bmax = sphere_aabb_np(s.sphere_center, s.sphere_radius)
        if layout is not None:
            slot_ids = [np.asarray(t, np.int64) for t in layout.sph_slots]
            super_spans = layout.super_spans
        else:
            boxes0, slot_ids = _cluster_type(bmin, bmax, np.arange(ns),
                                             max_leaf)
            if sort_from is not None:
                centers = 0.5 * (boxes0[:, 0:3] + boxes0[:, 3:6])
                d2 = ((centers - np.asarray(sort_from, np.float32))
                      ** 2).sum(1)
                order = np.argsort(d2, kind="stable")
                boxes0 = boxes0[order]
                slot_ids = [slot_ids[k] for k in order]
            # r5 SUPERGROUPS (gate_mode="hier"): the r5 fieldbench
            # decomposed per-iteration cost as ~0.3-0.44 us PER GATE
            # SITE independent of whether the cluster is swept — the
            # gate+branch overhead, not sweep math, dominates large
            # scenes (FIELDBENCH_r5.json fit).  Spatially grouping <=8
            # clusters under ONE slab gate cuts gate sites ~8x; a fired
            # supergroup sweeps all its children.
            slot_ids, super_spans = _group_clusters(boxes0, slot_ids,
                                                    sort_from,
                                                    super_fanout)
        kc = len(slot_ids)
        # Boxes are always DATA (recomputed from the current geometry),
        # so a layout-reusing repack stays conservative after parameter
        # updates.
        boxes = _member_boxes(bmin, bmax, slot_ids)
        sboxes_np = _span_boxes(boxes, super_spans)
        cols = kc * _LANE
        sph = np.zeros((_SPH_ROWS, cols), np.float32)
        sph[0:3] = _BIG                      # sentinel slots: never hit
        sph[12] = np.float32(_BIG)           # finite for the extraction
        mx = np.zeros((cols, 8), np.float32)
        mx[:, 0:3] = _BIG
        mx[:, 3] = np.float32(np.inf)        # sweep sentinel: certain miss
        boxes_np = np.asarray(boxes, np.float32)
        c_all = np.asarray(s.sphere_center, np.float32)
        r_all = np.asarray(s.sphere_radius, np.float32)
        for k, gids in enumerate(slot_ids):
            m = len(gids)
            j0 = k * _LANE
            c = c_all[gids]
            r = r_all[gids]
            sph[0:3, j0:j0 + m] = c.T
            sph[3, j0:j0 + m] = r
            sph[4:12, j0:j0 + m] = mat_rows(np.asarray(s.sphere_mat)[gids])
            c64 = c.astype(np.float64)
            c0 = ((c64 * c64).sum(1)
                  - r.astype(np.float64) ** 2).astype(np.float32)
            sph[12, j0:j0 + m] = np.asarray(gids, np.float32)  # orig ids
            sph[13, j0:j0 + m] = mtype_all[
                np.asarray(s.sphere_mat)[gids]].astype(np.float32)
            sph[14, j0:j0 + m] = textype_all[
                np.asarray(s.sphere_mat)[gids]].astype(np.float32)
            sph[15, j0:j0 + m] = np.where(r != 0, 1.0 / np.where(r != 0, r,
                                                                 1.0), 0.0)
            mx[j0:j0 + m, 0:3] = c
            mx[j0:j0 + m, 3] = c0

    # --- triangles: SAH clusters, cluster-major columns (r5) ---
    # Same two-level scheme as the spheres (VERDICT r4 item 8: triangles
    # previously kept the dense treatment, so triangle-heavy large
    # scenes had no fast path).  Material/texture types ride as table
    # rows 21/22 (SAH order destroys the dense pack's group sort); the
    # per-cluster fold keeps the EXACT t, so no winner-t replay is
    # needed.  Zero sentinel columns have det == 0 -> never hit.
    tri = np.zeros((_TRI_ROWS, _LANE), np.float32)
    tri_groups = (0,) * 7            # unused here; kept for pack compat
    kt = 1
    tboxes_np = np.zeros((1, 8), np.float32)
    tboxes_np[:, 0:3] = _BIG
    tboxes_np[:, 3:6] = -_BIG
    tri_super_spans = ((0, 1),)
    tsboxes_np = tboxes_np
    if nt:
        v0a = np.asarray(s.tri_v0, np.float64)
        v1a = np.asarray(s.tri_v1, np.float64)
        v2a = np.asarray(s.tri_v2, np.float64)
        tbmin = np.minimum(np.minimum(v0a, v1a), v2a)
        tbmax = np.maximum(np.maximum(v0a, v1a), v2a)
        if layout is not None:
            t_slots = [np.asarray(t, np.int64) for t in layout.tri_slots]
            tri_super_spans = layout.tri_super_spans
        else:
            tboxes0, t_slots = _cluster_type(tbmin, tbmax, np.arange(nt),
                                             max_leaf)
            if sort_from is not None:
                tcent = 0.5 * (tboxes0[:, 0:3] + tboxes0[:, 3:6])
                td2 = ((tcent - np.asarray(sort_from, np.float32))
                       ** 2).sum(1)
                torder = np.argsort(td2, kind="stable")
                tboxes0 = tboxes0[torder]
                t_slots = [t_slots[i] for i in torder]
            t_slots, tri_super_spans = _group_clusters(tboxes0, t_slots,
                                                       sort_from,
                                                       super_fanout)
        kt = len(t_slots)
        tboxes_np = _member_boxes(tbmin, tbmax, t_slots)
        tsboxes_np = _span_boxes(tboxes_np, tri_super_spans)
        tri = np.zeros((_TRI_ROWS, kt * _LANE), np.float32)
        tm_all = np.asarray(s.tri_mat, np.int64)
        for k, gids in enumerate(t_slots):
            m = len(gids)
            j0 = k * _LANE
            v0 = v0a[gids].astype(np.float32)
            e1 = (v1a[gids] - v0a[gids]).astype(np.float32)
            e2 = (v2a[gids] - v0a[gids]).astype(np.float32)
            n = np.cross(e1, e2)
            nn = np.linalg.norm(n, axis=1, keepdims=True)
            n = n / np.where(nn > 0, nn, 1.0)
            tri[0:3, j0:j0 + m] = v0.T
            tri[3:6, j0:j0 + m] = e1.T
            tri[6:9, j0:j0 + m] = e2.T
            tri[9:12, j0:j0 + m] = n.T
            tri[12:20, j0:j0 + m] = mat_rows(tm_all[gids])
            # Row 20: global ORIGINAL id (ns + tri index) for emit_tape.
            tri[20, j0:j0 + m] = (ns + gids).astype(np.float32)
            tri[21, j0:j0 + m] = mtype_all[tm_all[gids]].astype(
                np.float32)
            tri[22, j0:j0 + m] = textype_all[tm_all[gids]].astype(
                np.float32)
    if layout is not None:
        margin = layout.phase1_margin
        grid_lo, grid_inv, grid_dims = (layout.grid_lo, layout.grid_inv,
                                        layout.grid_dims)
        adj = (_cell_adj(grid_lo, grid_inv, grid_dims,
                         boxes_np[:, :6].astype(np.float64))
               if ns else np.zeros((8, _LANE), np.float32))
    else:
        margin = 0.0
        if ns and kc > 1:
            ext = (boxes_np[:, 3:6] - boxes_np[:, 0:3]).max(axis=1)
            margin = (float(np.median(ext[ext > 0]) * 0.5)
                      if (ext > 0).any() else 0.0)
        if ns:
            adj, grid_lo, grid_inv, grid_dims = _build_cell_grid(
                bmin, bmax, boxes_np[:, :6].astype(np.float64))
        else:
            adj = np.zeros((8, _LANE), np.float32)
            grid_lo, grid_inv, grid_dims = ((0.0,) * 3, (1.0,) * 3,
                                            (1, 1, 1))
    pack = MegaClusteredPack(
        sph=jnp.asarray(sph), sph_mx=jnp.asarray(mx),
        boxes=jnp.asarray(boxes_np), tris=jnp.asarray(tri),
        sphere_rows=ns, tri_rows=nt, clusters=kc, tri_groups=tri_groups,
        has_checker=has_checker, phase1_margin=margin,
        adj=jnp.asarray(adj), grid_lo=grid_lo, grid_inv=grid_inv,
        grid_dims=grid_dims, super_boxes=jnp.asarray(sboxes_np),
        super_spans=super_spans, tri_boxes=jnp.asarray(tboxes_np),
        tri_super_boxes=jnp.asarray(tsboxes_np), tri_clusters=kt,
        tri_super_spans=tri_super_spans)
    if not return_layout:
        return pack
    layout_out = layout if layout is not None else ClusterLayout(
        sph_slots=tuple(tuple(int(i) for i in g) for g in slot_ids)
        if ns else (),
        super_spans=super_spans,
        tri_slots=tuple(tuple(int(i) for i in g) for g in t_slots)
        if nt else (),
        tri_super_spans=tri_super_spans,
        grid_lo=grid_lo, grid_inv=grid_inv, grid_dims=grid_dims,
        phase1_margin=margin)
    return pack, layout_out


def _mega_clustered_kernel(cam_ref, key_ref, pix0_ref, box_ref, sbox_ref,
                           tbox_ref, tsbox_ref, span_ref, adj_ref,
                           sboxv_ref, w16_ref,
                           sph_ref, mx_ref, tri_ref, rad_ref, seg_ref,
                           it_ref, swp_ref, *refs,
                           nx, ny, spp, max_depth, t_min, tile_w, grid_w,
                           total_pixels, spp_total, ns, nt, kc, kt, tile,
                           k_pix, unroll, has_checker,
                           margin, gate_mode, mapping, lanes_total,
                           grid_lo, grid_inv, grid_dims, super_spans,
                           tri_super_spans, emit_tape=False):
    # With ``emit_tape`` an extra output block records the winning
    # ORIGINAL primitive id per (sample-slot, depth) — the record->replay
    # tape for LARGE scenes (the dense recorder caps at 2^14 packed
    # primitives; this kernel's exact per-cluster selection has no
    # packed-id bound).  Ids ride in payload rows (sphere 12 / tri 20)
    # and come out of the same one-hot extraction as the rest.
    tape_ref = refs[0] if emit_tape else None
    acc_ref = refs[-1]
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    T = tile
    K = k_pix
    S = K * spp
    TW = tile_w
    TH = (K * T) // TW
    # Global tile position (t0 offsets the tile index for sharding);
    # scalar arithmetic, once per grid step.
    g = pix0_ref[0, 0] + pl.program_id(0)
    gy = g // grid_w
    gx = g - gy * grid_w
    x0 = gx * TW
    y0 = gy * TH
    lane = jax.lax.broadcasted_iota(i32, (1, T), 1)   # tile-local
    lane_glob = g * T + lane                           # stride mapping
    spp0 = pix0_ref[0, 1]
    k0 = key_ref[0, 0]
    k1 = key_ref[0, 1]

    co = [cam_ref[0, k] for k in range(3)]
    ll = [cam_ref[0, 3 + k] for k in range(3)]
    hz = [cam_ref[0, 6 + k] for k in range(3)]
    vt = [cam_ref[0, 9 + k] for k in range(3)]
    cu = [cam_ref[0, 12 + k] for k in range(3)]
    cv = [cam_ref[0, 15 + k] for k in range(3)]
    lens_r = cam_ref[0, 18]

    def _fdiv(a, b_inv, b):
        return jnp.floor((a.astype(f32) + 0.5) * f32(b_inv)).astype(i32)

    def _fdiv_exact(a, b_inv, b):
        # _fdiv + remainder correction: exact for a < 2^24 (pixel ids on
        # large images exceed the plain +0.5-bias margin past ~2^22).
        q = _fdiv(a, b_inv, b)
        r = a - q * b
        return q - (r < 0).astype(i32) + (r >= b).astype(i32)

    def pixel_of(s):
        """Lane's pixel for a sample counter, by mapping:

        - ``stride`` (default): the dense megakernel's image-wide grid
          stride ``pix = g*T + lane + j*lanes_total`` — best lane
          occupancy (long paths decorrelate); measured the right trade
          since tile-granular culling saturates under isotropic bounce
          directions (ROADMAP r4) and the gates then only scope compile
          temporaries.
        - ``rect``: a 2D tile_w x tile_h pixel rectangle — the coherent
          mapping that makes the gates fire, kept for scenes/regimes
          where culling wins.  Validity is monotone in j in both
          mappings (the regeneration logic relies on it)."""
        j = _fdiv(s, 1.0 / spp, spp)
        if mapping == "stride":
            pix = lane_glob + j * lanes_total
            valid = pix < total_pixels
            return jnp.minimum(pix, total_pixels - 1), valid
        if mapping == "band":
            # Contiguous pixel blocks: tile g owns [g*K*T, (g+1)*K*T);
            # lane l's j-th pixel is g*K*T + j*T + l.  Measured the best
            # field-scene trade (FIELDBENCH_r4): tile-local coherence
            # keeps occupancy high while the (saturated) gates still
            # scope compile temporaries.
            pix = g * (K * T) + j * T + lane
            valid = pix < total_pixels
            return jnp.minimum(pix, total_pixels - 1), valid
        loc = lane + j * T
        yin = _fdiv(loc, 1.0 / TW, TW)
        xin = loc - yin * TW
        x = x0 + xin
        y = y0 + yin
        valid = (x < nx) & (y < ny)
        pix = y * nx + x
        return jnp.minimum(pix, total_pixels - 1), valid

    def ray_id(s):
        pixc, _ = pixel_of(s)
        rem = s - _fdiv(s, 1.0 / spp, spp) * spp
        return (pixc * spp_total + (spp0 + rem)).astype(u32)

    def camera_ray(s, ju, jv, lu, lv):
        pixc, _ = pixel_of(s)
        j_i = _fdiv_exact(pixc, 1.0 / nx, nx)
        j_f = j_i.astype(f32)
        i_f = (pixc - j_i * nx).astype(f32)
        sf = (i_f + ju) * f32(1.0 / nx)
        tf = (j_f + jv) * f32(1.0 / ny)
        r = jnp.sqrt(lu)
        th = f32(2.0 * math.pi) * lv
        rd0 = lens_r * (r * jnp.cos(th))
        rd1 = lens_r * (r * jnp.sin(th))
        ox = co[0] + rd0 * cu[0] + rd1 * cv[0]
        oy = co[1] + rd0 * cu[1] + rd1 * cv[1]
        oz = co[2] + rd0 * cu[2] + rd1 * cv[2]
        dx = ll[0] + sf * hz[0] + tf * vt[0] - ox
        dy = ll[1] + sf * hz[1] + tf * vt[1] - oy
        dz = ll[2] + sf * hz[2] + tf * vt[2] - oz
        dx, dy, dz = _unit3(dx, dy, dz)
        return ox, oy, oz, dx, dy, dz

    def draws4(c0, dom2):
        a0, a1 = _threefry2x32(k0, k1, c0, dom2)
        b0, b1 = _threefry2x32(k0, k1, c0, dom2 + u32(1))
        return (_bits_to_unit(a0), _bits_to_unit(a1),
                _bits_to_unit(b0), _bits_to_unit(b1))

    rad_ref[:, :] = jnp.zeros((3 * K, T), f32)
    acc_ref[17:18, :] = jnp.zeros((1, T), f32)   # cluster-sweep counter
    if emit_tape:
        D_t = max_depth + 1
        rpad_t = tape_ref.shape[0]
        tape_ref[:, :] = jnp.zeros((rpad_t, T), f32)
        iota_r = jax.lax.broadcasted_iota(i32, (rpad_t, T), 0)

    use_adj = gate_mode == "adj" and ns and kc > 1
    if use_adj:
        c_pad = adj_ref.shape[0]
        iota_cell = jax.lax.broadcasted_iota(i32, (c_pad, T), 0)
        glx, gly, glz = (f32(v) for v in grid_lo)
        gix, giy, giz = (f32(v) for v in grid_inv)
        gdx, gdy, gdz = grid_dims

    # Slot iotas per distinct sweep width.  (Fused multi-cluster span
    # sweeps were tried and MEASURED SLOWER than per-cluster sweeps —
    # batch-4 fieldbench — so only the 128-slot width is used; the dict
    # form remains for future width experiments.)
    iota_w = {_LANE: jax.lax.broadcasted_iota(i32, (_LANE, T), 0)}
    iota_c = iota_w[_LANE]
    iota_k = jax.lax.broadcasted_iota(i32, (K, T), 0)

    s0 = jnp.zeros((1, T), i32)
    rid0 = ray_id(s0)
    ju0, jv0, lu0, lv0 = draws4(rid0, jnp.zeros_like(rid0))
    ox, oy, oz, dx, dy, dz = camera_ray(s0, ju0, jv0, lu0, lv0)

    zero = jnp.zeros((1, T), f32)
    one = jnp.ones((1, T), f32)
    _, valid0 = pixel_of(s0)
    samp0 = jnp.where(valid0, 0, S)

    def body(carry):
        (it, samp, depth, ox, oy, oz, dx, dy, dz,
         tpx, tpy, tpz, rx, ry, rz, segs, ocell) = carry
        active = samp < S
        sampc = jnp.minimum(samp, S - 1)
        rid = ray_id(sampc)
        dom2 = (depth + 1).astype(u32) * u32(2)
        u1, u2, u3, coin = draws4(rid, dom2)
        nrid = ray_id(jnp.minimum(sampc + 1, S - 1))
        ju, jv, lu, lv = draws4(nrid, jnp.zeros_like(nrid))

        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz

        # Inverse direction for the slab gates (components can be 0: the
        # min/max form absorbs the resulting infs; an exact on-plane
        # origin yields NaN -> gate false for that lane — measure-zero,
        # same semantics as intersect_clustered).
        ivx = _recip(dx)
        ivy = _recip(dy)
        ivz = _recip(dz)

        def slab_gate_box(bx, bound):
            """Tile-granular gate: any lane's slab interval reaches the
            box within [t_min, bound(lane)].  near/far are inflated by a
            few ulp so the f32 slab arithmetic stays CONSERVATIVE — an
            exact-boundary hit must never be gated away (without this, a
            gated and an ungated schedule can disagree by one knife-edge
            winner, the ~1e-6-relative radiance drift seen between gate
            modes in FIELDBENCH_r5)."""
            mnx, mny, mnz, mxx, mxy, mxz = bx
            t0x, t1x = (mnx - ox) * ivx, (mxx - ox) * ivx
            t0y, t1y = (mny - oy) * ivy, (mxy - oy) * ivy
            t0z, t1z = (mnz - oz) * ivz, (mxz - oz) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                          jnp.maximum(t0y, t1y)),
                              jnp.maximum(t0z, t1z))
            near = near * f32(1.0 - 4e-6) - f32(1e-6)
            far = far * f32(1.0 + 4e-6) + f32(1e-6)
            gate = active & (jnp.maximum(near, t_min)
                             <= jnp.minimum(far, bound))
            return jnp.any(gate)

        # ---- spheres: gated per-cluster sweep + fold ----
        t_s = jnp.full((1, T), f32(_BIG))
        if ns:
            # Fold state lives in VMEM scratch so each cluster's sweep can
            # be a pl.when body (skipped compute when no lane gates in):
            # row 0 = best t, rows 1..16 = the winner's 16 payload rows.
            acc_ref[0:1, :] = jnp.full((1, T), f32(_BIG))
            acc_ref[1:17, :] = jnp.zeros((16, T), f32)

            # Tile BOUNCE-origin bounding box (scalars; lane reductions).
            # Depth-0 lanes are excluded: their origin is the camera,
            # which would stretch the box into a camera-to-footprint
            # corridor and sweep every cluster along it (camera rays are
            # handled fine by the slab gates).  An empty box (no bounce
            # lanes) inverts min/max and phase 1 selects nothing.
            bmask = active & (depth > 0)
            obx0 = jnp.min(jnp.where(bmask, ox, f32(_BIG)))
            obx1 = jnp.max(jnp.where(bmask, ox, f32(-_BIG)))
            oby0 = jnp.min(jnp.where(bmask, oy, f32(_BIG)))
            oby1 = jnp.max(jnp.where(bmask, oy, f32(-_BIG)))
            obz0 = jnp.min(jnp.where(bmask, oz, f32(_BIG)))
            obz1 = jnp.max(jnp.where(bmask, oz, f32(-_BIG)))

            def cluster_box(kcl):
                return (box_ref[kcl, 0], box_ref[kcl, 1], box_ref[kcl, 2],
                        box_ref[kcl, 3], box_ref[kcl, 4], box_ref[kcl, 5])

            def near_origin(kcl):
                """Scalar: cluster box overlaps the (margin-inflated)
                origin box.  Phase 1 sweeps these first, so every lane
                that hits nearby (the common case — bounce origins sit on
                surfaces inside some cluster) enters phase 2 with a tight
                best-t.  With 512 isotropic bounce rays per tile, the
                per-lane slab gates alone almost never skip (any cluster
                with >=1/512 per-ray probability fires); the tight t is
                what makes them selective."""
                mnx, mny, mnz, mxx, mxy, mxz = cluster_box(kcl)
                m = f32(margin)
                return ((mnx <= obx1 + m) & (mxx >= obx0 - m)
                        & (mny <= oby1 + m) & (mxy >= oby0 - m)
                        & (mnz <= obz1 + m) & (mxz >= obz0 - m))

            def slab_gate(kcl):
                return slab_gate_box(cluster_box(kcl), acc_ref[0:1, :])

            def super_box(s):
                return (sbox_ref[s, 0], sbox_ref[s, 1], sbox_ref[s, 2],
                        sbox_ref[s, 3], sbox_ref[s, 4], sbox_ref[s, 5])

            # The sweep runs for the whole tile when ANY lane wants this
            # cluster; the fold stays per-lane correct because a
            # non-gated lane can only be improved by a real closer hit
            # (its own slab interval just proved there is none, so
            # `better` is false for it).
            def make_sweep_span(kc0, kc1):
                j0 = kc0 * _LANE
                w = (kc1 - kc0) * _LANE

                def _sweep(j0=j0, w=w, nc=kc1 - kc0):
                    acc_ref[17:18, :] = acc_ref[17:18, :] + f32(nc)
                    cx = mx_ref[j0:j0 + w, 0:1]
                    cy = mx_ref[j0:j0 + w, 1:2]
                    cz = mx_ref[j0:j0 + w, 2:3]
                    c0 = mx_ref[j0:j0 + w, 3:4]
                    dc = cx * dx + cy * dy + cz * dz
                    oc_ = cx * ox + cy * oy + cz * oz
                    bq = od - dc
                    cq = oo - 2.0 * oc_ + c0
                    disc = bq * bq - cq
                    sq = jnp.sqrt(disc)          # NaN on miss: all false
                    tn = -bq - sq
                    tf_ = sq - bq
                    tall = jnp.where(tn > t_min, tn,
                                     jnp.where(tf_ > t_min, tf_,
                                               f32(_BIG)))   # (w, T)
                    t_cl = jnp.min(tall, axis=0)[None, :]
                    slot = jnp.min(jnp.where(tall == t_cl, iota_w[w],
                                             i32(w)), axis=0)[None, :]
                    t_cur = acc_ref[0:1, :]
                    better = t_cl < t_cur
                    # Winner payload: one-hot MXU extraction of the 16
                    # rows, merged under the same better mask.
                    oh = (iota_w[w] == slot).astype(f32)
                    ext = jax.lax.dot_general(
                        sph_ref[:, j0:j0 + w], oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)  # (16, T)
                    acc_ref[0:1, :] = jnp.where(better, t_cl, t_cur)
                    acc_ref[1:17, :] = jnp.where(better, ext,
                                                 acc_ref[1:17, :])

                return _sweep

            def make_sweep(kcl):
                return make_sweep_span(kcl, kcl + 1)

            def sweep_dyn(kcl):
                """The single worklist sweep body: ``kcl`` is a TRACED
                scalar; tables are sliced at dynamic 128-aligned offsets
                (both dims proven supported — tools/dynslice_probe.py /
                tools/worklist_probe.py)."""
                acc_ref[17:18, :] = acc_ref[17:18, :] + 1.0
                j0 = pl.multiple_of(kcl * _LANE, _LANE)
                mxb = mx_ref[pl.ds(j0, _LANE), :]
                cx = mxb[:, 0:1]
                cy = mxb[:, 1:2]
                cz = mxb[:, 2:3]
                c0 = mxb[:, 3:4]
                dc = cx * dx + cy * dy + cz * dz
                oc_ = cx * ox + cy * oy + cz * oz
                bq = od - dc
                cq = oo - 2.0 * oc_ + c0
                disc = bq * bq - cq
                sq = jnp.sqrt(disc)
                tn = -bq - sq
                tf_ = sq - bq
                tall = jnp.where(tn > t_min, tn,
                                 jnp.where(tf_ > t_min, tf_, f32(_BIG)))
                t_cl = jnp.min(tall, axis=0)[None, :]
                slot = jnp.min(jnp.where(tall == t_cl, iota_c,
                                         i32(_LANE)), axis=0)[None, :]
                t_cur = acc_ref[0:1, :]
                better = t_cl < t_cur
                oh = (iota_c == slot).astype(f32)
                ext = jax.lax.dot_general(
                    sph_ref[:, pl.ds(j0, _LANE)], oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)  # (16, T)
                acc_ref[0:1, :] = jnp.where(better, t_cl, t_cur)
                acc_ref[1:17, :] = jnp.where(better, ext,
                                             acc_ref[1:17, :])

            if kc == 1 or gate_mode == "all":
                for kcl in range(kc):
                    make_sweep(kcl)()   # ungated: cost baseline / 1 cluster
            elif gate_mode == "slab":
                for kcl in range(kc):
                    pl.when(slab_gate(kcl))(make_sweep(kcl))
            elif gate_mode == "hier":
                # One slab gate per spatial SUPERGROUP (gate sites drop
                # ~8x; FIELDBENCH_r5 decomposition: ~0.3 us per gate
                # site); a fired group sweeps ALL its children — every
                # finer-grained variant was built and MEASURED SLOWER:
                # fused (G*128, T) span sweeps 1.42 vs 1.56 Mpaths/s at
                # field20000 (wide reductions/extraction cost more than
                # G narrow ones), and per-child gates INSIDE the fired
                # super 1.20 vs 1.53 (nested gate evaluations cost more
                # than the ~1.1 us/sweep they avoid, even though they
                # cut swept children to exactly slab's counts).
                for s, (c0, c1) in enumerate(super_spans):
                    gate = (slab_gate(c0) if c1 - c0 == 1 else
                            slab_gate_box(super_box(s), acc_ref[0:1, :]))

                    def sweep_kids(c0=c0, c1=c1):
                        for kcl in range(c0, c1):
                            make_sweep(kcl)()
                    pl.when(gate)(sweep_kids)
            elif gate_mode == "wl":
                # WORKLIST gating (r5 probes; r6 architecture, v1 at
                # SUPERGROUP granularity): batched slab intervals for
                # all supers at once, gate bits extracted to scalar
                # words (exact f32 half-word sums), ctz set-bit
                # iteration, ONE dynamic-offset sweep body.  Two rounds
                # restore the sequential gates' best-t tightening:
                # round A sweeps supers whose slab entry lies within a
                # static near-cap of the ray origins (tightening most
                # lanes' t), round B re-gates the remainder against the
                # tightened per-lane best t.
                ks = len(super_spans)
                ks_pad = sboxv_ref.shape[0]
                bmn = [sboxv_ref[:, k:k + 1] for k in range(3)]
                bmx = [sboxv_ref[:, 3 + k:4 + k] for k in range(3)]
                t0x, t1x = (bmn[0] - ox) * ivx, (bmx[0] - ox) * ivx
                t0y, t1y = (bmn[1] - oy) * ivy, (bmx[1] - oy) * ivy
                t0z, t1z = (bmn[2] - oz) * ivz, (bmx[2] - oz) * ivz
                wnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                                jnp.minimum(t0y, t1y)),
                                    jnp.minimum(t0z, t1z))
                wfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.maximum(t0z, t1z))
                wnear = wnear * f32(1.0 - 4e-6) - f32(1e-6)
                wfar = wfar * f32(1.0 + 4e-6) + f32(1e-6)
                n_half = ks_pad // 16
                w16c = w16_ref[:, 0:1]

                def gate_words(bound):
                    g = (active & (jnp.maximum(wnear, t_min)
                                   <= jnp.minimum(wfar, bound)))
                    gv = jnp.max(g.astype(f32), axis=1, keepdims=True)
                    halves = [
                        jnp.sum(gv[h * 16:(h + 1) * 16, :] * w16c)
                        .astype(i32) for h in range(n_half)]
                    words = []
                    for w in range(0, n_half, 2):
                        hi = halves[w + 1] if w + 1 < n_half else i32(0)
                        words.append((halves[w]
                                      + hi * i32(65536)).astype(u32))
                    return words

                def sweep_super(s):
                    ca = span_ref[s, 0]
                    cb = span_ref[s, 1]

                    def body(i, carry):
                        sweep_dyn(i)
                        return carry

                    jax.lax.fori_loop(ca, cb, body, jnp.float32(0.0))

                def run_words(words):
                    for w, word0 in enumerate(words):
                        def cond(c):
                            return c[0] != u32(0)

                        def body(c):
                            word, base = c
                            low = word & (~word + u32(1))
                            s = base + (31
                                        - jax.lax.clz(low).astype(i32))
                            sweep_super(s)
                            return (word & (word - u32(1)), base)

                        jax.lax.while_loop(
                            cond, body, (word0, jnp.int32(w * 32)))

                words_a = gate_words(f32(margin) * f32(8.0))
                run_words(words_a)
                words_b = gate_words(acc_ref[0:1, :])
                words_b = [b & ~a for a, b in zip(words_a, words_b)]
                run_words(words_b)
            elif use_adj:
                # Phase 1: clusters adjacent to any lane's last-hit grid
                # cell.  One-hot cell union (c_pad, T) -> lane-reduce ->
                # one (c_pad x kc_pad) matvec; per-cluster scalar gates
                # from static row slices.  ocell = -1 (depth-0/dead
                # lanes) matches no row, so camera rays gate purely by
                # phase 2's slab test.
                occ1 = (iota_cell == ocell).astype(f32)
                ucell = jnp.max(occ1, axis=1, keepdims=True)
                gvec = jax.lax.dot_general(
                    adj_ref[:, :], ucell,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)  # (kc_pad, 1)
                nears = [jnp.any(gvec[kcl:kcl + 1, :] > 0.5)
                         for kcl in range(kc)]
                for kcl in range(kc):
                    pl.when(nears[kcl])(make_sweep(kcl))
                # Phase 2: everything else, slab-gated against the
                # phase-1-tightened per-lane best t.  Exact — escapes,
                # long free paths and camera rays are all caught here.
                for kcl in range(kc):
                    pl.when(jnp.logical_not(nears[kcl])
                            & slab_gate(kcl))(make_sweep(kcl))
            else:
                # Phase 1: bounce-origin-adjacent clusters (scalar
                # predicate).
                nears = [near_origin(kcl) for kcl in range(kc)]
                for kcl in range(kc):
                    pl.when(nears[kcl])(make_sweep(kcl))
                # Phase 2: everything else, slab-gated against the
                # now-tight per-lane best t.
                for kcl in range(kc):
                    pl.when(jnp.logical_not(nears[kcl])
                            & slab_gate(kcl))(make_sweep(kcl))
            t_s = acc_ref[0:1, :]
            (scx, scy, scz, _, sparam, sa0r, sa0g, sa0b, sa1r, sa1g, sa1b,
             sscale, soid, smtype, stextype, sinvr) = [
                acc_ref[r:r + 1, :] for r in range(1, 17)]

        # ---- triangles: gated per-cluster sweep + fold (r5) ----
        # Same two-level scheme as the spheres; the fold keeps the EXACT
        # winner t (no packed truncation -> no winner-t replay).  Fold
        # scratch rows: 18 = best t, 19..33 = extracted payload rows
        # 9..23 of the winner (normal, param, albedo, albedo2, scale,
        # orig id, mat type, tex type).  Gate bound = min(sphere best t,
        # tri best t) — the sphere fold ran first.
        t_t = jnp.full((1, T), f32(_BIG))
        if nt:
            acc_ref[18:19, :] = jnp.full((1, T), f32(_BIG))
            acc_ref[19:34, :] = jnp.zeros((15, T), f32)

            def tri_box(ktc):
                return (tbox_ref[ktc, 0], tbox_ref[ktc, 1],
                        tbox_ref[ktc, 2], tbox_ref[ktc, 3],
                        tbox_ref[ktc, 4], tbox_ref[ktc, 5])

            def tri_super_box(s):
                return (tsbox_ref[s, 0], tsbox_ref[s, 1], tsbox_ref[s, 2],
                        tsbox_ref[s, 3], tsbox_ref[s, 4], tsbox_ref[s, 5])

            def tri_bound():
                b = acc_ref[18:19, :]
                return jnp.minimum(acc_ref[0:1, :], b) if ns else b

            def make_tsweep_span(kt0, kt1):
                j0 = kt0 * _LANE
                w = (kt1 - kt0) * _LANE

                def _tsweep(j0=j0, w=w, nc=kt1 - kt0):
                    acc_ref[17:18, :] = acc_ref[17:18, :] + f32(nc)
                    v0x = tri_ref[0, j0:j0 + w][:, None]
                    v0y = tri_ref[1, j0:j0 + w][:, None]
                    v0z = tri_ref[2, j0:j0 + w][:, None]
                    e1x = tri_ref[3, j0:j0 + w][:, None]
                    e1y = tri_ref[4, j0:j0 + w][:, None]
                    e1z = tri_ref[5, j0:j0 + w][:, None]
                    e2x = tri_ref[6, j0:j0 + w][:, None]
                    e2y = tri_ref[7, j0:j0 + w][:, None]
                    e2z = tri_ref[8, j0:j0 + w][:, None]
                    px_ = dy * e2z - dz * e2y
                    py_ = dz * e2x - dx * e2z
                    pz_ = dx * e2y - dy * e2x
                    det = e1x * px_ + e1y * py_ + e1z * pz_
                    ok = jnp.abs(det) > 1e-9
                    inv = jnp.where(ok, _recip(jnp.where(ok, det, 1.0)),
                                    0.0)
                    tvx = ox - v0x
                    tvy = oy - v0y
                    tvz = oz - v0z
                    uu = (tvx * px_ + tvy * py_ + tvz * pz_) * inv
                    qx = tvy * e1z - tvz * e1y
                    qy = tvz * e1x - tvx * e1z
                    qz = tvx * e1y - tvy * e1x
                    vv = (dx * qx + dy * qy + dz * qz) * inv
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv
                    hitm = (ok & (uu >= 0.0) & (vv >= 0.0)
                            & (uu + vv <= 1.0)
                            & (tt > t_min) & (tt < _BIG))
                    tall = jnp.where(hitm, tt, f32(_BIG))   # (w, T)
                    t_cl = jnp.min(tall, axis=0)[None, :]
                    slot = jnp.min(jnp.where(tall == t_cl, iota_w[w],
                                             i32(w)),
                                   axis=0)[None, :]
                    t_cur = acc_ref[18:19, :]
                    better = t_cl < t_cur
                    oh = (iota_w[w] == slot).astype(f32)
                    ext = jax.lax.dot_general(
                        tri_ref[:, j0:j0 + w], oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)  # (24, T)
                    acc_ref[18:19, :] = jnp.where(better, t_cl, t_cur)
                    acc_ref[19:34, :] = jnp.where(better, ext[9:24],
                                                  acc_ref[19:34, :])

                return _tsweep

            def make_tsweep(ktc):
                return make_tsweep_span(ktc, ktc + 1)

            if kt == 1 or gate_mode == "all":
                for ktc in range(kt):
                    make_tsweep(ktc)()
            elif gate_mode in ("hier", "wl"):
                for s, (c0, c1) in enumerate(tri_super_spans):
                    gate = (slab_gate_box(tri_box(c0), tri_bound())
                            if c1 - c0 == 1 else
                            slab_gate_box(tri_super_box(s), tri_bound()))

                    def tsweep_kids(c0=c0, c1=c1):
                        for ktc in range(c0, c1):
                            make_tsweep(ktc)()
                    pl.when(gate)(tsweep_kids)
            else:
                for ktc in range(kt):
                    pl.when(slab_gate_box(tri_box(ktc),
                                          tri_bound()))(make_tsweep(ktc))

            t_t = acc_ref[18:19, :]
            (tnx, tny, tnz, tparam, ta0r, ta0g, ta0b, ta1r, ta1g, ta1b,
             tscale_t, toid, tmtype, ttextype) = [
                acc_ref[r:r + 1, :] for r in range(19, 33)]
            t_metal = tmtype == 1.0
            t_diel = tmtype == 2.0
            t_check = ttextype == 1.0

        is_tri = t_t < t_s
        t_best = jnp.where(is_tri, t_t, t_s)
        hit = active & (t_best < _BIG)

        if emit_tape:
            if ns and nt:
                oid = jnp.where(is_tri, toid, soid)
            elif ns:
                oid = soid
            else:
                oid = toid
            row_t = sampc * D_t + depth
            tape_ref[:, :] = tape_ref[:, :] + (iota_r == row_t).astype(
                f32) * jnp.where(hit, oid + 1.0, 0.0)

        px = ox + t_best * dx
        py = oy + t_best * dy
        pz = oz + t_best * dz
        if ns and nt:
            nxv = jnp.where(is_tri, tnx, (px - scx) * sinvr)
            nyv = jnp.where(is_tri, tny, (py - scy) * sinvr)
            nzv = jnp.where(is_tri, tnz, (pz - scz) * sinvr)
            param = jnp.where(is_tri, tparam, sparam)
            a0r = jnp.where(is_tri, ta0r, sa0r)
            a0g = jnp.where(is_tri, ta0g, sa0g)
            a0b = jnp.where(is_tri, ta0b, sa0b)
            # Boolean merges use logical ops, not select: Mosaic cannot
            # lower select_n on i1 vectors (i8->i1 trunc, seen on the
            # trifield compile — this mixed branch never compiled
            # on-chip before r5).
            is_metal = (is_tri & t_metal) | (~is_tri & (smtype == 1.0))
            is_diel = (is_tri & t_diel) | (~is_tri & (smtype == 2.0))
            if has_checker:
                a1r = jnp.where(is_tri, ta1r, sa1r)
                a1g = jnp.where(is_tri, ta1g, sa1g)
                a1b = jnp.where(is_tri, ta1b, sa1b)
                tscale = jnp.where(is_tri, tscale_t, sscale)
                is_check = ((is_tri & t_check)
                            | (~is_tri & (stextype == 1.0)))
        elif ns:
            nxv = (px - scx) * sinvr
            nyv = (py - scy) * sinvr
            nzv = (pz - scz) * sinvr
            param = sparam
            a0r, a0g, a0b = sa0r, sa0g, sa0b
            is_metal = smtype == 1.0
            is_diel = smtype == 2.0
            if has_checker:
                a1r, a1g, a1b, tscale = sa1r, sa1g, sa1b, sscale
                is_check = stextype == 1.0
        else:
            nxv, nyv, nzv = tnx, tny, tnz
            param = tparam
            a0r, a0g, a0b = ta0r, ta0g, ta0b
            is_metal, is_diel = t_metal, t_diel
            if has_checker:
                a1r, a1g, a1b, tscale = ta1r, ta1g, ta1b, tscale_t
                is_check = t_check
        fuzz = ref_idx = param

        # ---- scatter (megakernel's, verbatim) ----
        bz = 1.0 - 2.0 * u1
        br = jnp.sqrt(jnp.maximum(0.0, 1.0 - bz * bz))
        phi = f32(2.0 * math.pi) * u2
        brad = _cbrt(u3)
        balx = brad * (br * jnp.cos(phi))
        baly = brad * (br * jnp.sin(phi))
        balz = brad * bz

        lamx, lamy, lamz = _unit3(nxv + balx, nyv + baly, nzv + balz,
                                  eps=1e-20)

        ddn2 = dx * nxv + dy * nyv + dz * nzv
        refx = dx - 2.0 * ddn2 * nxv
        refy = dy - 2.0 * ddn2 * nyv
        refz = dz - 2.0 * ddn2 * nzv
        mrx = refx + fuzz * balx
        mry = refy + fuzz * baly
        mrz = refz + fuzz * balz
        metal_ok = (mrx * nxv + mry * nyv + mrz * nzv) > 0.0
        metx, mety, metz = _unit3(mrx, mry, mrz, eps=1e-20)

        outside = ddn2 > 0.0
        ownx = jnp.where(outside, -nxv, nxv)
        owny = jnp.where(outside, -nyv, nyv)
        ownz = jnp.where(outside, -nzv, nzv)
        ni = jnp.where(outside, ref_idx, _recip(ref_idx))
        cosine = jnp.where(outside, ref_idx * ddn2, -ddn2)
        uvx, uvy, uvz = _unit3(dx, dy, dz)
        dt = uvx * ownx + uvy * owny + uvz * ownz
        disc2 = 1.0 - ni * ni * (1.0 - dt * dt)
        can = disc2 > 0
        sq2 = jnp.sqrt(jnp.where(can, disc2, 0.0))
        rfx = jnp.where(can, ni * (uvx - ownx * dt) - ownx * sq2, 0.0)
        rfy = jnp.where(can, ni * (uvy - owny * dt) - owny * sq2, 0.0)
        rfz = jnp.where(can, ni * (uvz - ownz * dt) - ownz * sq2, 0.0)
        r0 = (1.0 - ref_idx) * _recip(1.0 + ref_idx)
        r0 = r0 * r0
        om = 1.0 - cosine
        om2 = om * om
        schl = r0 + (1.0 - r0) * (om2 * om2 * om)
        rprob = jnp.where(can, schl, 1.0)
        use_refl = coin < rprob
        dielx = jnp.where(use_refl, refx, rfx)
        diely = jnp.where(use_refl, refy, rfy)
        dielz = jnp.where(use_refl, refz, rfz)

        if has_checker:
            sines = (jnp.sin(tscale * px) * jnp.sin(tscale * py)
                     * jnp.sin(tscale * pz))
            odd = sines < 0.0
            texr = jnp.where(is_check & odd, a1r, a0r)
            texg = jnp.where(is_check & odd, a1g, a0g)
            texb = jnp.where(is_check & odd, a1b, a0b)
        else:
            texr, texg, texb = a0r, a0g, a0b

        ndx = jnp.where(is_diel, dielx, jnp.where(is_metal, metx, lamx))
        ndy = jnp.where(is_diel, diely, jnp.where(is_metal, mety, lamy))
        ndz = jnp.where(is_diel, dielz, jnp.where(is_metal, metz, lamz))
        attr = jnp.where(is_diel, 1.0, texr)
        attg = jnp.where(is_diel, 1.0, texg)
        attb = jnp.where(is_diel, 1.0, texb)
        sok = metal_ok | ~is_metal

        cont = hit & sok & (depth < max_depth)
        if use_adj:
            # Grid cell of this bounce's hit point = the NEXT segment's
            # origin cell (phase-1 adjacency key).  Out-of-grid points
            # clamp to boundary cells; non-continuing lanes carry -1.
            cgx = jnp.clip(jnp.floor((px - glx) * gix).astype(i32), 0,
                           gdx - 1)
            cgy = jnp.clip(jnp.floor((py - gly) * giy).astype(i32), 0,
                           gdy - 1)
            cgz = jnp.clip(jnp.floor((pz - glz) * giz).astype(i32), 0,
                           gdz - 1)
            ocell = jnp.where(cont, (cgx * gdy + cgy) * gdz + cgz, -1)
        miss_now = active & ~hit
        skyt = 0.5 * (dy + 1.0)
        rx = rx + jnp.where(miss_now, tpx * ((1.0 - skyt) + skyt * 0.5), 0.0)
        ry = ry + jnp.where(miss_now, tpy * ((1.0 - skyt) + skyt * 0.7), 0.0)
        rz = rz + jnp.where(miss_now, tpz * ((1.0 - skyt) + skyt * 1.0), 0.0)

        tpx = jnp.where(cont, tpx * attr, tpx)
        tpy = jnp.where(cont, tpy * attg, tpy)
        tpz = jnp.where(cont, tpz * attb, tpz)
        ox = jnp.where(cont, px, ox)
        oy = jnp.where(cont, py, oy)
        oz = jnp.where(cont, pz, oz)
        dx = jnp.where(cont, ndx, dx)
        dy = jnp.where(cont, ndy, dy)
        dz = jnp.where(cont, ndz, dz)
        depth = jnp.where(cont, depth + 1, depth)
        segs = segs + jnp.where(active, 1, 0)

        term = active & ~cont
        samp_new = jnp.where(term, samp + 1, samp)
        crossed = term & (samp_new % spp == 0)
        j_cur = sampc // spp
        j_eff = jnp.where(crossed, j_cur, K)
        ohf = (iota_k == j_eff).astype(f32)
        rad_ref[0:K, :] = rad_ref[0:K, :] + ohf * rx
        rad_ref[K:2 * K, :] = rad_ref[K:2 * K, :] + ohf * ry
        rad_ref[2 * K:3 * K, :] = rad_ref[2 * K:3 * K, :] + ohf * rz
        rx = jnp.where(crossed, 0.0, rx)
        ry = jnp.where(crossed, 0.0, ry)
        rz = jnp.where(crossed, 0.0, rz)

        _, next_valid = pixel_of(jnp.minimum(samp_new, S - 1))
        samp = jnp.where(term & ~next_valid, S, samp_new)
        regen = term & (samp < S)
        cox, coy, coz, cdx, cdy, cdz = camera_ray(
            jnp.minimum(samp, S - 1), ju, jv, lu, lv)
        ox = jnp.where(regen, cox, ox)
        oy = jnp.where(regen, coy, oy)
        oz = jnp.where(regen, coz, oz)
        dx = jnp.where(regen, cdx, dx)
        dy = jnp.where(regen, cdy, dy)
        dz = jnp.where(regen, cdz, dz)
        tpx = jnp.where(regen, 1.0, tpx)
        tpy = jnp.where(regen, 1.0, tpy)
        tpz = jnp.where(regen, 1.0, tpz)
        depth = jnp.where(regen, 0, depth)
        return (it + 1, samp, depth, ox, oy, oz, dx, dy, dz,
                tpx, tpy, tpz, rx, ry, rz, segs, ocell)

    max_it = S * (max_depth + 1) + 2

    def cond(carry):
        return (carry[0] < max_it) & jnp.any(carry[1] < S)

    init = (jnp.int32(0), samp0, jnp.zeros((1, T), jnp.int32),
            ox, oy, oz, dx, dy, dz, one, one, one, zero, zero, zero,
            jnp.zeros((1, T), jnp.int32),
            jnp.full((1, T), -1, jnp.int32))

    def body_x(carry):
        for _ in range(unroll):
            carry = body(carry)
        return carry

    final = jax.lax.while_loop(cond, body_x, init)
    seg_ref[0, :] = final[15][0, :]
    it_ref[0, :] = jnp.full((T,), final[0], jnp.int32)
    swp_ref[0:1, :] = acc_ref[17:18, :].astype(jnp.int32)


def _tile_geometry(nx, ny, tile, k_pix, tile_w):
    """2D tile grid: (k_pix, tile_w, tile_h, grid_w, grid_h, n_tiles).

    ``tile_w`` must be a power of two dividing ``tile``; it is shrunk to
    the image width's scale for tiny (test) images so the grid stays
    sensible.
    """
    k_pix = -(-k_pix // 8) * 8          # flush-block row alignment
    if tile_w & (tile_w - 1) or tile % tile_w:
        raise ValueError(f"tile_w {tile_w} must be a power of two "
                         f"dividing tile {tile}")
    while tile_w > 8 and tile_w > nx:
        tile_w //= 2
    tile_h = (k_pix * tile) // tile_w
    grid_w = -(-nx // tile_w)
    grid_h = -(-ny // tile_h)
    return k_pix, tile_w, tile_h, grid_w, grid_h, grid_w * grid_h


@functools.lru_cache(maxsize=32)
def _unpack_perm(nx, ny, tile, k_pix, tile_w, tile_h, grid_w, n_tiles):
    """rect: pixel -> flat (tile, j, lane) position in the output."""
    y, x = np.mgrid[0:ny, 0:nx]
    g = (y // tile_h) * grid_w + (x // tile_w)
    loc = (y % tile_h) * tile_w + (x % tile_w)
    j = loc // tile
    lane = loc % tile
    pos = (g * k_pix + j) * tile + lane
    return jnp.asarray(pos.reshape(-1), jnp.int32)


@functools.lru_cache(maxsize=32)
def _unpack_perm_stride(total_pixels, tile, k_pix, lanes_total):
    """stride: pixel -> flat position; pix = g*T + lane + j*L."""
    pix = np.arange(total_pixels, dtype=np.int64)
    j = pix // lanes_total
    lane_glob = pix % lanes_total
    g = lane_glob // tile
    lane = lane_glob % tile
    pos = (g * k_pix + j) * tile + lane
    return jnp.asarray(pos, jnp.int32)


@functools.lru_cache(maxsize=32)
def _unpack_perm_band(total_pixels, tile, k_pix):
    """band: pixel -> flat position; pix = g*K*T + j*T + lane."""
    pix = np.arange(total_pixels, dtype=np.int64)
    blk = tile * k_pix
    g = pix // blk
    rem = pix % blk
    j = rem // tile
    lane = rem % tile
    pos = (g * k_pix + j) * tile + lane
    return jnp.asarray(pos, jnp.int32)


def _mega_clustered_call(cam, key, pix0, boxes, sboxes, tboxes, tsboxes,
                         adj, sph, mx,
                         tri, *,
                         nx, ny,
                         spp, max_depth, t_min, ns, nt, kc, kt=1,
                         tri_groups=None,
                         has_checker=False, tile0=0, n_tiles=None,
                         total_pixels=None, spp_total=None,
                         interpret=False, tile=TILE, k_pix=PIX_PER_LANE,
                         tile_w=128, unroll=2, margin=0.0,
                         gate_mode="slab", mapping="band",
                         lanes_total=None, grid_lo=(0.0, 0.0, 0.0),
                         grid_inv=(1.0, 1.0, 1.0), grid_dims=(1, 1, 1),
                         super_spans=((0, 1),),
                         tri_super_spans=((0, 1),), emit_tape=False):
    """Launch over ``n_tiles`` 2D pixel tiles starting at ``tile0``.

    Returns the raw (3K, lanes) radiance blocks (use ``_unpack_perm`` to
    assemble an image), per-lane segment counts, and per-lane trip
    counts.  ``tile0``/``n_tiles`` are the sharding hook: each device
    renders a contiguous range of tiles with globally-keyed RNG.
    """
    if not t_min > 0.0:
        raise ValueError(f"clustered megakernel requires t_min > 0")
    if total_pixels is None:
        total_pixels = nx * ny
    if spp_total is None:
        spp_total = spp
    k_pix, tile_w, tile_h, grid_w, grid_h, all_tiles = _tile_geometry(
        nx, ny, tile, k_pix, tile_w)
    if mapping in ("stride", "band"):
        all_tiles = max(1, -(-total_pixels // (tile * k_pix)))
    if n_tiles is None:
        n_tiles = all_tiles
    if lanes_total is None:
        lanes_total = all_tiles * tile
    if pix0 is None:
        pix0 = jnp.asarray([[tile0, 0]], jnp.int32)
    lanes = n_tiles * tile
    grid = (n_tiles,)
    kernel = functools.partial(
        _mega_clustered_kernel, nx=nx, ny=ny, spp=spp, max_depth=max_depth,
        t_min=t_min, tile_w=tile_w, grid_w=grid_w,
        total_pixels=total_pixels,
        spp_total=spp_total, ns=ns, nt=nt, kc=kc, kt=kt, tile=tile,
        k_pix=k_pix,
        unroll=1 if interpret else unroll,
        has_checker=has_checker, margin=margin, gate_mode=gate_mode,
        mapping=mapping, lanes_total=lanes_total, grid_lo=grid_lo,
        grid_inv=grid_inv, grid_dims=grid_dims, super_spans=super_spans,
        tri_super_spans=tri_super_spans, emit_tape=emit_tape)
    rpad_t = -(-(k_pix * spp * (max_depth + 1)) // 8) * 8
    extra_specs = ()
    extra_shapes = ()
    if emit_tape:
        extra_specs = (pl.BlockSpec((rpad_t, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),)
        extra_shapes = (jax.ShapeDtypeStruct((rpad_t, lanes),
                                             jnp.float32),)
    # gate_mode="wl" support arrays (tiny; built here so every gate mode
    # shares one pallas signature): span table in SMEM, supergroup boxes
    # as a SUBLANE-major VMEM block padded with inverted (never-gating)
    # boxes, and the exact power-of-two half-word weights.
    ks = len(super_spans)
    ks_pad = max(-(-ks // 16) * 16, 16)
    span_arr = jnp.zeros((ks_pad, 2), jnp.int32).at[:ks].set(
        jnp.asarray(super_spans, jnp.int32))
    sboxv = jnp.concatenate([
        jnp.full((ks_pad, 3), jnp.float32(_BIG)),
        jnp.full((ks_pad, 3), jnp.float32(-_BIG)),
        jnp.zeros((ks_pad, 2), jnp.float32)], axis=1)
    sboxv = sboxv.at[:ks].set(sboxes[:ks].astype(jnp.float32))
    w16 = jnp.asarray([[float(1 << b)] for b in range(16)], jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cluster boxes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # supergroup boxes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tri cluster boxes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tri super boxes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # super spans (wl)
            pl.BlockSpec((adj.shape[0], adj.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # cell->cluster adj
            pl.BlockSpec((ks_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # super boxes (wl)
            pl.BlockSpec((16, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # half-word weights
            pl.BlockSpec((sph.shape[0], sph.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mx.shape[0], mx.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tri.shape[0], tri.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3 * k_pix, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ) + extra_specs,
        out_shape=(
            jax.ShapeDtypeStruct((3 * k_pix, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, lanes), jnp.int32),
        ) + extra_shapes,
        scratch_shapes=[pltpu.VMEM((40, tile), jnp.float32)],
        interpret=interpret,
    )(cam, key, pix0, boxes, sboxes, tboxes, tsboxes, span_arr, adj,
      sboxv, w16, sph, mx, tri)
    return outs


_mega_clustered_jit = jax.jit(
    _mega_clustered_call,
    static_argnames=("nx", "ny", "spp", "max_depth", "t_min", "ns", "nt",
                     "kc", "kt", "tri_groups", "has_checker", "tile0",
                     "n_tiles",
                     "total_pixels", "spp_total", "interpret", "tile",
                     "k_pix", "tile_w", "unroll", "margin", "gate_mode",
                     "mapping", "lanes_total", "grid_lo", "grid_inv",
                     "grid_dims", "super_spans", "tri_super_spans",
                     "emit_tape"))


@functools.partial(jax.jit, static_argnames=("k_pix", "n_tiles", "tile"))
def _assemble(rad, perm, k_pix, n_tiles, tile):
    flat = (rad.reshape(3, k_pix, n_tiles, tile).transpose(2, 1, 3, 0)
            .reshape(-1, 3))
    return flat[perm]


def render_pixels_mega_clustered(pack: MegaClusteredPack, camera, cfg, key,
                                 interpret: bool = False, tile: int = TILE,
                                 k_pix: int = PIX_PER_LANE,
                                 tile_w: int = 128,
                                 return_iters: bool = False,
                                 unroll: int = 2, gate_mode: str = "wl",
                                 mapping: str = "band"):
    """Render all pixels; returns (radiance_sum (P, 3), segments (L,)).

    ``return_iters`` additionally returns per-tile bounce-loop trips and
    per-tile executed cluster-sweep counts (gate diagnostics).
    """
    cam = _cam_smem(camera)
    key = jnp.asarray(key, jnp.uint32).reshape(1, 2)
    # The adjacency table is only read by gate_mode="adj" (a recorded
    # negative result); ship a dummy block otherwise so the default
    # path neither uploads nor VMEM-resides the (cells x clusters) table.
    adj_in = pack.adj if gate_mode == "adj" else _dummy_adj()
    rad, seg, its, swp = _mega_clustered_jit(
        cam, key, None, pack.boxes, pack.super_boxes, pack.tri_boxes,
        pack.tri_super_boxes, adj_in, pack.sph,
        pack.sph_mx, pack.tris,
        nx=cfg.nx, ny=cfg.ny, spp=cfg.spp, max_depth=cfg.max_depth,
        t_min=float(cfg.t_min), ns=pack.sphere_rows, nt=pack.tri_rows,
        kc=pack.clusters, kt=pack.tri_clusters,
        has_checker=pack.has_checker, interpret=interpret, tile=tile,
        k_pix=k_pix, tile_w=tile_w, unroll=unroll,
        margin=pack.phase1_margin, gate_mode=gate_mode, mapping=mapping,
        grid_lo=pack.grid_lo, grid_inv=pack.grid_inv,
        grid_dims=pack.grid_dims, super_spans=pack.super_spans,
        tri_super_spans=pack.tri_super_spans)
    kp, tw, th, gw, gh, n_tiles = _tile_geometry(cfg.nx, cfg.ny, tile,
                                                 k_pix, tile_w)
    total = cfg.num_pixels
    if mapping in ("stride", "band"):
        n_tiles = max(1, -(-total // (tile * kp)))
        perm = (_unpack_perm_stride(total, tile, kp, n_tiles * tile)
                if mapping == "stride"
                else _unpack_perm_band(total, tile, kp))
    else:
        perm = _unpack_perm(cfg.nx, cfg.ny, tile, kp, tw, th, gw, n_tiles)
    pix_rad = _assemble(rad, perm, kp, n_tiles, tile)
    if return_iters:
        return pix_rad, seg[0], its[0, ::tile], swp[0, ::tile]
    return pix_rad, seg[0]


def render_image_mega_clustered_sharded(scene, camera, cfg, mesh,
                                        seed: int = 0,
                                        interpret: bool = False,
                                        tile: int = TILE,
                                        k_pix: int = PIX_PER_LANE,
                                        gate_mode: str = "wl"):
    """Mesh-sharded clustered-megakernel render; (ny, nx, 3), top-down.

    Data-parallel over the mesh's ``tiles`` axis exactly like
    ``megakernel.render_image_mega_sharded``, except the unit of
    distribution is the 2D pixel tile: each device renders a contiguous
    RANGE of tiles (the kernel's ``tile0`` offset keeps RNG and camera
    globally keyed, so the image is bit-identical to the single-device
    render); cluster tables, boxes and camera replicated; the only
    collective is the output all-gather implied by the ``P(TILE_AXIS)``
    out-spec.  Devices whose trailing tiles fall past the image render
    nothing for them (every lane invalid), and the assembly permutation
    never reads those positions.
    """
    from functools import partial as _partial

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..core import rng
    from ..parallel.mesh import TILE_AXIS

    pack = pack_scene_mega_clustered(scene, sort_from=camera.origin)
    key = jnp.asarray(rng.base_key(seed), jnp.uint32).reshape(1, 2)
    cam = _cam_smem(camera)
    n_shards = mesh.shape[TILE_AXIS]
    kp, tw, th, gw, gh, _ = _tile_geometry(cfg.nx, cfg.ny, tile, k_pix,
                                           128)
    total = cfg.num_pixels
    # stride mapping: tiles cover lane ranges; the global lane count must
    # include shard padding so every device agrees on the pixel stride.
    all_tiles = max(1, -(-total // (tile * kp)))
    t_local = -(-all_tiles // n_shards)
    lanes_total = n_shards * t_local * tile

    @_partial(jax.jit, static_argnames=())
    @_partial(shard_map, mesh=mesh,
              in_specs=(P(),) * 10,
              out_specs=P(None, TILE_AXIS), check_vma=False)
    def run(cam, key, boxes, sboxes, tboxes, tsboxes, adj, sph, mx, tri):
        idx = jax.lax.axis_index(TILE_AXIS)
        pix0 = jnp.stack([idx * t_local,
                          jnp.zeros((), jnp.int32)]).reshape(1, 2)
        rad, _, _, _ = _mega_clustered_call(
            cam, key, pix0, boxes, sboxes, tboxes, tsboxes, adj, sph, mx,
            tri, nx=cfg.nx,
            ny=cfg.ny,
            spp=cfg.spp, max_depth=cfg.max_depth, t_min=float(cfg.t_min),
            ns=pack.sphere_rows, nt=pack.tri_rows, kc=pack.clusters,
            kt=pack.tri_clusters, has_checker=pack.has_checker,
            n_tiles=t_local, interpret=interpret, tile=tile, k_pix=kp,
            margin=pack.phase1_margin, mapping="band",
            gate_mode=gate_mode,
            lanes_total=lanes_total, grid_lo=pack.grid_lo,
            grid_inv=pack.grid_inv, grid_dims=pack.grid_dims,
            super_spans=pack.super_spans,
            tri_super_spans=pack.tri_super_spans)
        return rad

    adj_in = pack.adj if gate_mode == "adj" else _dummy_adj()
    rad = run(cam, key, pack.boxes, pack.super_boxes, pack.tri_boxes,
              pack.tri_super_boxes, adj_in, pack.sph,
              pack.sph_mx, pack.tris)
    g_total = n_shards * t_local
    perm = _unpack_perm_band(total, tile, kp)
    pix_rad = _assemble(rad, perm, kp, g_total, tile)
    img = (pix_rad / cfg.spp).reshape(cfg.ny, cfg.nx, 3)
    return img[::-1]


def render_image_mega_clustered(scene, camera, cfg, seed: int = 0,
                                interpret: bool = False, tile: int = TILE,
                                k_pix: int = PIX_PER_LANE):
    """Full-image clustered-megakernel render; (ny, nx, 3), top-down.

    Same RNG stream and radiance semantics as ``render_image`` /
    ``render_image_mega``; clusters sorted front-to-back from the camera.
    """
    from ..core import rng

    pack = pack_scene_mega_clustered(scene, sort_from=camera.origin)
    key = rng.base_key(seed)
    rad, _ = render_pixels_mega_clustered(pack, camera, cfg, key,
                                          interpret=interpret, tile=tile,
                                          k_pix=k_pix)
    img = (rad / cfg.spp).reshape(cfg.ny, cfg.nx, 3)
    return img[::-1]
