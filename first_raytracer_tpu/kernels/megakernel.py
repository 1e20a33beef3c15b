"""Pallas TPU megakernel: the entire path tracer in one kernel.

The wavefront integrators (render/integrator.py, render/regenerative.py)
re-architect the reference's recursive ``color()`` [E: main.cpp]
(SURVEY.md §3.2) as XLA-orchestrated bounce passes.  Profiling on the real
chip shows the per-bounce *XLA glue* — material-table gathers in
``recompute_hit``/``scatter``, the compaction scatters, the radiance
scatter-add, the RNG/camera ops — costs ~5x the fused intersect kernel
itself.  This module removes all of it: one ``pallas_call`` traces every
sample of every pixel to termination.

Design (persistent lanes — the TPU analog of GPU persistent-threads
megakernels):

- Each kernel *lane* owns ``K`` pixels in a **grid-stride** pattern
  (lane ``l`` of tile ``g`` owns pixels ``g*T + l + j*L`` for
  ``j < K``, ``L`` = total lanes) and serially traces their
  ``K * spp`` samples; when a sample terminates (miss -> sky,
  absorption, depth cap) the lane immediately regenerates its next
  camera ray **in-kernel**.  There is no cross-lane communication, so no
  compaction/scatter at all.
- The grid-stride mapping is the divergence control: per-lane total
  bounce counts concentrate around the mean as ``1/sqrt(K * spp)`` and
  the stride decorrelates the spatially-clustered long paths (glass
  regions), so the all-lanes-done trip count approaches the mean lane
  load.  Measured on the final scene [BASELINE.json:8]: lane occupancy
  33% at K=1 -> 77% at K=32.
- Each lane accumulates its *current* pixel's radiance in registers and
  flushes it to the per-pixel output block on pixel-boundary crossings:
  a single (K, T) one-hot of the crossing lanes' pixel slots fused into
  three channel-major block updates — never a scatter.
- A ``lax.while_loop`` with an all-lanes-done predicate runs inside the
  kernel (data-dependent trip count, bounded by ``K * spp *
  (max_depth + 1)``).
- Scene tables ride whole in VMEM as plane-major f32 arrays with
  *pre-resolved* per-primitive material rows (the SoA's mat-id indirection
  is dereferenced on the host once per scene), so the winner's material is
  extracted with one-hot masked reductions — no gathers anywhere.
- RNG is the same counter-based Threefry-2x32-20 as ``core.rng``, computed
  on uint32 vectors in-kernel.  Draws match ``core.rng`` bit-for-bit, so
  the megakernel consumes the *identical* random sequence as the
  wavefront integrators and the oracle.

The only numerical deviation from the pure-JAX path: Mosaic has no
``cbrt`` primitive, so the ball-sample radius uses ``exp(log(u)/3)`` with
one Newton step (<=1 ulp from ``jnp.cbrt``); a rare near-silhouette sample
may diverge, which per-pixel tests bound statistically.

Forward-only by design: gradients go through the pure-JAX integrator
(diff/grad.py); this kernel is the serving/throughput path
[BASELINE.json:2 rays/s / Mpaths/s].
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

__all__ = ["pack_scene_mega", "MegaScenePack", "render_pixels_mega",
           "render_image_mega", "render_image_mega_sharded"]

_BIG = 1e30
TILE = 512
_LANE = 128
# Target pixels per lane (grid-stride): higher -> better occupancy at the
# cost of a bigger (3K, T) output block.  Re-measured on the final scene
# after the round-2 one-hot flush (which made large K ~4x cheaper):
# K=32 -> 34.4, 64 -> 37.4, 96 -> 38.3, 128 -> 37.6 Mpaths/s at unroll 2.
PIX_PER_LANE = 96

# Threefry-2x32-20 schedule — must match core.rng exactly.
_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = 0x1BD11BDA

# Sphere plane rows (16, Ns_pad):
#   0-2 center, 3 radius, 4 param (fuzz|ref_idx by group), 5-7 albedo,
#   8-10 albedo2, 11 tex_scale, 12 |C|^2-r^2 (c0, f64-exact; +inf for
#   sentinel), 15 1/radius (0 for sentinel).
#   mat/tex *types* are encoded by the group-sorted index ranges.
_SPH_ROWS = 16
# Triangle plane rows (24, Nt_pad):
#   0-2 v0, 3-5 e1, 6-8 e2, 9-11 unit normal, 12 param, 13-15 albedo,
#   16-18 albedo2, 19 tex_scale.
_TRI_ROWS = 24


def _round_up(x, m):
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class MegaScenePack:
    """Host-packed scene for the megakernel (material ids pre-resolved).

    Primitives are SORTED into material groups — (lambertian, metal,
    dielectric) x (constant, checker), six contiguous index ranges — so
    the kernel derives the winner's material/texture *type* from two
    integer compares on the winning index instead of extracting table
    rows; ``fuzz`` (metal) and ``ref_idx`` (dielectric) share one
    ``param`` row; checker rows are packed (and extracted) only when a
    checker group is non-empty.  ``sph_groups``/``tri_groups`` are the
    six cumulative group start indices + total (7 static ints each).
    """

    spheres: jax.Array  # (16, Ns_pad) f32
    sph_mx: jax.Array   # (Ns_pad, 8) f32 column table: cx cy cz |C|^2-r^2 pad
    tris: jax.Array     # (24, Nt_pad) f32
    sphere_rows: int
    tri_rows: int
    sph_groups: tuple   # 7 ints
    tri_groups: tuple
    has_checker: bool
    # Group-sort permutations (sorted index -> ORIGINAL scene index), i32,
    # shapes (Ns,)/(Nt,).  The kernels select winners in sorted index
    # space; the tape recorder (kernels/record_mega.py) maps its recorded
    # ids back through these so tapes live in the scene's id space.
    sph_order: jax.Array = None
    tri_order: jax.Array = None


jax.tree_util.register_dataclass(
    MegaScenePack,
    data_fields=("spheres", "sph_mx", "tris", "sph_order", "tri_order"),
    meta_fields=("sphere_rows", "tri_rows", "sph_groups", "tri_groups",
                 "has_checker"))


def pack_scene_mega(scene) -> MegaScenePack:
    """Repack the SoA scene with per-primitive material rows (host, once).

    Dereferencing ``sphere_mat``/``tri_mat`` here is what lets the kernel
    shade without a single gather; the reference's pointer-to-material
    indirection [E: hitable.h mat_ptr] becomes table rows.
    """
    s = scene.as_numpy() if hasattr(scene, "as_numpy") else scene
    ns, nt = s.sphere_center.shape[0], s.tri_v0.shape[0]
    ns_pad = max(_round_up(ns, _LANE), _LANE)
    nt_pad = max(_round_up(nt, _LANE), _LANE)
    mtype_all = np.asarray(s.mat_type, np.int64)
    textype_all = np.asarray(s.tex_type, np.int64)

    def group_order(mat_ids):
        """Permutation sorting primitives into the 6 (mat, tex) groups.

        Returns (order, groups): stable sort so intra-group order (and
        thus argmin tie-breaking) stays deterministic; groups = 7
        cumulative start indices g0..g5, total.
        """
        m = np.asarray(mat_ids, np.int64)
        gkey = mtype_all[m] * 2 + (textype_all[m] == 1)
        order = np.argsort(gkey, kind="stable")
        counts = np.bincount(gkey, minlength=6)
        starts = np.concatenate([[0], np.cumsum(counts)])
        return order, tuple(int(x) for x in starts)

    def mat_rows(mat_ids):
        """param (fuzz|ref_idx by mat type), albedo, albedo2, tex_scale."""
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

    has_checker = bool((textype_all == 1).any())

    sph_order_np = np.arange(ns, dtype=np.int32)
    tri_order_np = np.arange(nt, dtype=np.int32)
    sph = np.zeros((_SPH_ROWS, ns_pad), np.float32)
    sph[0:3] = _BIG  # sentinel: never-hit center, radius 0
    # Column table for the expanded quadratic: b = o.d - d.C and
    # c = |o|^2 - 2 o.C + (|C|^2 - r^2); the constant term is computed in
    # f64 so the ground sphere's |C|^2 - r^2 cancellation (sphere.py
    # docstring) is exact.  (Ns, 1)-column layout so the kernel broadcasts
    # sublane vectors against (1, T) ray rows on the VPU.
    mx = np.zeros((ns_pad, 8), np.float32)
    mx[:, 0:3] = _BIG
    sph_groups = (0,) * 7
    if ns:
        order, sph_groups = group_order(s.sphere_mat)
        sph_order_np = np.asarray(order, np.int32)
        c = np.asarray(s.sphere_center, np.float32)[order]
        r = np.asarray(s.sphere_radius, np.float32)[order]
        sph[0:3, :ns] = c.T
        sph[3, :ns] = r
        # rows 4: param, 5-7: albedo, 8-10: albedo2, 11: tex_scale
        sph[4:12, :ns] = mat_rows(np.asarray(s.sphere_mat)[order])
        # Row 13: the ORIGINAL scene index of each sorted column (f32,
        # exact < 2^24) — the emit_tape recorder extracts it with the
        # same one-hot matmul as the rest of the payload, so tapes carry
        # scene ids directly (a host-side 6.7M-element remap gather
        # measured ~55 ms on TPU).
        sph[13, :ns] = np.asarray(order, np.float32)
        sph[15, :ns] = np.where(r != 0.0, 1.0 / np.where(r != 0, r, 1.0), 0.0)
        mx[:ns, 0:3] = c
        c64 = c.astype(np.float64)
        r64 = r.astype(np.float64)
        c0 = ((c64 * c64).sum(1) - r64 * r64).astype(np.float32)
        mx[:ns, 3] = c0
        sph[12, :ns] = c0  # winner-t recompute reads c0 from the payload
    # Sentinel c0 = +inf: cq = inf -> disc = -inf or NaN -> every root
    # comparison is false -> guaranteed miss, independent of ray values
    # (3e38 left a ~1e-11-measure direction set where bq^2 could exceed
    # c0 without overflowing and fake a hit).
    mx[ns:, 3] = np.float32(np.inf)
    # Payload-table sentinel c0 must stay FINITE: the one-hot extraction
    # matmul multiplies every column by 0 or 1, and 0 * inf = NaN would
    # poison the winner's row whenever any sentinel exists.  _BIG is
    # enough: a sentinel can only win when every sphere missed, and the
    # winner-t replay on (center=_BIG, c0=_BIG) still yields miss/BIG.
    sph[12, ns:] = np.float32(_BIG)

    tri = np.zeros((_TRI_ROWS, nt_pad), np.float32)
    tri_groups = (0,) * 7
    if nt:
        order, tri_groups = group_order(s.tri_mat)
        tri_order_np = np.asarray(order, np.int32)
        v0 = np.asarray(s.tri_v0, np.float32)[order]
        e1 = np.asarray(s.tri_v1, np.float32)[order] - v0
        e2 = np.asarray(s.tri_v2, np.float32)[order] - v0
        n = np.cross(e1, e2)
        nn = np.linalg.norm(n, axis=1, keepdims=True)
        n = n / np.where(nn > 0, nn, 1.0)
        tri[0:3, :nt] = v0.T
        tri[3:6, :nt] = e1.T
        tri[6:9, :nt] = e2.T
        tri[9:12, :nt] = n.T
        # rows 12: param, 13-15: albedo, 16-18: albedo2, 19: tex_scale
        tri[12:20, :nt] = mat_rows(np.asarray(s.tri_mat)[order])
        # Row 20: global ORIGINAL id (ns + tri index) for emit_tape.
        tri[20, :nt] = (ns + np.asarray(order)).astype(np.float32)
    return MegaScenePack(spheres=jnp.asarray(sph), sph_mx=jnp.asarray(mx),
                         tris=jnp.asarray(tri), sphere_rows=ns, tri_rows=nt,
                         sph_groups=sph_groups, tri_groups=tri_groups,
                         has_checker=has_checker,
                         sph_order=jnp.asarray(sph_order_np),
                         tri_order=jnp.asarray(tri_order_np))


def _threefry2x32(k0, k1, c0, c1):
    """Vectorized Threefry-2x32-20 (uint32 in/out) — mirrors core.rng."""
    u32 = jnp.uint32
    ks0, ks1 = k0, k1
    ks2 = ks0 ^ ks1 ^ u32(_PARITY)
    x0 = c0 + ks0
    x1 = c1 + ks1

    def rotl(x, r):
        return (x << u32(r)) | (x >> u32(32 - r))

    ks = (ks0, ks1, ks2)
    for g in range(5):
        for j in range(4):
            x0 = x0 + x1
            x1 = rotl(x1, _ROTATIONS[(4 * g + j) % 8])
            x1 = x1 ^ x0
        x0 = x0 + ks[(g + 1) % 3]
        x1 = x1 + ks[(g + 2) % 3] + u32(g + 1)
    return x0, x1


def _bits_to_unit(bits):
    """uint32 -> f32 in [0,1): top 24 bits, identical to core.rng."""
    return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(
        jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _unit3(x, y, z, eps=0.0):
    """Normalize a 3-vector in component form (mirrors vecmath.normalize).

    Uses ``lax.rsqrt`` — f32 division lowers to a slow Mosaic sequence
    (measured ~30% of whole-kernel time across the normalize call sites);
    rsqrt differs from 1/sqrt by ~1 ulp, within the kernel's tolerance.
    """
    n2 = x * x + y * y + z * z
    if eps:
        n2 = jnp.maximum(n2, eps)
    inv = jnp.where(n2 > 0, jax.lax.rsqrt(jnp.where(n2 > 0, n2, 1.0)), 0.0)
    return x * inv, y * inv, z * inv


def _recip(x):
    """1/x without a divide (sign-preserving rsqrt(x^2)); ~1 ulp off."""
    r = jax.lax.rsqrt(x * x)
    return jnp.where(x < 0, -r, r)


def _cbrt(x):
    """cbrt on [0,1) via exp/log (no Mosaic cbrt; ~2 ulp)."""
    y = jnp.exp(jnp.log(jnp.maximum(x, 1e-36)) * (1.0 / 3.0))
    return jnp.where(x > 0, y, 0.0)


def _mega_kernel(cam_ref, key_ref, pix0_ref, sph_ref, mx_ref, tri_ref,
                 rad_ref, seg_ref, it_ref, *refs,
                 nx, ny, spp, max_depth, t_min,
                 num_pixels, total_pixels, spp_total, ns, nt, tile, k_pix,
                 lanes, unroll, sph_groups, tri_groups, has_checker,
                 emit_tape=False):
    # With ``emit_tape`` a fourth output ref records the winning sorted
    # primitive id per (sample-slot, depth): the record->replay gradient
    # pass's tape, produced at megakernel speed (the standalone recorder
    # kernel's apparent cliff was a host-graph gather — ROADMAP.md; the
    # write grafted here costs ~8%).  The block height is K*spp*(D+1)
    # rows, so the wrapper bounds spp per sweep to keep it within VMEM
    # (record_mega._record_mega2 picks the batch size).
    tape_ref = refs[0] if emit_tape else None
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    T = tile
    K = k_pix
    L = lanes            # total lanes across the grid (= G * T)
    S = K * spp          # samples per lane
    step = pl.program_id(0)
    lane = step * T + jax.lax.broadcasted_iota(i32, (1, T), 1)
    pix0 = pix0_ref[0, 0]  # global pixel offset of this shard (0 unsharded)
    spp0 = pix0_ref[0, 1]  # global sample offset (progressive batches)
    k0 = key_ref[0, 0]
    k1 = key_ref[0, 1]

    # Camera frame scalars (SMEM).
    co = [cam_ref[0, k] for k in range(3)]       # origin
    ll = [cam_ref[0, 3 + k] for k in range(3)]   # lower_left
    hz = [cam_ref[0, 6 + k] for k in range(3)]   # horizontal
    vt = [cam_ref[0, 9 + k] for k in range(3)]   # vertical
    cu = [cam_ref[0, 12 + k] for k in range(3)]  # lens u
    cv = [cam_ref[0, 15 + k] for k in range(3)]  # lens v
    lens_r = cam_ref[0, 18]

    # Integer div/mod lower to very slow Mosaic sequences (measured ~59%
    # of whole-kernel time); all decodes below use exact float-reciprocal
    # arithmetic instead.  Safe because every quantity is < 2^24 (exact in
    # f32) and the +0.5 bias keeps floor() away from the integer boundary
    # by >> the f32 rounding error.
    def _fdiv(a, b_inv, b):
        """floor(a / b) for 0 <= a < 2^24, b static; returns i32."""
        q = jnp.floor((a.astype(f32) + 0.5) * f32(b_inv)).astype(i32)
        return q

    def _fdiv_exact(a, b_inv, b):
        """_fdiv + one remainder-correction step: exact for any
        a < 2^24 even where the f32 product's ulp exceeds the +0.5 bias
        margin (pixel ids beyond ~2^22 — large images)."""
        q = _fdiv(a, b_inv, b)
        r = a - q * b
        return q - (r < 0).astype(i32) + (r >= b).astype(i32)

    def pixel_of(s):
        """Grid-stride *global* pixel for a lane's sample counter.

        ``num_pixels`` is this shard's local pixel count; the returned id
        is global (``pix0`` offset), which keys the RNG and the camera so
        a sharded render is bit-identical to the single-device one.
        """
        loc = lane + _fdiv(s, 1.0 / spp, spp) * L
        pix = pix0 + loc
        valid = (loc < num_pixels) & (pix < total_pixels)
        return jnp.minimum(pix, total_pixels - 1), valid

    def ray_id(s):
        """Global ray id: sample ``spp0 + rem`` of pixel ``pixc`` in a
        ``spp_total``-samples-per-pixel id space (== spp/0 unbatched)."""
        pixc, _ = pixel_of(s)
        rem = s - _fdiv(s, 1.0 / spp, spp) * spp
        return (pixc * spp_total + (spp0 + rem)).astype(u32)

    def camera_ray(s, ju, jv, lu, lv):
        """Mirrors render.camera.generate_rays + rng.unit_disk_sample."""
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
        """The 4 uniforms of one RNG domain: two threefry evaluations.

        Matches core.rng._uniforms: words (a0, a1, b0, b1) from counters
        (id, dom*2) and (id, dom*2 + 1).
        """
        a0, a1 = _threefry2x32(k0, k1, c0, dom2)
        b0, b1 = _threefry2x32(k0, k1, c0, dom2 + u32(1))
        return (_bits_to_unit(a0), _bits_to_unit(a1),
                _bits_to_unit(b0), _bits_to_unit(b1))

    # Zero the output block (lanes whose pixels are all invalid never
    # flush into some rows).
    rad_ref[:, :] = jnp.zeros((3 * K, T), f32)
    if emit_tape:
        D_t = max_depth + 1
        rpad_t = tape_ref.shape[0]
        tape_ref[:, :] = jnp.zeros((rpad_t, T), f32)
        iota_r = jax.lax.broadcasted_iota(i32, (rpad_t, T), 0)

    # Packed closest-hit selection: candidate t's are positive f32, so
    # their int32 bit patterns order identically; clearing the low
    # index-width mantissa bits and OR-ing in the primitive index turns
    # min+argmin (two sublane reductions, argmin the pricier) into ONE
    # integer min.  The truncated t is discarded — the winner's exact t
    # is recomputed from its extracted payload rows (same arithmetic as
    # the sweep, ~20 ops on (1, T) ~ 1/Ns of a sweep op).  Selection can
    # differ from true argmin only for t's equal within 2^-(24-idx_bits)
    # relative (near-coincident surfaces), where either candidate is a
    # legitimate closest hit.  The iotas are hoisted out of the bounce
    # loop.
    ns_pad = mx_ref.shape[0] if ns else 0
    nt_pad = tri_ref.shape[1] if nt else 0
    if ns:
        idx_bits_s = max((ns_pad - 1).bit_length(), 1)
        iota_s = jax.lax.broadcasted_iota(i32, (ns_pad, T), 0)
    if nt:
        idx_bits_t = max((nt_pad - 1).bit_length(), 1)
        iota_t = jax.lax.broadcasted_iota(i32, (nt_pad, T), 0)

    def packed_min(tall, iota, idx_bits):
        hi = jnp.int32(-(1 << idx_bits))  # ~((1 << idx_bits) - 1)
        packed = (jax.lax.bitcast_convert_type(tall, i32) & hi) | iota
        pm = jnp.min(packed, axis=0)[None, :]
        return pm & jnp.int32((1 << idx_bits) - 1), pm

    def exact_min(tall, iota, npad):
        """Exact (min t, min index) selection — two sublane reductions.

        ~3 extra (Np, T) ops over packed_min; used on the emit_tape
        (recorder) path so the production tape never carries packed-min's
        truncated-t tie flips (the ~0.5% coplanar-triangle divergence vs
        the wavefront recorders — VERDICT r4 item 7).  The render path
        keeps packed_min: either candidate of a truncated tie is a
        legitimate closest hit for radiance, and packed_min is cheaper.
        """
        t_cl = jnp.min(tall, axis=0)[None, :]
        return jnp.min(jnp.where(tall == t_cl, iota, i32(npad)),
                       axis=0)[None, :]

    iota_k = jax.lax.broadcasted_iota(i32, (K, T), 0)

    # --- init: sample 0 camera rays ---
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
         tpx, tpy, tpz, rx, ry, rz, segs) = carry
        active = samp < S
        sampc = jnp.minimum(samp, S - 1)
        rid = ray_id(sampc)
        dom2 = (depth + 1).astype(u32) * u32(2)

        # Bounce-domain draws + next-sample camera draws.
        u1, u2, u3, coin = draws4(rid, dom2)
        nrid = ray_id(jnp.minimum(sampc + 1, S - 1))
        ju, jv, lu, lv = draws4(nrid, jnp.zeros_like(nrid))

        # ---- intersect: dense sweep, sphere part [E: sphere.h hit] ----
        # Expanded quadratic: b = o.d - d.C, c = |o|^2 - 2 o.C + c0 with
        # c0 = |C|^2 - r^2 prepacked in f64 (exact for the huge ground
        # sphere).  The cross terms are plain f32 VPU broadcasts of the
        # (Ns, 1) center columns against the (1, T) ray rows: measured
        # FASTER than the earlier MXU formulation (f32 dot_general at
        # HIGHEST lowers to a 6-pass bf16x6 matmul with the K=8
        # contraction padded to 128 — ~2/3 of the whole iteration's time
        # for two matmuls), and exactly-rounded f32 instead of bf16x6.
        # The MXU is left free for the payload-extraction matmul below,
        # which then overlaps with this VPU sweep.
        t_s = jnp.full((1, T), f32(_BIG))
        ps = jnp.zeros((1, T), i32)
        od = ox * dx + oy * dy + oz * dz            # (1, T)
        oo = ox * ox + oy * oy + oz * oz
        if ns:
            cx = mx_ref[:, 0:1]
            cy = mx_ref[:, 1:2]
            cz = mx_ref[:, 2:3]
            c0 = mx_ref[:, 3:4]
            dc = cx * dx + cy * dy + cz * dz         # (Ns_pad, T) d.C
            oc_ = cx * ox + cy * oy + cz * oz        # (Ns_pad, T) o.C
            bq = od - dc
            cq = oo - 2.0 * oc_ + c0
            disc = bq * bq - cq
            sq = jnp.sqrt(disc)      # NaN on miss; all compares false
            tn = -bq - sq
            tf_ = sq - bq
            nok = tn > t_min
            fok = tf_ > t_min
            tall = jnp.where(nok, tn, jnp.where(fok, tf_, f32(_BIG)))
            ps = (exact_min(tall, iota_s, ns_pad) if emit_tape
                  else packed_min(tall, iota_s, idx_bits_s)[0])

        t_t = jnp.full((1, T), f32(_BIG))
        pt = jnp.zeros((1, T), i32)
        if nt:
            v0x = tri_ref[0, :][:, None]
            v0y = tri_ref[1, :][:, None]
            v0z = tri_ref[2, :][:, None]
            e1x = tri_ref[3, :][:, None]
            e1y = tri_ref[4, :][:, None]
            e1z = tri_ref[5, :][:, None]
            e2x = tri_ref[6, :][:, None]
            e2y = tri_ref[7, :][:, None]
            e2z = tri_ref[8, :][:, None]
            px_ = dy * e2z - dz * e2y
            py_ = dz * e2x - dx * e2z
            pz_ = dx * e2y - dy * e2x
            det = e1x * px_ + e1y * py_ + e1z * pz_
            ok = jnp.abs(det) > 1e-9
            inv = jnp.where(ok, _recip(jnp.where(ok, det, 1.0)), 0.0)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            uu = (tvx * px_ + tvy * py_ + tvz * pz_) * inv
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv
            hitm = (ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > t_min) & (tt < _BIG))
            tallt = jnp.where(hitm, tt, f32(_BIG))
            pt = (exact_min(tallt, iota_t, nt_pad) if emit_tape
                  else packed_min(tallt, iota_t, idx_bits_t)[0])

        # ---- payload: one-hot extraction of the winner's rows ----
        # One (C, Np) x (Np, T) one-hot matmul on the MXU replaces the
        # per-row multiply+reduce VPU sweeps.  HIGHEST precision makes the
        # selection exact (bf16x3 decomposition reconstructs each f32
        # exactly; the single nonzero one-hot column sums losslessly).
        # Row slices are taken as (1, T) sub-blocks (k:k+1), never as
        # vector-reshape, which is what tripped Mosaic's "Sublane
        # broadcast" hole in the earlier attempt.  Material/texture
        # *types* are not extracted at all: primitives are group-sorted
        # (see MegaScenePack), so the winner's type falls out of index
        # compares against the static group boundaries.
        def extract_tbl(ref, oh):
            return jax.lax.dot_general(
                ref[:, :], oh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)  # (rows, T)

        def pick(res, rows):
            return [res[k:k + 1, :] for k in rows]

        def group_masks(w, g):
            """(is_metal, is_diel, is_check) from winner index w."""
            metal = ((w >= g[2]) & (w < g[4])) if g[4] > g[2] else None
            diel = (w >= g[4]) if g[6] > g[4] else None
            check = None
            for lo, hi in ((g[1], g[2]), (g[3], g[4]), (g[5], g[6])):
                if hi > lo:
                    m = (w >= lo) & (w < hi)
                    check = m if check is None else (check | m)
            false = jnp.zeros(w.shape, jnp.bool_)
            return (false if metal is None else metal,
                    false if diel is None else diel,
                    false if check is None else check)

        # payload rows: param (fuzz|ref_idx), a0(3) [+ a1(3), scale]
        chk_rows_s = (8, 9, 10, 11) if has_checker else ()
        chk_rows_t = (16, 17, 18, 19) if has_checker else ()
        if ns:
            oh_s = (iota_s == ps).astype(f32)
            res_s = extract_tbl(sph_ref, oh_s)
            (scx, scy, scz, sinvr) = pick(res_s, (0, 1, 2, 15))
            mat_s = pick(res_s, (4, 5, 6, 7) + chk_rows_s)
            type_s = group_masks(ps, sph_groups)
            # Winner's exact t: the sweep's arithmetic replayed on the
            # extracted rows (c0 from payload row 12) — (1, T) cost.
            (c0w,) = pick(res_s, (12,))
            dcw = scx * dx + scy * dy + scz * dz
            ocw = scx * ox + scy * oy + scz * oz
            bqw = od - dcw
            cqw = oo - 2.0 * ocw + c0w
            sqw = jnp.sqrt(bqw * bqw - cqw)
            tnw = -bqw - sqw
            tfw = sqw - bqw
            t_s = jnp.where(tnw > t_min, tnw,
                            jnp.where(tfw > t_min, tfw, f32(_BIG)))
        if nt:
            oh_t = (iota_t == pt).astype(f32)
            res_t = extract_tbl(tri_ref, oh_t)
            (tnx, tny, tnz) = pick(res_t, (9, 10, 11))
            mat_t = pick(res_t, (12, 13, 14, 15) + chk_rows_t)
            type_t = group_masks(pt, tri_groups)
            # Winner's exact t: Möller-Trumbore replayed on rows 0-8.
            (wv0x, wv0y, wv0z, we1x, we1y, we1z, we2x, we2y, we2z) = pick(
                res_t, tuple(range(9)))
            wpx = dy * we2z - dz * we2y
            wpy = dz * we2x - dx * we2z
            wpz = dx * we2y - dy * we2x
            wdet = we1x * wpx + we1y * wpy + we1z * wpz
            wok = jnp.abs(wdet) > 1e-9
            winv = jnp.where(wok, _recip(jnp.where(wok, wdet, 1.0)), 0.0)
            wtx = ox - wv0x
            wty = oy - wv0y
            wtz = oz - wv0z
            wuu = (wtx * wpx + wty * wpy + wtz * wpz) * winv
            wqx = wty * we1z - wtz * we1y
            wqy = wtz * we1x - wtx * we1z
            wqz = wtx * we1y - wty * we1x
            wvv = (dx * wqx + dy * wqy + dz * wqz) * winv
            wtt = (we2x * wqx + we2y * wqy + we2z * wqz) * winv
            whit = (wok & (wuu >= 0.0) & (wvv >= 0.0) & (wuu + wvv <= 1.0)
                    & (wtt > t_min) & (wtt < _BIG))
            t_t = jnp.where(whit, wtt, f32(_BIG))

        is_tri = t_t < t_s
        t_best = jnp.where(is_tri, t_t, t_s)
        hit = active & (t_best < _BIG)

        if emit_tape:
            # Winner's ORIGINAL scene id rides in the payload tables
            # (sphere row 13 / triangle row 20) and was extracted by the
            # same one-hot matmul as the rest; 0 = miss/dead, else id+1.
            if ns and nt:
                oid = jnp.where(is_tri, res_t[20:21, :], res_s[13:14, :])
            elif ns:
                oid = res_s[13:14, :]
            else:
                oid = res_t[20:21, :]
            row_t = sampc * D_t + depth
            val_t = jnp.where(hit, oid + 1.0, 0.0)
            tape_ref[:, :] = tape_ref[:, :] + (iota_r == row_t).astype(
                f32) * val_t

        px = ox + t_best * dx
        py = oy + t_best * dy
        pz = oz + t_best * dz
        if ns and nt:
            nxv = jnp.where(is_tri, tnx, (px - scx) * sinvr)
            nyv = jnp.where(is_tri, tny, (py - scy) * sinvr)
            nzv = jnp.where(is_tri, tnz, (pz - scz) * sinvr)
            mat = [jnp.where(is_tri, mt, ms)
                   for ms, mt in zip(mat_s, mat_t)]
            is_metal, is_diel, is_check = (
                (is_tri & tt_) | (~is_tri & ts_)
                for ts_, tt_ in zip(type_s, type_t))
        elif ns:
            nxv = (px - scx) * sinvr
            nyv = (py - scy) * sinvr
            nzv = (pz - scz) * sinvr
            mat = mat_s
            is_metal, is_diel, is_check = type_s
        else:
            nxv, nyv, nzv = tnx, tny, tnz
            mat = mat_t
            is_metal, is_diel, is_check = type_t
        if has_checker:
            (param, a0r, a0g, a0b, a1r, a1g, a1b, tscale) = mat
        else:
            (param, a0r, a0g, a0b) = mat
        fuzz = ref_idx = param  # disjoint by group: fuzz|metal, ior|diel

        # ---- scatter [E: material.h], mirrors materials/scatter.py ----
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
        # refract(): uv = unit(d) (d already unit; renormalize to match)
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
        # reflect(unit d) and the Snell refraction of a unit d are unit
        # to ~1 ulp already; skip the two normalizes scatter.py does
        # (same tolerance class as the rsqrt/cbrt deviations).
        dielx = jnp.where(use_refl, refx, rfx)
        diely = jnp.where(use_refl, refy, rfy)
        dielz = jnp.where(use_refl, refz, rfz)

        # texture [E: texture.h checker] — compiled out when the scene
        # has no checker material.
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
        sok = metal_ok | ~is_metal  # == where(is_metal, metal_ok, True)

        cont = hit & sok & (depth < max_depth)
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

        # ---- pixel-boundary flush + in-lane sample regeneration ----
        # The output block is channel-major (3, K, T): one (K, T) one-hot
        # of the crossing lanes' current pixel slot, three fused
        # multiply-add block updates.  (The earlier K-loop of 3K masked
        # row updates measured ~13% of the whole kernel at K=64; this
        # form is ~3 (K, T) ops.)  Non-crossing lanes get slot K (out of
        # range) so the one-hot row is all-zero for them.
        term = active & ~cont
        samp_new = jnp.where(term, samp + 1, samp)
        crossed = term & (samp_new % spp == 0)
        j_cur = sampc // spp
        j_eff = jnp.where(crossed, j_cur, K)
        ohf = (iota_k == j_eff).astype(f32)  # (K, T)
        rad_ref[0:K, :] = rad_ref[0:K, :] + ohf * rx
        rad_ref[K:2 * K, :] = rad_ref[K:2 * K, :] + ohf * ry
        rad_ref[2 * K:3 * K, :] = rad_ref[2 * K:3 * K, :] + ohf * rz
        rx = jnp.where(crossed, 0.0, rx)
        ry = jnp.where(crossed, 0.0, ry)
        rz = jnp.where(crossed, 0.0, rz)

        _, next_valid = pixel_of(jnp.minimum(samp_new, S - 1))
        # Grid-stride pixels are increasing in j: once out of range, all
        # later pixels are too -> the lane is done.
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
                tpx, tpy, tpz, rx, ry, rz, segs)

    max_it = S * (max_depth + 1) + 2

    def cond(carry):
        return (carry[0] < max_it) & jnp.any(carry[1] < S)

    init = (jnp.int32(0), samp0, jnp.zeros((1, T), i32),
            ox, oy, oz, dx, dy, dz, one, one, one, zero, zero, zero,
            jnp.zeros((1, T), i32))
    # Unrolled body: fewer any()-cond syncs per bounce and better Mosaic
    # scheduling; the wasted trailing iterations per tile are no-ops (all
    # lanes inactive), so outputs are identical for any unroll factor.
    # Re-measured after the round-2 body changes: 2x beats 4x (37.4 vs
    # 36.1 Mpaths/s) and 8x (34.1); 1x fails to compile (Mosaic internal
    # error).
    def body_x(carry):
        for _ in range(unroll):
            carry = body(carry)
        return carry

    final = jax.lax.while_loop(cond, body_x, init)
    seg_ref[0, :] = final[15][0, :]
    # Per-tile bounce-loop trips, broadcast across the lane block
    # (occupancy metric; host reads one lane per tile).
    it_ref[0, :] = jnp.full((T,), final[0], jnp.int32)


def _mega_call(cam, key, sph, mx, tri, pix0=None, *, nx, ny, spp,
               max_depth, t_min, ns, nt, sph_groups, tri_groups,
               has_checker, num_pixels=None, total_pixels=None,
               spp_total=None, interpret=False, tile=TILE,
               k_pix=PIX_PER_LANE, unroll=2, emit_tape=False):
    """Launch the kernel over ``num_pixels`` local pixels.

    ``pix0`` (traced (1,1) i32) offsets local pixel indices to global ids
    — the sharding hook: each mesh device renders its contiguous pixel
    block with globally-keyed RNG.  Unsharded: pix0=0, num_pixels=nx*ny.
    """
    # Packed closest-hit selection (packed_min) bitcasts candidate t's to
    # i32 and relies on IEEE ordering for POSITIVE floats only; every
    # candidate is > t_min, so t_min > 0 is the precondition that makes the
    # selection sound.  The idx-bits budget (mantissa low bits carry the
    # winner index) caps the padded primitive-group width at 2^14.
    if not t_min > 0.0:
        raise ValueError(f"megakernel requires t_min > 0, got {t_min}")
    if max(sph.shape[1], tri.shape[1]) > (1 << 14):
        raise ValueError("megakernel packed selection supports at most "
                         f"2^14 padded primitives per type, got "
                         f"{max(sph.shape[1], tri.shape[1])}")
    if num_pixels is None:
        num_pixels = nx * ny
    if total_pixels is None:
        total_pixels = nx * ny
    if spp_total is None:
        spp_total = spp
    if pix0 is None:
        pix0 = jnp.zeros((1, 2), jnp.int32)
    n_tiles = max(1, -(-num_pixels // (tile * k_pix)))
    lanes = n_tiles * tile
    k_pix = max(1, -(-num_pixels // lanes))
    # The channel-major flush slices rad_ref at rows 0/K/2K: keep K a
    # sublane multiple so the slices are aligned for Mosaic.  Extra slots
    # map to out-of-range pixels (handled by the valid mask).  Applied in
    # interpret mode too, so CPU tests exercise the compiled mapping.
    k_pix = -(-k_pix // 8) * 8
    grid = (n_tiles,)
    rpad_t = -(-(k_pix * spp * (max_depth + 1)) // 8) * 8
    kernel = functools.partial(
        _mega_kernel, nx=nx, ny=ny, spp=spp, max_depth=max_depth,
        t_min=t_min, num_pixels=num_pixels, total_pixels=total_pixels,
        spp_total=spp_total, ns=ns, nt=nt, tile=tile, k_pix=k_pix,
        lanes=lanes,
        unroll=1 if interpret else unroll, sph_groups=sph_groups,
        tri_groups=tri_groups, has_checker=has_checker,
        emit_tape=emit_tape)
    out_specs = [
        pl.BlockSpec((3 * k_pix, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((3 * k_pix, lanes), jnp.float32),
        jax.ShapeDtypeStruct((1, lanes), jnp.int32),
        jax.ShapeDtypeStruct((1, lanes), jnp.int32),
    ]
    if emit_tape:
        out_specs.append(pl.BlockSpec((rpad_t, tile), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((rpad_t, lanes),
                                              jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_SPH_ROWS, sph.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sph.shape[1], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TRI_ROWS, tri.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(cam, key, pix0, sph, mx, tri)
    rad, seg, its = outs[:3]
    # Channel-major (3, K, L) row blocks -> (K*L, 3): flat index
    # j*L + lane == local pixel.
    rad = rad.reshape(3, k_pix, lanes).transpose(1, 2, 0).reshape(-1, 3)
    if emit_tape:
        # (s*D + d, lane) with s = slot*spp + rem
        #   -> (d, (slot*L + lane)*spp + rem) == (d, local ray).
        D = max_depth + 1
        S = k_pix * spp
        tape = outs[3].astype(jnp.int32)
        tape = (tape[:S * D].reshape(k_pix, spp, D, lanes)
                .transpose(2, 0, 3, 1).reshape(D, k_pix * lanes * spp))
        return rad[:num_pixels], seg, its, tape[:, :num_pixels * spp]
    return rad[:num_pixels], seg, its


_mega_jit = jax.jit(
    _mega_call,
    static_argnames=("nx", "ny", "spp", "max_depth", "t_min", "ns", "nt",
                     "sph_groups", "tri_groups", "has_checker",
                     "num_pixels", "total_pixels", "spp_total", "interpret",
                     "tile", "k_pix", "unroll", "emit_tape"))


def _cam_smem(camera):
    return jnp.concatenate([
        jnp.asarray(camera.origin, jnp.float32).reshape(3),
        jnp.asarray(camera.lower_left, jnp.float32).reshape(3),
        jnp.asarray(camera.horizontal, jnp.float32).reshape(3),
        jnp.asarray(camera.vertical, jnp.float32).reshape(3),
        jnp.asarray(camera.u, jnp.float32).reshape(3),
        jnp.asarray(camera.v, jnp.float32).reshape(3),
        jnp.asarray(camera.lens_radius, jnp.float32).reshape(1),
        jnp.zeros((1,), jnp.float32),
    ]).reshape(1, 20)


def render_pixels_mega(pack: MegaScenePack, camera, cfg, key,
                       interpret: bool = False, tile: int = TILE,
                       k_pix: int = PIX_PER_LANE,
                       return_iters: bool = False,
                       spp0=0, spp_total: int = None, unroll: int = 2):
    """Render all pixels; returns (radiance_sum (P, 3), segments (L,) i32).

    ``radiance_sum`` is the per-pixel sum over spp samples (divide by spp
    for the mean); ``segments`` counts traced path segments per *lane*
    (each lane covers ``k_pix`` grid-strided pixels; sum() is the total —
    rays/s accounting, SURVEY.md §5.5).  With ``return_iters`` also
    returns per-tile bounce-loop trip counts: lane occupancy =
    segments.sum() / (iters.sum() * tile).
    """
    cam = _cam_smem(camera)
    key = jnp.asarray(key, jnp.uint32).reshape(1, 2)
    off = jnp.stack([jnp.zeros((), jnp.int32),
                     jnp.asarray(spp0, jnp.int32)]).reshape(1, 2)
    rad, seg, its = _mega_jit(
        cam, key, pack.spheres, pack.sph_mx, pack.tris, off, nx=cfg.nx,
        ny=cfg.ny, spp=cfg.spp, max_depth=cfg.max_depth,
        t_min=float(cfg.t_min), ns=pack.sphere_rows, nt=pack.tri_rows,
        sph_groups=pack.sph_groups, tri_groups=pack.tri_groups,
        has_checker=pack.has_checker, spp_total=spp_total,
        interpret=interpret, tile=tile, k_pix=k_pix, unroll=unroll)
    if return_iters:
        return rad, seg[0], its[0, ::tile]
    return rad, seg[0]


def render_image_mega(scene, camera, cfg, seed: int = 0,
                      interpret: bool = False, tile: int = TILE,
                      k_pix: int = PIX_PER_LANE):
    """Full-image render via the megakernel; (ny, nx, 3) linear, top-down.

    Drop-in alternative to ``render.api.render_image`` (same RNG stream,
    same radiance semantics — per-pixel mean over spp, rows flipped).
    """
    from ..core import rng

    pack = pack_scene_mega(scene)
    key = rng.base_key(seed)
    rad, _ = render_pixels_mega(pack, camera, cfg, key, interpret=interpret,
                                tile=tile, k_pix=k_pix)
    img = (rad / cfg.spp).reshape(cfg.ny, cfg.nx, 3)
    return img[::-1]


def render_image_mega_sharded(scene, camera, cfg, mesh, seed: int = 0,
                              interpret: bool = False, tile: int = TILE,
                              k_pix: int = PIX_PER_LANE):
    """Mesh-sharded megakernel render; (ny, nx, 3) linear, top-down.

    Data-parallel over the mesh's ``tiles`` axis (SURVEY.md §2.2 DP row):
    each device runs the megakernel on a contiguous block of pixels with
    the shared globally-keyed RNG, so the result is bit-identical to the
    single-device megakernel render regardless of device count.  Scene
    tables and camera are replicated; the only collective is the output
    all-gather implied by the ``P(TILE_AXIS)`` out-spec.  (spp sharding
    lives in parallel/shard.py's wavefront path; the megakernel keeps a
    pixel's samples on one lane by design.)
    """
    from functools import partial as _partial

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..core import rng
    from ..parallel.mesh import TILE_AXIS

    pack = pack_scene_mega(scene)
    key = jnp.asarray(rng.base_key(seed), jnp.uint32).reshape(1, 2)
    cam = _cam_smem(camera)
    n_shards = mesh.shape[TILE_AXIS]
    total = cfg.num_pixels
    p_local = -(-total // n_shards)

    @_partial(jax.jit, static_argnames=())
    @_partial(shard_map, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
              out_specs=P(TILE_AXIS), check_vma=False)
    def run(cam, key, sph, mx, tri):
        idx = jax.lax.axis_index(TILE_AXIS)
        pix0 = jnp.stack([idx * p_local,
                          jnp.zeros((), jnp.int32)]).reshape(1, 2)
        rad, _, _ = _mega_call(
            cam, key, sph, mx, tri, pix0, nx=cfg.nx, ny=cfg.ny, spp=cfg.spp,
            max_depth=cfg.max_depth, t_min=float(cfg.t_min),
            ns=pack.sphere_rows, nt=pack.tri_rows,
            sph_groups=pack.sph_groups, tri_groups=pack.tri_groups,
            has_checker=pack.has_checker,
            num_pixels=p_local, total_pixels=total,
            interpret=interpret, tile=tile, k_pix=k_pix)
        return rad

    rad = run(cam, key, pack.spheres, pack.sph_mx, pack.tris)[:total]
    img = (rad / cfg.spp).reshape(cfg.ny, cfg.nx, 3)
    return img[::-1]
