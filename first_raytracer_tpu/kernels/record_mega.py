"""Pallas TPU tape recorder: the megakernel's tracer emitting a winner tape.

The record->replay differentiable pass (diff/replay.py) hoists primitive
*selection* out of the AD graph: record the per-(bounce, ray) winning
primitive id once, then differentiate a cheap tape replay.  Round 3's
recorders run the XLA wavefront loops, whose per-bounce glue is ~13x
slower than the persistent-lane megakernel (kernels/megakernel.py) that
already computes the winner index in-kernel — so recording dominated the
differentiable pass (VERDICT r3 item 3).

This module is the megakernel specialized to recording:

- same persistent-lane grid-stride design, but each lane owns ``k_rays``
  *ray ids* from a contiguous ``[ray0, ray0 + R)`` range (the megakernel
  owns pixels; a tape is per-ray, so the ray id stream is the unit here);
- same in-kernel Threefry draws, camera rays, dense sweep, packed-min
  selection and one-hot payload extraction — the traced paths are the
  megakernel's paths, so the recorded ids match the wavefront recorders'
  (tests/test_record_mega.py proves tape equality on the canonical
  scenes);
- radiance/throughput/texture work is dropped (a recorder needs only the
  winner and the next direction), replaced by one tape write per
  iteration: a (k_rays * (max_depth+1), T) one-hot accumulation into the
  per-tile tape block — the same never-a-scatter pattern as the
  megakernel's pixel flush;
- winners are recorded in the pack's group-sorted index space and mapped
  back to ORIGINAL scene ids on the host through ``pack.sph_order`` /
  ``pack.tri_order``, so the returned tape is bit-compatible with
  ``diff.replay.record_paths`` (-1 = miss/dead, else global primitive id).

The replay consumes the tape unchanged; gradients are identical because
the tape only *selects* — all differentiable math lives in the replay.

Reference lineage: the recursion this records is ``color()``'s
[E: main.cpp] (SURVEY.md §3.2); recording has no reference analog
(SURVEY.md §3.5 — the reference has no gradients).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import (_BIG, _LANE, TILE, MegaScenePack, _bits_to_unit,
                         _cam_smem, _cbrt, _recip, _threefry2x32, _unit3,
                         pack_scene_mega)

__all__ = ["record_paths_mega", "record_paths_mega_clustered",
           "pack_scene_mega", "MegaScenePack"]

# Rays per lane: higher -> better lane occupancy (grid-stride averaging)
# but a taller (K*D, T) tape block and a pricier one-hot write.  K=8 at
# D=51 gives a 408-row block (~0.8 MB VMEM) and a ~3-op write per
# iteration vs the sweep's ~15.
RAYS_PER_LANE = 8


def _record_kernel(cam_ref, key_ref, off_ref, sph_ref, mx_ref, tri_ref,
                   tape_ref, it_ref, *, nx, ny, spp_total, max_depth,
                   t_min, num_rays, ns, nt, tile, k_rays, lanes, unroll,
                   sph_groups, tri_groups, ns_cap, rpad, skip_write):
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    T = tile
    K = k_rays
    L = lanes
    S = K                      # "samples" per lane = owned ray ids
    D = max_depth + 1
    step = pl.program_id(0)
    lane = step * T + jax.lax.broadcasted_iota(i32, (1, T), 1)
    ray0 = off_ref[0, 0]
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
        """floor(a / b) for 0 <= a < 2^24, b static (megakernel trick:
        integer div lowers to a very slow Mosaic sequence)."""
        return jnp.floor((a.astype(f32) + 0.5) * f32(b_inv)).astype(i32)

    def _fdiv_exact(a, b_inv, b):
        """_fdiv plus a one-step remainder correction: exact for any
        a < 2^24 even when the f32 product's ulp exceeds the +0.5 bias
        margin (at a ~ 9.6M and b = 10 the margin is 0.05 but the ulp is
        0.0625 — full-frame ray ids would misdecode their pixel)."""
        q = _fdiv(a, b_inv, b)
        r = a - q * b
        return q - (r < 0).astype(i32) + (r >= b).astype(i32)

    def ray_of(s):
        """Grid-stride global ray id for a lane's slot counter."""
        loc = lane + s * L
        valid = loc < num_rays
        rid = ray0 + jnp.minimum(loc, num_rays - 1)
        return rid, valid

    def camera_ray(s, ju, jv, lu, lv):
        """Mirrors megakernel.camera_ray with pixel = rid // spp_total."""
        rid, _ = ray_of(s)
        pixc = _fdiv_exact(rid, 1.0 / spp_total, spp_total)
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

    # f32 accumulator: packed ids stay < 2^14 + 1 (exact in f32), and the
    # one-hot write lowers to a native VPU FMA instead of a 32-bit integer
    # multiply sequence; the host converts back to i32.
    tape_ref[:, :] = jnp.zeros((rpad, T), f32)

    ns_pad = mx_ref.shape[0] if ns else 0
    nt_pad = tri_ref.shape[1] if nt else 0
    if ns:
        idx_bits_s = max((ns_pad - 1).bit_length(), 1)
        iota_s = jax.lax.broadcasted_iota(i32, (ns_pad, T), 0)
    if nt:
        idx_bits_t = max((nt_pad - 1).bit_length(), 1)
        iota_t = jax.lax.broadcasted_iota(i32, (nt_pad, T), 0)
    iota_r = None if skip_write else jax.lax.broadcasted_iota(
        i32, (rpad, T), 0)

    def packed_min(tall, iota, idx_bits):
        hi = jnp.int32(-(1 << idx_bits))
        packed = (jax.lax.bitcast_convert_type(tall, i32) & hi) | iota
        pm = jnp.min(packed, axis=0)[None, :]
        return pm & jnp.int32((1 << idx_bits) - 1), pm

    # --- init: slot 0 camera rays ---
    s0 = jnp.zeros((1, T), i32)
    rid0, valid0 = ray_of(s0)
    ju0, jv0, lu0, lv0 = draws4(rid0.astype(u32), jnp.zeros((1, T), u32))
    ox, oy, oz, dx, dy, dz = camera_ray(s0, ju0, jv0, lu0, lv0)
    samp0 = jnp.where(valid0, 0, S)

    def body(carry):
        it, samp, depth, ox, oy, oz, dx, dy, dz = carry
        active = samp < S
        sampc = jnp.minimum(samp, S - 1)
        rid, _ = ray_of(sampc)
        ridu = rid.astype(u32)
        dom2 = (depth + 1).astype(u32) * u32(2)
        u1, u2, u3, coin = draws4(ridu, dom2)
        nrid, _ = ray_of(jnp.minimum(sampc + 1, S - 1))
        ju, jv, lu, lv = draws4(nrid.astype(u32), jnp.zeros((1, T), u32))

        # ---- dense sweep (megakernel's intersector, verbatim) ----
        t_s = jnp.full((1, T), f32(_BIG))
        ps = jnp.zeros((1, T), i32)
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz
        if ns:
            cx = mx_ref[:, 0:1]
            cy = mx_ref[:, 1:2]
            cz = mx_ref[:, 2:3]
            c0 = mx_ref[:, 3:4]
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
            ps, _ = packed_min(tall, iota_s, idx_bits_s)

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
            pt, _ = packed_min(tallt, iota_t, idx_bits_t)

        # ---- winner payload extraction (t recompute + scatter inputs) ----
        def extract_tbl(ref, oh):
            return jax.lax.dot_general(
                ref[:, :], oh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)

        def pick(res, rows):
            return [res[k:k + 1, :] for k in rows]

        def group_masks(w, g):
            metal = ((w >= g[2]) & (w < g[4])) if g[4] > g[2] else None
            diel = (w >= g[4]) if g[6] > g[4] else None
            false = jnp.zeros(w.shape, jnp.bool_)
            return (false if metal is None else metal,
                    false if diel is None else diel)

        if ns:
            oh_s = (iota_s == ps).astype(f32)
            res_s = extract_tbl(sph_ref, oh_s)
            (scx, scy, scz, sparam, sinvr) = pick(res_s, (0, 1, 2, 4, 15))
            type_s = group_masks(ps, sph_groups)
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
            (tnx, tny, tnz, tparam) = pick(res_t, (9, 10, 11, 12))
            type_t = group_masks(pt, tri_groups)
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

        px = ox + t_best * dx
        py = oy + t_best * dy
        pz = oz + t_best * dz
        if ns and nt:
            nxv = jnp.where(is_tri, tnx, (px - scx) * sinvr)
            nyv = jnp.where(is_tri, tny, (py - scy) * sinvr)
            nzv = jnp.where(is_tri, tnz, (pz - scz) * sinvr)
            param = jnp.where(is_tri, tparam, sparam)
            is_metal, is_diel = ((is_tri & tt_) | (~is_tri & ts_)
                                 for ts_, tt_ in zip(type_s, type_t))
            packed = jnp.where(is_tri, pt + i32(ns_cap), ps)
        elif ns:
            nxv = (px - scx) * sinvr
            nyv = (py - scy) * sinvr
            nzv = (pz - scz) * sinvr
            param = sparam
            is_metal, is_diel = type_s
            packed = ps
        else:
            nxv, nyv, nzv = tnx, tny, tnz
            param = tparam
            is_metal, is_diel = type_t
            packed = pt + i32(ns_cap)
        fuzz = ref_idx = param

        # ---- tape write: one-hot row (slot*D + depth) accumulation ----
        # Each (slot, depth) cell of a lane is visited at most once, so the
        # += lands exactly one nonzero per write — never a scatter, same
        # pattern as the megakernel's pixel flush.  0 = miss/dead (mapped
        # to -1 on the host), else packed winner + 1 (f32-exact: < 2^14+1).
        if not skip_write:
            row = sampc * D + depth
            val = jnp.where(hit, (packed + 1).astype(f32), 0.0)
            ohw = (iota_r == row).astype(f32)
            tape_ref[:, :] = tape_ref[:, :] + ohw * val

        # ---- scatter direction (megakernel's, minus attenuation) ----
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

        ndx = jnp.where(is_diel, dielx, jnp.where(is_metal, metx, lamx))
        ndy = jnp.where(is_diel, diely, jnp.where(is_metal, mety, lamy))
        ndz = jnp.where(is_diel, dielz, jnp.where(is_metal, metz, lamz))
        sok = metal_ok | ~is_metal

        cont = hit & sok & (depth < max_depth)
        ox = jnp.where(cont, px, ox)
        oy = jnp.where(cont, py, oy)
        oz = jnp.where(cont, pz, oz)
        dx = jnp.where(cont, ndx, dx)
        dy = jnp.where(cont, ndy, dy)
        dz = jnp.where(cont, ndz, dz)
        depth = jnp.where(cont, depth + 1, depth)

        # ---- in-lane regeneration of the next owned ray ----
        term = active & ~cont
        samp_new = jnp.where(term, samp + 1, samp)
        _, next_valid = ray_of(jnp.minimum(samp_new, S - 1))
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
        depth = jnp.where(regen, 0, depth)
        return (it + 1, samp, depth, ox, oy, oz, dx, dy, dz)

    max_it = S * (max_depth + 1) + 2

    def cond(carry):
        return (carry[0] < max_it) & jnp.any(carry[1] < S)

    init = (jnp.int32(0), samp0, jnp.zeros((1, T), jnp.int32),
            ox, oy, oz, dx, dy, dz)

    def body_x(carry):
        for _ in range(unroll):
            carry = body(carry)
        return carry

    final = jax.lax.while_loop(cond, body_x, init)
    # Per-tile bounce-loop trips (occupancy diagnostics, mirrors the
    # megakernel's it_ref; host reads one lane per tile).
    it_ref[0, :] = jnp.full((T,), final[0], jnp.int32)


def _record_call(cam, key, off, sph, mx, tri, sph_order, tri_order, *,
                 nx, ny, spp_total, max_depth, t_min, num_rays, ns, nt,
                 sph_groups, tri_groups, interpret=False, tile=TILE,
                 k_rays=RAYS_PER_LANE, unroll=2, skip_write=False):
    if not t_min > 0.0:
        raise ValueError(f"recorder requires t_min > 0, got {t_min}")
    if max(sph.shape[1], tri.shape[1]) > (1 << 14):
        raise ValueError("recorder packed selection supports at most 2^14 "
                         "padded primitives per type")
    D = max_depth + 1
    n_tiles = max(1, -(-num_rays // (tile * k_rays)))
    lanes = n_tiles * tile
    k_rays = max(1, -(-num_rays // lanes))
    rpad = -(-(k_rays * D) // 8) * 8
    ns_cap = sph.shape[1]
    kernel = functools.partial(
        _record_kernel, nx=nx, ny=ny, spp_total=spp_total,
        max_depth=max_depth, t_min=t_min, num_rays=num_rays, ns=ns, nt=nt,
        tile=tile, k_rays=k_rays, lanes=lanes,
        unroll=1 if interpret else unroll, sph_groups=sph_groups,
        tri_groups=tri_groups, ns_cap=ns_cap, rpad=rpad,
        skip_write=skip_write)
    tape, its = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sph.shape[0], sph.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mx.shape[0], mx.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tri.shape[0], tri.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((rpad, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rpad, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((1, lanes), jnp.int32)),
        interpret=interpret,
    )(cam, key, off, sph, mx, tri)
    # (slot*D + d, lane) -> (d, slot*L + lane): the lane's slot s owns
    # global ray  ray0 + s*L + lane.  The sorted->scene id mapping is
    # fused here so one XLA program covers record + postprocess — under
    # the axon tunnel every extra program launch costs ~10-30 ms, which
    # dominated the whole record pass (gradbench r4).
    tape = tape.astype(jnp.int32)
    tape = (tape[:k_rays * D].reshape(k_rays, D, lanes)
            .transpose(1, 0, 2).reshape(D, k_rays * lanes))[:, :num_rays]
    sid = tape - 1
    is_t = sid >= ns_cap
    sph_part = (sph_order[jnp.clip(sid, 0, max(ns - 1, 0))]
                if ns else jnp.zeros_like(sid))
    tri_part = (ns + tri_order[jnp.clip(sid - ns_cap, 0, max(nt - 1, 0))]
                if nt else jnp.zeros_like(sid))
    mapped = jnp.where(tape == 0, -1,
                       jnp.where(is_t, tri_part, sph_part))
    return mapped, its[0, ::tile]


_record_jit = jax.jit(
    _record_call,
    static_argnames=("nx", "ny", "spp_total", "max_depth", "t_min",
                     "num_rays", "ns", "nt", "sph_groups", "tri_groups",
                     "interpret", "tile", "k_rays", "unroll",
                     "skip_write"))


# VMEM budget for the in-kernel tape block (K*spb*D rows x T lanes x 4B):
# bounds spp-per-sweep.  The r5 spb sweep measured the one-hot tape
# write's cost growing with the block height: spb=3 batches (2.5 MB
# block) beat both spb=1 (10 sweeps) and spb=5 (taller write) on the
# headline record — 9.32 vs 10.6 / 9.72 ms (tools batch-4 spb_sweep).
_TAPE_VMEM_BYTES = 2_600_000


def _spp_batches(spp_total, k_pix, max_depth, tile):
    """Balanced spp batch sizes for the emit_tape sweeps."""
    spb_max = max(1, _TAPE_VMEM_BYTES
                  // (k_pix * (max_depth + 1) * tile * 4))
    nb = -(-spp_total // spb_max)
    spb = -(-spp_total // nb)
    sizes = [spb] * (spp_total // spb)
    if spp_total % spb:
        sizes.append(spp_total % spb)
    return tuple(sizes)


@functools.partial(
    jax.jit, static_argnames=("nx", "ny", "spp_total", "max_depth",
                              "t_min", "ns", "nt", "sph_groups",
                              "tri_groups", "has_checker", "p0", "P",
                              "total_pixels", "interpret", "tile",
                              "k_pix", "unroll", "ns_cap", "off",
                              "n_out", "spp_sizes"))
def _record_mega2(cam, key, sph, mx, tri, sph_order, tri_order, *, nx, ny,
                  spp_total, max_depth, t_min, ns, nt, sph_groups,
                  tri_groups, has_checker, p0, P, total_pixels, interpret,
                  tile, k_pix, unroll, ns_cap, off, n_out, spp_sizes=None):
    """Megakernel-backed tape record: few VMEM-sized spp-batch sweeps.

    The production recorder IS the megakernel with ``emit_tape`` (the
    standalone recorder's apparent cliff was a host-graph gather; the
    grafted write costs ~8% — tools/mega_tapegraft.py).  Each sweep
    records ``spb`` samples per pixel over pixels [p0, p0+P) at sample
    offset spp0=b; ``spb`` is the largest count whose (K*spb*D, T) tape
    block fits the VMEM budget (r4 ran spp=1 sweeps: 10 dispatches and
    only K=8 samples/lane of tail averaging; r5 batches them — fewer
    sweeps, S=K*spb samples/lane occupancy).  One jitted program.
    """
    from .megakernel import _mega_call

    D = max_depth + 1
    if spp_sizes is None:
        spp_sizes = _spp_batches(spp_total, k_pix, max_depth, tile)
    batches = []
    b0 = 0
    for spb in spp_sizes:
        pix0 = jnp.asarray([[p0, b0]], jnp.int32)
        _, _, _, tape_b = _mega_call(
            cam, key, sph, mx, tri, pix0, nx=nx, ny=ny, spp=spb,
            max_depth=max_depth, t_min=t_min, ns=ns, nt=nt,
            sph_groups=sph_groups, tri_groups=tri_groups,
            has_checker=has_checker, num_pixels=P,
            total_pixels=total_pixels, spp_total=spp_total,
            interpret=interpret, tile=tile, k_pix=k_pix, unroll=unroll,
            emit_tape=True)
        batches.append(tape_b.reshape(D, P, spb))  # ids + 1, ray-ordered
        b0 += spb
    tape = jnp.concatenate(batches, axis=2).reshape(D, P * spp_total)
    # Entries are ORIGINAL scene id + 1 (the kernel extracts the id from
    # payload row 13/20), so miss (0) maps to -1 by the same subtraction
    # — no remap gather (a 6.7M-element table gather measured ~55 ms).
    return (tape - 1)[:, off:off + n_out]


def record_paths_mega(pack: MegaScenePack, camera, cfg, key, ray0: int = 0,
                      num_rays: int = None, spp_total: int = None,
                      interpret: bool = False, tile: int = TILE,
                      k_rays: int = RAYS_PER_LANE, unroll: int = 2,
                      return_iters: bool = False,
                      skip_write: bool = False, impl: str = "mega",
                      spp_sizes=None, k_pix: int = 24):
    """(max_depth+1, R) i32 primitive tape for rays ``[ray0, ray0 + R)``.

    Drop-in fast producer for ``diff.replay.record_paths`` restricted to a
    CONTIGUOUS ray-id range (the common case: whole frames, ``arange``
    batches; arbitrary id sets keep using the wavefront recorders).  Entry
    ``tape[d, i]`` is the ORIGINAL-scene-order primitive id ray
    ``ray0 + i`` hit at bounce ``d``, or -1 on miss/dead — the exact
    contract of ``record_paths`` (diff/replay.py), so
    ``trace_rays_replay`` consumes it unchanged.  ``return_iters`` also
    returns per-tile bounce-loop trip counts (occupancy diagnostics).
    """
    if num_rays is None:
        num_rays = cfg.num_rays
    if spp_total is None:
        spp_total = cfg.spp
    if ray0 + num_rays > (1 << 24):
        raise ValueError("ray ids must stay below 2^24 (f32-exact decode)")
    if impl == "mega" and not return_iters and not skip_write:
        p0 = ray0 // spp_total
        p1 = -(-(ray0 + num_rays) // spp_total)
        tape = _record_mega2(
            _cam_smem(camera), jnp.asarray(key, jnp.uint32).reshape(1, 2),
            pack.spheres, pack.sph_mx, pack.tris, pack.sph_order,
            pack.tri_order, nx=cfg.nx, ny=cfg.ny, spp_total=spp_total,
            max_depth=cfg.max_depth, t_min=float(cfg.t_min),
            ns=pack.sphere_rows, nt=pack.tri_rows,
            sph_groups=pack.sph_groups, tri_groups=pack.tri_groups,
            has_checker=pack.has_checker, p0=p0, P=p1 - p0,
            total_pixels=cfg.nx * cfg.ny, interpret=interpret, tile=tile,
            k_pix=k_pix, unroll=unroll, ns_cap=pack.spheres.shape[1],
            off=ray0 - p0 * spp_total, n_out=num_rays,
            spp_sizes=spp_sizes)
        return tape
    cam = _cam_smem(camera)
    keya = jnp.asarray(key, jnp.uint32).reshape(1, 2)
    off = jnp.full((1, 1), ray0, jnp.int32)
    tape, its = _record_jit(
        cam, keya, off, pack.spheres, pack.sph_mx, pack.tris,
        pack.sph_order, pack.tri_order,
        nx=cfg.nx, ny=cfg.ny, spp_total=spp_total,
        max_depth=cfg.max_depth, t_min=float(cfg.t_min),
        num_rays=num_rays, ns=pack.sphere_rows, nt=pack.tri_rows,
        sph_groups=pack.sph_groups, tri_groups=pack.tri_groups,
        interpret=interpret, tile=tile, k_rays=k_rays, unroll=unroll,
        skip_write=skip_write)
    if return_iters:
        return tape, its
    return tape



@functools.partial(
    jax.jit, static_argnames=("nx", "ny", "spp_total", "max_depth",
                              "t_min", "ns", "nt", "kc",
                              "has_checker", "tile0", "n_tiles",
                              "interpret", "tile", "k_pix", "unroll",
                              "margin", "gate_mode", "grid_lo",
                              "grid_inv", "grid_dims", "super_spans",
                              "kt", "tri_super_spans",
                              "off", "n_out", "spp_sizes"))
def _record_megac2(cam, key, boxes, sboxes, tboxes, tsboxes, adj, sph,
                   mx, tri, *, nx, ny,
                   spp_total, max_depth, t_min, ns, nt, kc, kt,
                   has_checker, tile0, n_tiles, interpret, tile, k_pix,
                   unroll, margin, gate_mode, grid_lo, grid_inv,
                   grid_dims, super_spans, tri_super_spans, off, n_out,
                   spp_sizes):
    """Clustered-megakernel tape record (band mapping), VMEM-sized spp
    batches — the large-scene counterpart of ``_record_mega2``."""
    from .megakernel_clustered import _mega_clustered_call

    D = max_depth + 1
    batches = []
    b0 = 0
    for spb in spp_sizes:
        pix0 = jnp.asarray([[tile0, b0]], jnp.int32)
        outs = _mega_clustered_call(
            cam, key, pix0, boxes, sboxes, tboxes, tsboxes, adj, sph, mx,
            tri, nx=nx,
            ny=ny,
            spp=spb, max_depth=max_depth, t_min=t_min, ns=ns, nt=nt,
            kc=kc, kt=kt, has_checker=has_checker,
            n_tiles=n_tiles, spp_total=spp_total, interpret=interpret,
            tile=tile, k_pix=k_pix, unroll=unroll, margin=margin,
            gate_mode=gate_mode, mapping="band", grid_lo=grid_lo,
            grid_inv=grid_inv, grid_dims=grid_dims,
            super_spans=super_spans, tri_super_spans=tri_super_spans,
            emit_tape=True)
        tape_b = outs[4]                       # (rpad, lanes), ids + 1
        S = k_pix * spb
        lanes = tape_b.shape[1]
        ntl = lanes // tile
        # rows (j*spb + rem)*D + d, cols (g, lane)
        #   -> (d, ((g*K + j)*T + lane)*spb + rem) = (d, pixel*spb + rem).
        tb = (tape_b[:S * D].reshape(k_pix, spb, D, ntl, tile)
              .transpose(2, 3, 0, 4, 1).reshape(D, ntl * k_pix * tile,
                                                spb))
        batches.append(tb)
        b0 += spb
    tape = jnp.concatenate(batches, axis=2).reshape(D, -1)
    return (tape.astype(jnp.int32) - 1)[:, off:off + n_out]


def record_paths_mega_clustered(pack, camera, cfg, key, ray0: int = 0,
                                num_rays: int = None,
                                spp_total: int = None,
                                interpret: bool = False, tile: int = TILE,
                                k_pix: int = 8, unroll: int = 2,
                                gate_mode: str = "wl",
                                spp_sizes=None):
    """(max_depth+1, R) i32 primitive tape via the CLUSTERED megakernel.

    Same contract as ``record_paths_mega`` / ``diff.replay.record_paths``
    (-1 = miss/dead, else ORIGINAL scene id, spheres then triangles) for
    a contiguous ray range — but with the clustered kernel's gated
    per-cluster sweeps and exact selection, so it has no 2^14 packed-id
    bound and tracks large-scene forward cost (VERDICT r4 item 4).
    ``pack`` is a ``MegaClusteredPack``.
    """
    from .megakernel_clustered import MegaClusteredPack  # noqa: F401

    if num_rays is None:
        num_rays = cfg.num_rays
    if spp_total is None:
        spp_total = cfg.spp
    if ray0 + num_rays > (1 << 24):
        raise ValueError("ray ids must stay below 2^24 (f32-exact decode)")
    if pack.sphere_rows + pack.tri_rows >= (1 << 24):
        raise ValueError("payload id rows are f32: < 2^24 primitives")
    if k_pix % 8:
        raise ValueError("k_pix must be a multiple of 8 (flush blocks)")
    if spp_sizes is None:
        spp_sizes = _spp_batches(spp_total, k_pix, cfg.max_depth, tile)
    blk = tile * k_pix
    p0 = ray0 // spp_total
    p1 = -(-(ray0 + num_rays) // spp_total)
    tile0 = p0 // blk
    t1 = -(-p1 // blk)
    cam = _cam_smem(camera)
    keya = jnp.asarray(key, jnp.uint32).reshape(1, 2)
    from .megakernel_clustered import _dummy_adj
    adj_in = pack.adj if gate_mode == "adj" else _dummy_adj()
    return _record_megac2(
        cam, keya, pack.boxes, pack.super_boxes, pack.tri_boxes,
        pack.tri_super_boxes, adj_in, pack.sph,
        pack.sph_mx, pack.tris,
        nx=cfg.nx, ny=cfg.ny, spp_total=spp_total,
        max_depth=cfg.max_depth, t_min=float(cfg.t_min),
        ns=pack.sphere_rows, nt=pack.tri_rows, kc=pack.clusters,
        kt=pack.tri_clusters, has_checker=pack.has_checker,
        tile0=tile0, n_tiles=t1 - tile0, interpret=interpret, tile=tile,
        k_pix=k_pix, unroll=unroll, margin=pack.phase1_margin,
        gate_mode=gate_mode, grid_lo=pack.grid_lo, grid_inv=pack.grid_inv,
        grid_dims=pack.grid_dims, super_spans=pack.super_spans,
        tri_super_spans=pack.tri_super_spans,
        off=ray0 - tile0 * blk * spp_total, n_out=num_rays,
        spp_sizes=spp_sizes)
