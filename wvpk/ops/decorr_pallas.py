"""Pallas TPU decorrelation kernel (hot loop 2 on device).

The XLA scan version (decorr.py) runs the 16-slot pass chain as a
scan-over-passes per sample and costs ~0.09 us/sample-lane on v5e; this
kernel unrolls the pass chain statically (npasses = the bucket's padded
term count) with all state — per-pass weights and 8-deep history rings —
carried in registers/VMEM across a fori over samples. No gathers or
cross-lane reductions exist in decorr, so the whole body is straight-line
elementwise int32 work: ~20x the XLA scan's throughput.

Semantics mirror UnpackUtils.cs:688-1240 exactly (same contract as
decorr.py): the predictor is (weight * sam + 512) >> 10 computed in 64-bit
then truncated to int32 — emulated here as a 32x32->64 multiply via 16-bit
limb products (Mosaic has no int64) — and weight updates are +/-delta on
sign agreement, clamped to +/-1024 for the negative (cross-channel) terms.
Terms may differ lane to lane; every term class is computed branchlessly
and selected per lane.

Grid: (lane_tiles, sample_chunks); weights/rings persist across sample
chunks in a VMEM scratch (TPU grids run sequentially, innermost last).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts

I32 = jnp.int32
U32 = jnp.uint32


def _bc_i32(x):
    return pltpu.bitcast(x, jnp.int32)


def _bc_u32(x):
    return pltpu.bitcast(x, jnp.uint32)


def _pred(w, sam):
    """(int)((w * (long)sam + 512) >> 10) in i32 ops (UnpackUtils.cs:705).

    Full 64-bit product from 16-bit limbs: with a=w>>16, b=w&0xffff,
    c=sam>>16, d=sam&0xffff (a, c signed; b, d in [0, 2^16)):
    w*sam = ((a*c)<<32) + ((a*d + b*c)<<16) + b*d. All partial products
    fit int32; the mid sum is split into 16-bit limbs to carry exactly.
    """
    a = w >> 16
    b = w & 0xFFFF
    c = sam >> 16
    d = sam & 0xFFFF
    bd = b * d                      # u32 bit pattern (wraps like u32)
    ad = a * d                      # exact in i32
    bc = b * c
    bd_hi = _bc_i32(_bc_u32(bd) >> 16)
    mid_l = (ad & 0xFFFF) + (bc & 0xFFFF) + bd_hi
    mid_h = (ad >> 16) + (bc >> 16) + (mid_l >> 16)
    hi = a * c + mid_h              # high 32 bits of w*sam
    lo = w * sam                    # low 32 bits (wraps)
    # + 512 with carry into hi: unsigned lo >= 2^32-512 <=> -512 <= lo < 0
    lo2 = lo + 512
    carry = jnp.where((lo < 0) & (lo >= -512), 1, 0)
    hi2 = hi + carry
    # >> 10 across the 64-bit pair, truncated to i32
    return _bc_i32(_bc_u32(lo2) >> 10) | (hi2 << 22)


def _upd(w, delta, sam, v):
    do = (sam != 0) & (v != 0)
    step = jnp.where((sam ^ v) < 0, -delta, delta)
    return w + jnp.where(do, step, 0)


def _upd_clamp(w, delta, sam, v):
    do = (sam != 0) & (v != 0)
    neg = (sam ^ v) < 0
    w_neg = jnp.where(do, jnp.maximum(w - delta, -1024), w)
    w_pos = jnp.where(do, jnp.minimum(w + delta, 1024), w)
    return jnp.where(neg, w_neg, w_pos)


def _ring_read(ring, slot8, iota8):
    """ring (8, tile) at scalar slot -> (1, tile). Mosaic has no value
    dynamic_slice; an 8-row onehot select-reduce is ~3 vreg ops."""
    return jnp.sum(jnp.where(iota8 == slot8, ring, 0), axis=0,
                   keepdims=True, dtype=I32)


def _ring_write(ring, pos, val, mask, iota8):
    """ring (8, tile); pos (1, tile) per-lane row; masked onehot write."""
    onehot = (iota8 == pos) & mask
    return jnp.where(onehot, val, ring)


def _static_pass_apply(tv: int, dj, waj, wbj, ring_a, ring_b, va, vb,
                       m_slot, iota8, mono: bool):
    """One term-class-specialized decorr APPLY pass: the decode
    recurrence over residuals (va, vb), updating weights and rings.
    Shared by the decode kernel's static unroll and the encode kernel's
    apply half (encode_pallas.py). Returns
    (va', vb', wa', wb', ring_a', ring_b'); the b slots pass through
    unchanged for mono."""
    ra0 = ring_a[0:1, :]
    if not mono:
        rb0 = ring_b[0:1, :]
    wb_n = wbj
    ob = vb
    if 1 <= tv <= consts.MAX_TERM:
        sam_a = _ring_read(ring_a, m_slot, iota8)
        oa = _pred(waj, sam_a) + va
        wa_n = _upd(waj, dj, sam_a, va)
        pos_slot = (m_slot + tv) & 7
        ring_a = _ring_write(ring_a, pos_slot, oa, True, iota8)
        if not mono:
            sam_b = _ring_read(ring_b, m_slot, iota8)
            ob = _pred(wbj, sam_b) + vb
            wb_n = _upd(wbj, dj, sam_b, vb)
            ring_b = _ring_write(ring_b, pos_slot, ob, True, iota8)
    elif tv in (17, 18):
        ra1 = ring_a[1:2, :]
        sam_a = (2 * ra0 - ra1 if tv == 17 else (3 * ra0 - ra1) >> 1)
        oa = _pred(waj, sam_a) + va
        wa_n = _upd(waj, dj, sam_a, va)
        ring_a = jnp.where(iota8 == 0, oa,
                           jnp.where(iota8 == 1, ra0, ring_a))
        if not mono:
            rb1 = ring_b[1:2, :]
            sam_b = (2 * rb0 - rb1 if tv == 17 else (3 * rb0 - rb1) >> 1)
            ob = _pred(wbj, sam_b) + vb
            wb_n = _upd(wbj, dj, sam_b, vb)
            ring_b = jnp.where(iota8 == 0, ob,
                               jnp.where(iota8 == 1, rb0, ring_b))
    elif tv == -1:
        oa = _pred(waj, ra0) + va
        ob = _pred(wbj, oa) + vb
        wa_n = _upd_clamp(waj, dj, ra0, va)
        wb_n = _upd_clamp(wbj, dj, oa, vb)
        ring_a = jnp.where(iota8 == 0, ob, ring_a)
    elif tv == -2:
        ob = _pred(wbj, rb0) + vb
        oa = _pred(waj, ob) + va
        wa_n = _upd_clamp(waj, dj, ob, va)
        wb_n = _upd_clamp(wbj, dj, rb0, vb)
        ring_b = jnp.where(iota8 == 0, oa, ring_b)
    elif tv == -3:
        oa = _pred(waj, ra0) + va
        ob = _pred(wbj, rb0) + vb
        wa_n = _upd_clamp(waj, dj, ra0, va)
        wb_n = _upd_clamp(wbj, dj, rb0, vb)
        ring_a = jnp.where(iota8 == 0, ob, ring_a)
        ring_b = jnp.where(iota8 == 0, oa, ring_b)
    else:
        raise ValueError(f"bad static term {tv}")
    return oa, ob, wa_n, wb_n, ring_a, ring_b


def _decorr_kernel(state0_ref, meta_ref, res_a_ref, res_b_ref,
                   out_a_ref, out_b_ref, cf_ref, st, *, mono: bool,
                   npasses: int, chunk: int, lane_tile: int,
                   static_terms: tuple | None = None,
                   fold_post: bool = False):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        st[...] = state0_ref[...]

    # state layout per pass k (stereo): wa, wb at rows [2k, 2k+1];
    # rings at [2*npasses + 16k .. +8) (A) and [.. +8 .. +16) (B).
    # mono: wa at [k]; ring A at [npasses + 8k].
    nw = npasses if mono else 2 * npasses

    def load():
        ws = []
        rings = []
        for k in range(npasses):
            if mono:
                ws.append(st[k:k + 1, :])
                rings.append(st[nw + 8 * k:nw + 8 * k + 8, :])
            else:
                ws.append((st[2 * k:2 * k + 1, :],
                           st[2 * k + 1:2 * k + 2, :]))
                base = nw + 16 * k
                rings.append((st[base:base + 8, :],
                              st[base + 8:base + 16, :]))
        return ws, rings

    def store(ws, rings):
        for k in range(npasses):
            if mono:
                st[k:k + 1, :] = ws[k]
                st[nw + 8 * k:nw + 8 * k + 8, :] = rings[k]
            else:
                st[2 * k:2 * k + 1, :] = ws[k][0]
                st[2 * k + 1:2 * k + 2, :] = ws[k][1]
                base = nw + 16 * k
                st[base:base + 8, :] = rings[k][0]
                st[base + 8:base + 16, :] = rings[k][1]

    # per-pass lane metadata rows: term, delta, act (k < num_terms)
    terms = [meta_ref[3 * k:3 * k + 1, :] for k in range(npasses)]
    deltas = [meta_ref[3 * k + 1:3 * k + 2, :] for k in range(npasses)]
    acts = [meta_ref[3 * k + 2:3 * k + 3, :] != 0 for k in range(npasses)]
    iota8 = jax.lax.broadcasted_iota(I32, (8, lane_tile), 0)

    ws0, rings0 = load()
    flat0 = []
    for k in range(npasses):
        if mono:
            flat0 += [ws0[k], rings0[k]]
        else:
            flat0 += [ws0[k][0], ws0[k][1], rings0[k][0], rings0[k][1]]
    ncore = nw + (8 if mono else 16) * npasses
    if fold_post:
        # folded joint/mute/CRC state rides in two extra scratch rows
        flat0 += [st[ncore:ncore + 1, :], st[ncore + 1:ncore + 2, :]]
        ns_row = meta_ref[3 * npasses:3 * npasses + 1, :]
        joint_row = meta_ref[3 * npasses + 1:3 * npasses + 2, :] != 0
        thr_row = meta_ref[3 * npasses + 2:3 * npasses + 3, :]

    def body(tt, carry):
        carry = list(carry)
        t = j * chunk + tt
        m_slot = t & 7
        va = res_a_ref[pl.ds(tt, 1), :]
        vb = None if mono else res_b_ref[pl.ds(tt, 1), :]

        for k in range(npasses):
            if mono:
                waj, ring_a = carry[2 * k], carry[2 * k + 1]
            else:
                waj, wbj = carry[4 * k], carry[4 * k + 1]
                ring_a, ring_b = carry[4 * k + 2], carry[4 * k + 3]

            if static_terms is not None:
                # specialized pass: the bucket's lanes all share this term
                # chain, so only this pass's term class is emitted (no
                # per-class selects, no act mask, scalar ring slots) —
                # ~2x fewer ops than the generic body on deep chains
                va, vb, wa_n, wb_n, ring_a, ring_b = _static_pass_apply(
                    static_terms[k], deltas[k], waj,
                    None if mono else wbj, ring_a,
                    None if mono else ring_b, va, vb, m_slot, iota8, mono)
                if mono:
                    carry[2 * k] = wa_n
                    carry[2 * k + 1] = ring_a
                else:
                    carry[4 * k] = wa_n
                    carry[4 * k + 1] = wb_n
                    carry[4 * k + 2] = ring_a
                    carry[4 * k + 3] = ring_b
                continue

            term, dj, act = terms[k], deltas[k], acts[k]
            t17 = term == 17
            t18 = term == 18
            pos = (term >= 1) & (term <= consts.MAX_TERM)

            ra0 = ring_a[0:1, :]
            ra1 = ring_a[1:2, :]
            sam_17_a = 2 * ra0 - ra1
            sam_18_a = (3 * ra0 - ra1) >> 1
            sam_ring_a = _ring_read(ring_a, m_slot, iota8)
            sam_a_pre = jnp.where(t17, sam_17_a,
                                  jnp.where(t18, sam_18_a,
                                            jnp.where(pos, sam_ring_a, ra0)))

            if mono:
                oa = _pred(waj, sam_a_pre) + va
                wa_upd = _upd(waj, dj, sam_a_pre, va)
                pos_slot = (m_slot + term) & 7
                ring_pos = _ring_write(ring_a, pos_slot, oa, pos, iota8)
                sh_mask = (iota8 == 0) & (t17 | t18)
                sh1_mask = (iota8 == 1) & (t17 | t18)
                ring_1718 = jnp.where(sh_mask, oa,
                                      jnp.where(sh1_mask, ra0, ring_a))
                ring_new = jnp.where(pos, ring_pos, ring_1718)
                va = jnp.where(act, oa, va)
                carry[2 * k] = jnp.where(act, wa_upd, waj)
                carry[2 * k + 1] = jnp.where(act, ring_new, ring_a)
                continue

            n1 = term == -1
            n2 = term == -2
            n3 = term == -3
            negterm = n1 | n2 | n3

            rb0 = ring_b[0:1, :]
            rb1 = ring_b[1:2, :]
            sam_17_b = 2 * rb0 - rb1
            sam_18_b = (3 * rb0 - rb1) >> 1
            sam_ring_b = _ring_read(ring_b, m_slot, iota8)
            sam_b_pre = jnp.where(t17, sam_17_b,
                                  jnp.where(t18, sam_18_b,
                                            jnp.where(pos, sam_ring_b, rb0)))

            oa1 = _pred(waj, sam_a_pre) + va
            # A-first (all but -2); -1 feeds oa into B
            sam_b_eff = jnp.where(n1, oa1, sam_b_pre)
            ob1 = _pred(wbj, sam_b_eff) + vb
            # B-first (term -2)
            ob2 = _pred(wbj, rb0) + vb
            oa2 = _pred(waj, ob2) + va

            oa = jnp.where(n2, oa2, oa1)
            ob = jnp.where(n2, ob2, ob1)
            sam_a_eff = jnp.where(n2, ob2, sam_a_pre)

            wa_upd = jnp.where(negterm, _upd_clamp(waj, dj, sam_a_eff, va),
                               _upd(waj, dj, sam_a_eff, va))
            wb_upd = jnp.where(negterm, _upd_clamp(wbj, dj, sam_b_eff, vb),
                               _upd(wbj, dj, sam_b_eff, vb))

            pos_slot = (m_slot + term) & 7
            ra_pos = _ring_write(ring_a, pos_slot, oa, pos, iota8)
            rb_pos = _ring_write(ring_b, pos_slot, ob, pos, iota8)
            sh = t17 | t18
            ra_sh = jnp.where((iota8 == 0) & sh, oa,
                              jnp.where((iota8 == 1) & sh, ra0, ring_a))
            rb_sh = jnp.where((iota8 == 0) & sh, ob,
                              jnp.where((iota8 == 1) & sh, rb0, ring_b))
            # -1: samples_A[0] = ob; -2: samples_B[0] = oa; -3: both
            ra_neg = jnp.where((iota8 == 0) & (n1 | n3), ob, ring_a)
            rb_neg = jnp.where((iota8 == 0) & (n2 | n3), oa, ring_b)

            ra_new = jnp.where(pos, ra_pos,
                               jnp.where(sh, ra_sh,
                                         jnp.where(negterm, ra_neg, ring_a)))
            rb_new = jnp.where(pos, rb_pos,
                               jnp.where(sh, rb_sh,
                                         jnp.where(negterm, rb_neg, ring_b)))

            va = jnp.where(act, oa, va)
            vb = jnp.where(act, ob, vb)
            carry[4 * k] = jnp.where(act, wa_upd, waj)
            carry[4 * k + 1] = jnp.where(act, wb_upd, wbj)
            carry[4 * k + 2] = jnp.where(act, ra_new, ring_a)
            carry[4 * k + 3] = jnp.where(act, rb_new, ring_b)

        if fold_post:
            # folded joint-stereo undo + mute check + CRC
            # (ops/post.py::joint_mute_crc, UnpackUtils.cs:609-646): all
            # i32 ops wrap like the reference; the per-lane threshold is
            # min(mute_limit, 2^31-1) so limits past int32 never fire
            # (|cabs| <= 2^31-1, and cabs(-2^31) stays negative), and
            # C# unchecked abs falls out of the two's-complement negate
            crc, fb = carry[-2], carry[-1]
            valid = t < ns_row
            if mono:
                out_l = va
                cab = jnp.where(out_l < 0, -out_l, out_l)
                bad = valid & (cab > thr_row)
                fb = jnp.where(bad & (fb == ns_row), t, fb)
                crc = jnp.where(valid & (t < fb), crc * 3 + out_l, crc)
            else:
                l0, r0 = va, vb
                r1 = r0 - (l0 >> 1)
                l1 = l0 + r1
                out_l = jnp.where(joint_row, l1, l0)
                out_r = jnp.where(joint_row, r1, r0)
                cab_l = jnp.where(out_l < 0, -out_l, out_l)
                cab_r = jnp.where(out_r < 0, -out_r, out_r)
                bad = valid & ((cab_l > thr_row) | (cab_r > thr_row))
                fb = jnp.where(bad & (fb == ns_row), t, fb)
                crc = jnp.where(valid & (t < fb),
                                crc * 9 + out_l * 3 + out_r, crc)
                vb = out_r
            va = out_l
            carry[-2], carry[-1] = crc, fb
        out_a_ref[pl.ds(tt, 1), :] = va
        if not mono:
            out_b_ref[pl.ds(tt, 1), :] = vb
        return tuple(carry)

    final = jax.lax.fori_loop(0, chunk, body, tuple(flat0))

    ws = []
    rings = []
    for k in range(npasses):
        if mono:
            ws.append(final[2 * k])
            rings.append(final[2 * k + 1])
        else:
            ws.append((final[4 * k], final[4 * k + 1]))
            rings.append((final[4 * k + 2], final[4 * k + 3]))
    store(ws, rings)
    if fold_post:
        st[ncore:ncore + 1, :] = final[-2]
        st[ncore + 1:ncore + 2, :] = final[-1]
        cf_ref[0:1, :] = final[-2]
        cf_ref[1:2, :] = final[-1]


def _npasses_static(num_terms_max: int) -> int:
    """Pad the unrolled pass count to a small set so each bucket profile
    compiles at most a handful of kernel variants. 10 and 12 are real
    encoder presets ("high" uses 10 terms); padding those to 16 wasted
    60% of the decorr unroll on the multichannel-24bit config."""
    for n in (2, 4, 8, 10, 12, 16):
        if num_terms_max <= n:
            return n
    return 16


@partial(jax.jit, static_argnames=("mono", "npasses", "interpret",
                                   "static_terms", "fold_post"))
def _decorr_pallas_call(res_a, res_b, state0, meta, *, mono: bool,
                        npasses: int, interpret: bool,
                        static_terms: tuple | None = None,
                        fold_post: bool = False):
    T, Lp = res_a.shape
    lane_tile = min(Lp, 512)
    chunk = min(T, 512)
    grid = (Lp // lane_tile, T // chunk)
    nstate = state0.shape[0]
    nmeta = meta.shape[0]
    kernel = partial(_decorr_kernel, mono=mono, npasses=npasses,
                     chunk=chunk, lane_tile=lane_tile,
                     static_terms=static_terms, fold_post=fold_post)
    out_shape = [jax.ShapeDtypeStruct((T, Lp), I32),
                 jax.ShapeDtypeStruct((T, Lp), I32),
                 jax.ShapeDtypeStruct((2, Lp), I32)]
    with jax.enable_x64(False):
        out_a, out_b, cf = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nstate, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nmeta, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((nstate, lane_tile), I32)],
            out_shape=out_shape,
            interpret=interpret,
        )(state0, meta, res_a, res_b)
    return out_a, out_b, cf


def decorr_decode_pallas(residuals, terms, deltas, w0_a, w0_b, hist0_a,
                         hist0_b, num_terms, *, mono: bool,
                         num_terms_max: int, interpret: bool = False,
                         static_terms: tuple | None = None,
                         fold_post_args: tuple | None = None):
    """Pallas decorrelation; same contract as decorr.decorr_decode.

    residuals (T, L, C) int32; terms/deltas (L, 16) int32; w0 (L, 16)
    int32; hist0 (L, 16, 8) int64 (int32-valued); num_terms (L,) int32.
    num_terms_max must bound num_terms.max() (static; from the bucket).
    static_terms: when every lane shares this exact term chain, compiles
    a specialized unroll (one term class per pass, npasses = the exact
    chain length, no per-class selects). Returns (T, L, C) int32.

    fold_post_args = (nsamples (L,), joint (L,), mute_limit (L,) int64):
    additionally folds the joint-stereo undo + mute-limit check + CRC
    (ops/post.py::joint_mute_crc) into the same sample scan; outputs are
    then POST-JOINT (not zeroed for mute/padding — the caller masks) and
    the return becomes (out, crc (L,) i32, first_bad (L,) i32).
    """
    T, L, C = residuals.shape
    if static_terms is not None:
        assert len(static_terms) <= num_terms_max
        npasses = len(static_terms)
    else:
        npasses = _npasses_static(num_terms_max)
    lane_tile = min(512, max(128, 1 << max(L - 1, 1).bit_length()))
    Lp = ((L + lane_tile - 1) // lane_tile) * lane_tile
    chunk = min(T, 512)
    Tp = ((T + chunk - 1) // chunk) * chunk

    def pad_lanes(x):
        return jnp.pad(x, ((0, Lp - L),) + ((0, 0),) * (x.ndim - 1))

    res_a = jnp.pad(pad_lanes(residuals[:, :, 0].T),
                    ((0, 0), (0, Tp - T))).T
    res_b = (jnp.pad(pad_lanes(residuals[:, :, 1].T),
                     ((0, 0), (0, Tp - T))).T if C == 2
             else jnp.zeros_like(res_a))

    terms = pad_lanes(terms.astype(I32))
    deltas = pad_lanes(deltas.astype(I32))
    w0_a = pad_lanes(w0_a.astype(I32))
    w0_b = pad_lanes(w0_b.astype(I32))
    hist0_a = pad_lanes(hist0_a.astype(I32))
    hist0_b = pad_lanes(hist0_b.astype(I32))
    num_terms = pad_lanes(num_terms.astype(I32))

    fold = fold_post_args is not None
    # meta rows: (term, delta, act) x npasses [+ ns, joint, mute_thr]
    meta = jnp.zeros((3 * npasses + (3 if fold else 0), Lp), I32)
    for k in range(npasses):
        meta = meta.at[3 * k].set(terms[:, k])
        meta = meta.at[3 * k + 1].set(deltas[:, k])
        meta = meta.at[3 * k + 2].set((k < num_terms).astype(I32))
    if fold:
        ns_f, joint_f, mute_limit_f = fold_post_args
        ns_pad = pad_lanes(jnp.asarray(ns_f).astype(I32))
        meta = meta.at[3 * npasses].set(ns_pad)
        meta = meta.at[3 * npasses + 1].set(
            pad_lanes(jnp.asarray(joint_f).astype(I32)))
        # clamp the limit to i32: |cabs| <= 2^31-1 so larger limits can
        # never fire (and cabs(-2^31) stays negative) — exact vs the
        # int64 compare in joint_mute_crc
        thr = jnp.minimum(jnp.asarray(mute_limit_f).astype(jnp.int64),
                          (1 << 31) - 1).astype(I32)
        meta = meta.at[3 * npasses + 2].set(pad_lanes(thr))

    nw = npasses if mono else 2 * npasses
    nstate = nw + (8 if mono else 16) * npasses + (2 if fold else 0)
    state0 = jnp.zeros((nstate, Lp), I32)
    for k in range(npasses):
        if mono:
            state0 = state0.at[k].set(w0_a[:, k])
            state0 = state0.at[nw + 8 * k:nw + 8 * k + 8].set(
                hist0_a[:, k, :].T)
        else:
            state0 = state0.at[2 * k].set(w0_a[:, k])
            state0 = state0.at[2 * k + 1].set(w0_b[:, k])
            base = nw + 16 * k
            state0 = state0.at[base:base + 8].set(hist0_a[:, k, :].T)
            state0 = state0.at[base + 8:base + 16].set(hist0_b[:, k, :].T)
    if fold:
        state0 = state0.at[nstate - 2].set(I32(-1))          # crc init
        state0 = state0.at[nstate - 1].set(ns_pad)           # first_bad

    out_a, out_b, cf = _decorr_pallas_call(
        res_a, res_b, state0, meta, mono=mono, npasses=npasses,
        interpret=interpret, static_terms=static_terms, fold_post=fold)
    out = (out_a[:T, :L, None] if mono
           else jnp.stack([out_a[:T, :L], out_b[:T, :L]], axis=2))
    if fold:
        return out, cf[0, :L], cf[1, :L]
    return out
