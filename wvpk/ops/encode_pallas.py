"""Pallas TPU ENCODE kernels (lossless two-scan path).

The XLA scan versions (encode_kernels.py) are bound by scan-step
overhead and int64 emulation; these kernels run the same two hot loops
with all state resident in VMEM/registers, mirroring the decode
kernels' structure:

- `decorr_invert_pallas`: per sample, a read-only reverse PEEL of the
  static term chain (the encode direction of UnpackUtils.cs:688-1240)
  followed by the decode-identical APPLY over the residuals — the apply
  pass body is literally shared with the decode kernel
  (decorr_pallas._static_pass_apply), so the carried state evolves
  bit-identically to what the decoder will compute. The device encoder
  always encodes one homogeneous term chain per call, so the
  specialized (static_terms) unroll is the only variant.

- `entropy_encode_pallas`: the word automaton of encode_kernels.py::
  entropy_encode_words run forward. Unlike the DECODE entropy kernel
  this needs no bitstream window, no group cache, and no cross-lane
  reduces — it is output-only and fully branchless per lane. The one
  nontrivial scalar op the encode direction adds is an integer
  division for the ones_count ((av - g0 - g1) / g2,
  WordsUtils.cs:272-511's interval inverted); Mosaic has no vector
  integer divide, so it runs as two f32-reciprocal stages plus two
  exactness fixups (exact for the encoder's operating range, tested
  adversarially).

All arithmetic is 32-bit (TPU-native). Operating contract (same as the
XLA kernels, enforced by engine/device_encoder.py): stored magnitudes
< 2^27 and non-negative quantized medians, which keeps every
intermediate (ones_count, flush_raw, code widths <= 32 bits) inside
i32/u32. Segment A is a 128-bit quantity held as four u32 limbs
(worst case 17 + 30 + 28 + 32 = 107 bits); segment B and the pending
payload fit one u32 (code width <= 31 + sign).

Grid: (lane_tiles, chunks); state persists across chunks in a VMEM
scratch (TPU grids run sequentially, innermost last).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts
from .decorr_pallas import (_bc_i32, _bc_u32, _pred, _ring_read,
                            _static_pass_apply)

I32 = jnp.int32
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# decorrelation inversion (peel + apply)
# ---------------------------------------------------------------------------


def _static_pass_peel(tv: int, waj, wbj, ring_a, ring_b, va, vb, m_slot,
                      iota8, mono: bool):
    """Read-only reverse peel of one pass (encode_kernels._peel_stereo
    semantics, term class static): subtract this pass's prediction from
    the current partially-peeled values. State is NOT updated (the
    apply half does that over the residuals)."""
    ra0 = ring_a[0:1, :]
    if 1 <= tv <= consts.MAX_TERM:
        sam_a = _ring_read(ring_a, m_slot, iota8)
        va2 = va - _pred(waj, sam_a)
        if mono:
            return va2, None
        sam_b = _ring_read(ring_b, m_slot, iota8)
        return va2, vb - _pred(wbj, sam_b)
    if tv in (17, 18):
        ra1 = ring_a[1:2, :]
        sam_a = 2 * ra0 - ra1 if tv == 17 else (3 * ra0 - ra1) >> 1
        va2 = va - _pred(waj, sam_a)
        if mono:
            return va2, None
        rb0 = ring_b[0:1, :]
        rb1 = ring_b[1:2, :]
        sam_b = 2 * rb0 - rb1 if tv == 17 else (3 * rb0 - rb1) >> 1
        return va2, vb - _pred(wbj, sam_b)
    # cross-channel terms: the peel reads the CURRENT (pre-peel) partner
    # value where the apply chained its output (encode_kernels.py:120-137)
    if tv == -1:
        return va - _pred(waj, ra0), vb - _pred(wbj, va)
    if tv == -2:
        return va - _pred(waj, vb), vb - _pred(wbj, ring_b[0:1, :])
    if tv == -3:
        return va - _pred(waj, ra0), vb - _pred(wbj, ring_b[0:1, :])
    raise ValueError(f"bad static term {tv}")


def _invert_kernel(state0_ref, meta_ref, targ_a_ref, targ_b_ref,
                   res_a_ref, res_b_ref, stfin_ref, st, *, mono: bool,
                   npasses: int, chunk: int, lane_tile: int,
                   static_terms: tuple):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        st[...] = state0_ref[...]

    nw = npasses if mono else 2 * npasses
    deltas = [meta_ref[k:k + 1, :] for k in range(npasses)]
    iota8 = jax.lax.broadcasted_iota(I32, (8, lane_tile), 0)

    flat0 = []
    for k in range(npasses):
        if mono:
            flat0 += [st[k:k + 1, :], st[nw + 8 * k:nw + 8 * k + 8, :]]
        else:
            base = nw + 16 * k
            flat0 += [st[2 * k:2 * k + 1, :], st[2 * k + 1:2 * k + 2, :],
                      st[base:base + 8, :], st[base + 8:base + 16, :]]

    def body(tt, carry):
        carry = list(carry)
        t = j * chunk + tt
        m_slot = t & 7
        va = targ_a_ref[pl.ds(tt, 1), :]
        vb = None if mono else targ_b_ref[pl.ds(tt, 1), :]

        # peel: read-only, passes in reverse
        for k in reversed(range(npasses)):
            if mono:
                waj, ring_a = carry[2 * k], carry[2 * k + 1]
                wbj = ring_b = None
            else:
                waj, wbj = carry[4 * k], carry[4 * k + 1]
                ring_a, ring_b = carry[4 * k + 2], carry[4 * k + 3]
            va, vb = _static_pass_peel(static_terms[k], waj, wbj, ring_a,
                                       ring_b, va, vb, m_slot, iota8, mono)
        res_a_ref[pl.ds(tt, 1), :] = va
        if not mono:
            res_b_ref[pl.ds(tt, 1), :] = vb

        # apply: the decode recurrence over the residuals (updates state)
        for k in range(npasses):
            if mono:
                waj, ring_a = carry[2 * k], carry[2 * k + 1]
                wbj = ring_b = None
            else:
                waj, wbj = carry[4 * k], carry[4 * k + 1]
                ring_a, ring_b = carry[4 * k + 2], carry[4 * k + 3]
            va, vb, wa_n, wb_n, ring_a, ring_b = _static_pass_apply(
                static_terms[k], deltas[k], waj, wbj, ring_a, ring_b,
                va, vb, m_slot, iota8, mono)
            if mono:
                carry[2 * k] = wa_n
                carry[2 * k + 1] = ring_a
            else:
                carry[4 * k] = wa_n
                carry[4 * k + 1] = wb_n
                carry[4 * k + 2] = ring_a
                carry[4 * k + 3] = ring_b
        return tuple(carry)

    final = jax.lax.fori_loop(0, chunk, body, tuple(flat0))

    for k in range(npasses):
        if mono:
            st[k:k + 1, :] = final[2 * k]
            st[nw + 8 * k:nw + 8 * k + 8, :] = final[2 * k + 1]
        else:
            st[2 * k:2 * k + 1, :] = final[4 * k]
            st[2 * k + 1:2 * k + 2, :] = final[4 * k + 1]
            base = nw + 16 * k
            st[base:base + 8, :] = final[4 * k + 2]
            st[base + 8:base + 16, :] = final[4 * k + 3]
    stfin_ref[...] = st[...]


@partial(jax.jit, static_argnames=("mono", "static_terms", "interpret",
                                   "with_state"))
def decorr_invert_pallas(targets, deltas, w0a, w0b, h0a, h0b, *,
                         mono: bool, static_terms: tuple,
                         interpret: bool = False,
                         with_state: bool = False):
    """Pallas decorrelation inversion; same contract as
    encode_kernels.decorr_invert_warm restricted to a homogeneous
    static term chain (the device encoder's only case).

    targets (T, L, C) int32 scan-major; deltas (L, 16); w0a/w0b (L, 16);
    h0a/h0b (L, 16, 8) (int32-valued). Returns (T, L, C) int32
    residuals; with_state additionally the final (wa, wb, sa, sb) in
    the XLA kernel's layouts."""
    T, L, C = targets.shape
    npasses = len(static_terms)
    assert npasses >= 1
    lane_tile = min(512, max(128, 1 << max(L - 1, 1).bit_length()))
    Lp = ((L + lane_tile - 1) // lane_tile) * lane_tile
    chunk = min(T, 512)
    Tp = ((T + chunk - 1) // chunk) * chunk

    def pad_lanes(x):
        return jnp.pad(x, ((0, Lp - L),) + ((0, 0),) * (x.ndim - 1))

    targ_a = jnp.pad(pad_lanes(targets[:, :, 0].T), ((0, 0), (0, Tp - T))).T
    targ_b = (jnp.pad(pad_lanes(targets[:, :, 1].T),
                      ((0, 0), (0, Tp - T))).T if C == 2
              else jnp.zeros_like(targ_a))

    deltas = pad_lanes(deltas.astype(I32))
    w0a = pad_lanes(w0a.astype(I32))
    w0b = pad_lanes(w0b.astype(I32))
    h0a = pad_lanes(h0a.astype(I32))
    h0b = pad_lanes(h0b.astype(I32))

    meta = jnp.zeros((npasses, Lp), I32)
    for k in range(npasses):
        meta = meta.at[k].set(deltas[:, k])

    nw = npasses if mono else 2 * npasses
    nstate = nw + (8 if mono else 16) * npasses
    state0 = jnp.zeros((nstate, Lp), I32)
    for k in range(npasses):
        if mono:
            state0 = state0.at[k].set(w0a[:, k])
            state0 = state0.at[nw + 8 * k:nw + 8 * k + 8].set(
                h0a[:, k, :].T)
        else:
            state0 = state0.at[2 * k].set(w0a[:, k])
            state0 = state0.at[2 * k + 1].set(w0b[:, k])
            base = nw + 16 * k
            state0 = state0.at[base:base + 8].set(h0a[:, k, :].T)
            state0 = state0.at[base + 8:base + 16].set(h0b[:, k, :].T)

    grid = (Lp // lane_tile, Tp // chunk)
    kernel = partial(_invert_kernel, mono=mono, npasses=npasses,
                     chunk=chunk, lane_tile=lane_tile,
                     static_terms=static_terms)
    out_shape = [jax.ShapeDtypeStruct((Tp, Lp), I32),
                 jax.ShapeDtypeStruct((Tp, Lp), I32),
                 jax.ShapeDtypeStruct((nstate, Lp), I32)]
    with jax.enable_x64(False):
        res_a, res_b, stfin = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nstate, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npasses, lane_tile), lambda i, j: (0, i),
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
                pl.BlockSpec((nstate, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((nstate, lane_tile), I32)],
            out_shape=out_shape,
            interpret=interpret,
        )(state0, meta, targ_a, targ_b)

    res = (res_a[:T, :L, None] if mono
           else jnp.stack([res_a[:T, :L], res_b[:T, :L]], axis=2))
    if not with_state:
        return res
    # final state back to the XLA layouts ((L, 16) / (L, 16, 8), padded
    # to 16 slots; int64 dtype for drop-in parity)
    wa = jnp.zeros((L, 16), jnp.int64)
    wb = jnp.zeros((L, 16), jnp.int64)
    ha = jnp.zeros((L, 16, 8), jnp.int64)
    hb = jnp.zeros((L, 16, 8), jnp.int64)
    for k in range(npasses):
        if mono:
            wa = wa.at[:, k].set(stfin[k, :L].astype(jnp.int64))
            ha = ha.at[:, k, :].set(
                stfin[nw + 8 * k:nw + 8 * k + 8, :L].T.astype(jnp.int64))
        else:
            wa = wa.at[:, k].set(stfin[2 * k, :L].astype(jnp.int64))
            wb = wb.at[:, k].set(stfin[2 * k + 1, :L].astype(jnp.int64))
            base = nw + 16 * k
            ha = ha.at[:, k, :].set(
                stfin[base:base + 8, :L].T.astype(jnp.int64))
            hb = hb.at[:, k, :].set(
                stfin[base + 8:base + 16, :L].T.astype(jnp.int64))
    if mono:
        wb, hb = wa, ha
    return res, (wa, wb, ha, hb)


# ---------------------------------------------------------------------------
# entropy word encoding
# ---------------------------------------------------------------------------

# state rows in the persistent scratch (PBITS is a u32 bit pattern)
(E_M0A, E_M1A, E_M2A, E_M0B, E_M1B, E_M2B, E_ZACC, E_CLEAR,
 E_PVALID, E_POC, E_PBITS, E_PNB, E_NSTATE) = range(13)
# read-only row appended after the state: valid word count per lane
E_NEXTRA = 1


def _bitlen(v):
    """bit_length of a non-negative i32."""
    return jnp.where(v > 0, 32 - _bc_i32(jax.lax.clz(_bc_u32(v))), 0)


def _mask_u32(n):
    """(1 << n) - 1 for n in [0, 32] (i32 count -> u32 mask)."""
    full = n >= 32
    nn = _bc_u32(jnp.clip(n, 0, 31))
    return jnp.where(full, U32(0xFFFFFFFF), (U32(1) << nn) - U32(1))


def _shl_u32(x, s):
    """x << s, 0 outside [0, 32) (i32 shift count)."""
    ok = (s >= 0) & (s < 32)
    return jnp.where(ok, x << _bc_u32(jnp.clip(s, 0, 31)), U32(0))


def _shr_u32(x, s):
    ok = (s >= 0) & (s < 32)
    return jnp.where(ok, x >> _bc_u32(jnp.clip(s, 0, 31)), U32(0))


def _win32(b, o):
    """Low-32 window of u32 b shifted left by signed offset o:
    (u64(b) << o) & 0xFFFFFFFF, with o possibly negative."""
    return jnp.where(o >= 0, _shl_u32(b, o), _shr_u32(b, -o))


def _udiv(n, d):
    """floor(n / d) for i32 n >= 0, d >= 1: two f32-reciprocal stages
    plus two exactness fixups. Stage 1 leaves |r| <= ~(n * 2^-20 + 1)*d,
    stage 2 leaves |q error| <= 2 even with a sloppy (non-correctly-
    rounded) hardware f32 divide; the fixups then make q exact. Exact
    for n < 2^28 (the encoder's residual range; q*d stays far from i32
    overflow)."""
    df = d.astype(jnp.float32)
    q = (n.astype(jnp.float32) / df).astype(I32)
    r = n - q * d
    q = q + (r.astype(jnp.float32) / df).astype(I32)
    r = n - q * d
    q = q + jnp.where(r >= d, 1, 0) - jnp.where(r < 0, 1, 0)
    r = n - q * d
    q = q + jnp.where(r >= d, 1, 0) - jnp.where(r < 0, 1, 0)
    return q


def _gamma_slots(v):
    """Elias-style escape code of i32 v >= 0 (WordsUtils.cs:321-335) as
    two append slots (bits1 u32, len1, bits2 u32, len2)."""
    c = _bitlen(v)
    small = v < 2
    b1 = jnp.where(small, _mask_u32(v), _mask_u32(c))
    l1 = jnp.where(small, v + 1, c + 1)
    b2 = jnp.where(small, U32(0), _bc_u32(v) & _mask_u32(c - 1))
    l2 = jnp.where(small, 0, c - 1)
    return b1, l1, b2, l2


def _app128(limbs, ln, bits, nb):
    """Append nb (<= 32) bits (u32) at position ln into the 4-u32-limb
    segment; returns (limbs, ln + nb). nb == 0 appends nothing."""
    b = jnp.where(nb > 0, bits, U32(0))
    out = [li | _win32(b, ln - 32 * i) for i, li in enumerate(limbs)]
    return out, ln + nb


def _encode_words_kernel(state0_ref, res_ref, zlen_ref, a0_ref, a1_ref,
                         a2_ref, a3_ref, alen_ref, bb_ref, bl_ref,
                         stfin_ref, st, *, mono: bool, chunk: int,
                         lane_tile: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        st[...] = state0_ref[...]

    def load_state():
        out = []
        for k in range(E_NSTATE):
            row = st[k:k + 1, :]
            out.append(_bc_u32(row) if k == E_PBITS else row)
        out.append(state0_ref[E_NSTATE:E_NSTATE + 1, :])  # nvals (ro)
        return tuple(out)

    def body(tt, carry):
        (m0a, m1a, m2a, m0b, m1b, m2b, zacc, clear, pvalid, poc,
         pbits, pnb, nvals) = carry
        t = j * chunk + tt
        r = res_ref[pl.ds(tt, 1), :]
        z = zlen_ref[pl.ds(tt, 1), :]
        valid = t < nvals
        clear_b = clear != 0
        pvalid_b = pvalid != 0
        if mono:
            m0, m1, m2 = m0a, m1a, m2a
        else:
            is_b = (t & 1) == 1          # scalar channel parity
            m0 = jnp.where(is_b, m0b, m0a)
            m1 = jnp.where(is_b, m1b, m1a)
            m2 = jnp.where(is_b, m2b, m2a)

        sign = r < 0
        av = jnp.where(sign, ~r, r)

        # ---- zero-run bookkeeping (encode_kernels.py:375-384) ----
        tiny = ((m0a & ~1) == 0) & ((m0b & ~1) == 0)
        gate = clear_b & tiny & valid
        z1 = gate & (zacc > 0)
        zacc1 = jnp.where(z1, zacc - 1, zacc)
        midrun = z1 & (zacc1 > 0)
        z2 = gate & (zacc == 0)
        start = z2 & (z > 0)
        zacc2 = jnp.where(start, z, zacc1)
        normal = valid & ~midrun & ~start

        # ---- ones_count from pre-update medians ----
        g0 = (m0 >> 4) + 1
        g1 = (m1 >> 4) + 1
        g2 = jnp.maximum((m2 >> 4) + 1, 1)
        q = _udiv(jnp.maximum(av - g0 - g1, 0), g2)
        oc = jnp.where(av < g0, 0, jnp.where(av < g0 + g1, 1, 2 + q))

        # ---- holding resolution ----
        fromclear = normal & clear_b
        h0 = normal & ~clear_b & (oc == 0)
        h1 = normal & ~clear_b & (oc != 0)
        do_flush = (h0 | h1) & pvalid_b
        flush_raw = 2 * poc + jnp.where(h1, 1, 0)

        # ---- segment A: flush (unary / escape+gamma + pended payload)
        # XOR run gamma(z) — mutually exclusive by clear ----
        esc = flush_raw >= consts.LIMIT_ONES
        gb1, gl1, gb2, gl2 = _gamma_slots(
            jnp.maximum(flush_raw - consts.LIMIT_ONES, 0))
        zb1, zl1, zb2, zl2 = _gamma_slots(jnp.where(z2, z, 0))
        # slot 1 lands at offset 0: direct assignment, <= 17 bits
        s1b = jnp.where(do_flush,
                        jnp.where(esc,
                                  U32((1 << consts.LIMIT_ONES) - 1),
                                  _mask_u32(flush_raw)),
                        zb1)
        s1l = jnp.where(do_flush,
                        jnp.where(esc, consts.LIMIT_ONES + 1,
                                  flush_raw + 1),
                        jnp.where(z2, zl1, 0))
        limbs = [s1b, jnp.zeros_like(s1b), jnp.zeros_like(s1b),
                 jnp.zeros_like(s1b)]
        ln = s1l
        # slots 2+3: escape gamma | run-gamma value part
        limbs, ln = _app128(
            limbs, ln, jnp.where(do_flush, jnp.where(esc, gb1, U32(0)),
                                 zb2),
            jnp.where(do_flush, jnp.where(esc, gl1, 0),
                      jnp.where(z2, zl2, 0)))
        limbs, ln = _app128(limbs, ln,
                            jnp.where(do_flush & esc, gb2, U32(0)),
                            jnp.where(do_flush & esc, gl2, 0))
        # slot 4: the flushed word's pended payload bits
        limbs, ln = _app128(limbs, ln, jnp.where(do_flush, pbits, U32(0)),
                            jnp.where(do_flush, pnb, 0))

        # ---- median interval + 5/7-2/7 adaptation (i32 wrap == C#) ----
        m0n = jnp.where(oc == 0,
                        m0 - ((m0 + (consts.DIV0 - 2)) >> 7) * 2,
                        m0 + ((m0 + consts.DIV0) >> 7) * 5)
        m1n = jnp.where(oc <= 0, m1,
                        jnp.where(oc == 1,
                                  m1 - ((m1 + (consts.DIV1 - 2)) >> 6) * 2,
                                  m1 + ((m1 + consts.DIV1) >> 6) * 5))
        m2n = jnp.where(oc <= 1, m2,
                        jnp.where(oc == 2,
                                  m2 - ((m2 + (consts.DIV2 - 2)) >> 5) * 2,
                                  m2 + ((m2 + consts.DIV2) >> 5) * 5))
        low = jnp.where(oc == 0, 0,
                        g0 + jnp.where(oc == 1, 0, g1 + (oc - 2) * g2))
        high = low + jnp.where(oc == 0, g0,
                               jnp.where(oc == 1, g1, g2)) - 1

        # ---- value payload: read_code inverse + sign ----
        code = av - low
        maxcode = high - low
        bitcount = _bitlen(maxcode)
        extras = _bc_i32(_shl_u32(U32(1), bitcount)) - maxcode - 1
        small = code < extras
        cc = code + extras
        vb = jnp.where(small, _bc_u32(code),
                       _bc_u32(cc >> 1)
                       | _shl_u32(_bc_u32(cc & 1),
                                  jnp.maximum(bitcount - 1, 0)))
        vl = jnp.where(bitcount == 0, 0,
                       jnp.where(small, bitcount - 1, bitcount))
        wbits = vb | _shl_u32(jnp.where(sign, U32(1), U32(0)), vl)
        wnb = vl + 1

        # ---- segment B: h0-consumed immediate payload ----
        segB_bits = jnp.where(h0, wbits, U32(0))
        segB_len = jnp.where(h0, wnb, 0)

        # ---- state updates ----
        m0c = jnp.where(normal, m0n, m0)
        m1c = jnp.where(normal, m1n, m1)
        m2c = jnp.where(normal, m2n, m2)
        if mono:
            m0a, m1a, m2a = m0c, m1c, m2c
        else:
            m0a = jnp.where(is_b, m0a, m0c)
            m1a = jnp.where(is_b, m1a, m1c)
            m2a = jnp.where(is_b, m2a, m2c)
            m0b = jnp.where(is_b, m0c, m0b)
            m1b = jnp.where(is_b, m1c, m1b)
            m2b = jnp.where(is_b, m2c, m2b)
        m0a = jnp.where(start, 0, m0a)
        m1a = jnp.where(start, 0, m1a)
        m2a = jnp.where(start, 0, m2a)
        m0b = jnp.where(start, 0, m0b)
        m1b = jnp.where(start, 0, m1b)
        m2b = jnp.where(start, 0, m2b)

        emit_unary = fromclear | h1
        pvalid = jnp.where(emit_unary, 1,
                           jnp.where(do_flush, 0, pvalid))
        poc = jnp.where(emit_unary, oc - jnp.where(h1, 1, 0), poc)
        pbits = jnp.where(emit_unary, wbits, pbits)
        pnb = jnp.where(emit_unary, wnb, pnb)
        clear = jnp.where(h0, 1, jnp.where(emit_unary, 0, clear))

        a0_ref[pl.ds(tt, 1), :] = _bc_i32(limbs[0])
        a1_ref[pl.ds(tt, 1), :] = _bc_i32(limbs[1])
        a2_ref[pl.ds(tt, 1), :] = _bc_i32(limbs[2])
        a3_ref[pl.ds(tt, 1), :] = _bc_i32(limbs[3])
        alen_ref[pl.ds(tt, 1), :] = ln
        bb_ref[pl.ds(tt, 1), :] = _bc_i32(segB_bits)
        bl_ref[pl.ds(tt, 1), :] = segB_len
        return (m0a, m1a, m2a, m0b, m1b, m2b, zacc2, clear, pvalid, poc,
                pbits, pnb, nvals)

    final = jax.lax.fori_loop(0, chunk, body, load_state())

    for k in range(E_NSTATE):
        row = final[k]
        st[k:k + 1, :] = _bc_i32(row) if k == E_PBITS else row
    st[E_NSTATE:E_NSTATE + E_NEXTRA, :] = \
        state0_ref[E_NSTATE:E_NSTATE + E_NEXTRA, :]
    stfin_ref[...] = st[...]


# ---------------------------------------------------------------------------
# fused hybrid (lossy) encode: peel -> error-limit word coding ->
# reconstruction-feedback apply, one scan per sample
# ---------------------------------------------------------------------------

# entropy-state slot names inside the hybrid carry (after the decorr
# entries); PBITS is a u32 bit pattern
(H_M0A, H_M1A, H_M2A, H_M0B, H_M1B, H_M2B, H_SLOWA, H_SLOWB,
 H_QA, H_RA, H_QB, H_RB, H_ERRA, H_ERRB, H_CLEAR, H_PVALID, H_POC,
 H_PBITS, H_PNB, H_NENT) = range(20)
H_RO = 3   # read-only rows after the entropy state: nvals, delta_a/_b


def _hybrid_kernel(state0_ref, meta_ref, targ_a_ref, targ_b_ref,
                   tables_ref, a0_ref, a1_ref, a2_ref, a3_ref, alen_ref,
                   bb_ref, bl_ref, rec_a_ref, rec_b_ref, stfin_ref, st,
                   *, mono: bool, npasses: int, chunk: int,
                   lane_tile: int, static_terms: tuple,
                   hybrid_bitrate: bool, hybrid_balance: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        st[...] = state0_ref[...]

    nw = npasses if mono else 2 * npasses
    nd = nw + (8 if mono else 16) * npasses
    deltas = [meta_ref[k:k + 1, :] for k in range(npasses)]
    iota8 = jax.lax.broadcasted_iota(I32, (8, lane_tile), 0)
    SLO, SLS = consts.SLO, consts.SLS

    # ---- in-kernel exp2s/mylog2 via the byte-packed constant tables
    # (same design as the decode entropy kernel, entropy_pallas.py) ----
    def table_lookup(base_row: int, idx):
        tab = tables_ref[base_row:base_row + 64, :]
        iota = jax.lax.broadcasted_iota(I32, (64, 1), 0)
        m = iota == (idx >> 2)
        w = jnp.sum(jnp.where(m, tab, I32(0)), axis=0, keepdims=True,
                    dtype=I32)
        return _bc_i32(_bc_u32(w) >> _bc_u32((idx & 3) * 8)) & 0xFF

    def exp2s_k(log):
        neg = log < 0
        a = jnp.where(neg, -log, log)
        v = table_lookup(0, a & 0xFF) | 0x100
        sh = a >> 8
        r = jnp.where(sh <= 9, v >> jnp.clip(9 - sh, 0, 31),
                      v << jnp.clip(sh - 9, 0, 31))
        return jnp.where(neg, -r, r)

    def mylog2_k(av):
        av = av + (av >> 9)
        dbits = jnp.where(av > 0,
                          32 - _bc_i32(jax.lax.clz(_bc_u32(av))), 0)
        sh = dbits - 9
        idx = jnp.where(sh >= 0, av >> jnp.clip(sh, 0, 31),
                        av << jnp.clip(-sh, 0, 31)) & 0xFF
        return (dbits << 8) + table_lookup(64, idx)

    def update_error_limit(slow_a, slow_b, qa, ra, qb, rb, da, db):
        """WordsUtils.cs:195-261 on split accumulators (Q = acc >> 16
        wrapped i32, R = low 16 bits); returns the candidate
        (qa2, ra2, qb2, rb2, e0, e1) — the caller masks."""
        s0 = ra + da
        qa2 = qa + (s0 >> 16)
        ra2 = s0 & 0xFFFF
        bitrate_0 = qa2
        if mono:
            if hybrid_bitrate:
                slow_log_0 = (slow_a + SLO) >> SLS
                e0 = jnp.where(slow_log_0 - bitrate_0 > -0x100,
                               exp2s_k(slow_log_0 - bitrate_0 + 0x100), 0)
            else:
                e0 = exp2s_k(bitrate_0)
            return qa2, ra2, qb, rb, e0, None
        s1 = rb + db
        qb2 = qb + (s1 >> 16)
        rb2 = s1 & 0xFFFF
        bitrate_1 = qb2
        if hybrid_bitrate:
            slow_log_0 = (slow_a + SLO) >> SLS
            slow_log_1 = (slow_b + SLO) >> SLS
            if hybrid_balance:
                balance = (slow_log_1 - slow_log_0 + bitrate_1 + 1) >> 1
                hi = balance > bitrate_0
                lo = (-balance) > bitrate_0
                b1 = jnp.where(hi, bitrate_0 * 2,
                               jnp.where(lo, 0, bitrate_0 + balance))
                b0 = jnp.where(hi, 0,
                               jnp.where(lo, bitrate_0 * 2,
                                         bitrate_0 - balance))
                bitrate_0, bitrate_1 = b0, b1
            e0 = jnp.where(slow_log_0 - bitrate_0 > -0x100,
                           exp2s_k(slow_log_0 - bitrate_0 + 0x100), 0)
            e1 = jnp.where(slow_log_1 - bitrate_1 > -0x100,
                           exp2s_k(slow_log_1 - bitrate_1 + 0x100), 0)
        else:
            e0 = exp2s_k(bitrate_0)
            e1 = exp2s_k(bitrate_1)
        return qa2, ra2, qb2, rb2, e0, e1

    def hyb_word(ent, r, valid, entidx: int):
        """One residual word, hybrid error-limit semantics
        (encode_kernels._hyb_word in u32/i32): returns (ent', 7 segment
        values, rhat)."""
        (m0a, m1a, m2a, m0b, m1b, m2b, slow_a, slow_b, qa, ra, qb, rb,
         erra, errb, clear, pvalid, poc, pbits, pnb, nvals, da, db) = ent
        clear_b = clear != 0
        pvalid_b = pvalid != 0
        if entidx == 0:
            m0, m1, m2 = m0a, m1a, m2a
        else:
            m0, m1, m2 = m0b, m1b, m2b

        tiny = ((m0a & ~1) == 0) & ((m0b & ~1) == 0)
        gate = clear_b & tiny & valid

        sign = r < 0
        av = jnp.where(sign, ~r, r)
        g0 = (m0 >> 4) + 1
        g1 = (m1 >> 4) + 1
        g2 = jnp.maximum((m2 >> 4) + 1, 1)
        q = _udiv(jnp.maximum(av - g0 - g1, 0), g2)
        oc = jnp.where(av < g0, 0, jnp.where(av < g0 + g1, 1, 2 + q))

        fromclear = valid & clear_b
        h0 = valid & ~clear_b & (oc == 0)
        h1 = valid & ~clear_b & (oc != 0)
        do_flush = (h0 | h1) & pvalid_b
        flush_raw = 2 * poc + jnp.where(h1, 1, 0)

        # segment A opens with the 1-bit gamma(0) where the run gate
        # fires (mutually exclusive with any flush: gate requires clear,
        # flush requires ~clear)
        limbs = [jnp.zeros_like(_bc_u32(r))] * 4
        ln = jnp.where(gate, 1, 0)
        esc = flush_raw >= consts.LIMIT_ONES
        gb1, gl1, gb2, gl2 = _gamma_slots(
            jnp.maximum(flush_raw - consts.LIMIT_ONES, 0))
        s1b = jnp.where(do_flush,
                        jnp.where(esc,
                                  U32((1 << consts.LIMIT_ONES) - 1),
                                  _mask_u32(flush_raw)),
                        U32(0))
        s1l = jnp.where(do_flush,
                        jnp.where(esc, consts.LIMIT_ONES + 1,
                                  flush_raw + 1), 0)
        limbs, ln = _app128(limbs, ln, s1b, s1l)
        limbs, ln = _app128(limbs, ln,
                            jnp.where(do_flush & esc, gb1, U32(0)),
                            jnp.where(do_flush & esc, gl1, 0))
        limbs, ln = _app128(limbs, ln,
                            jnp.where(do_flush & esc, gb2, U32(0)),
                            jnp.where(do_flush & esc, gl2, 0))
        limbs, ln = _app128(limbs, ln,
                            jnp.where(do_flush, pbits, U32(0)),
                            jnp.where(do_flush, pnb, 0))

        # error limit: before channel-A words (every word in mono),
        # WordsUtils.cs:430-431
        if entidx == 0:
            qa2, ra2, qb2, rb2, e0, e1 = update_error_limit(
                slow_a, slow_b, qa, ra, qb, rb, da, db)
            qa = jnp.where(valid, qa2, qa)
            ra = jnp.where(valid, ra2, ra)
            erra = jnp.where(valid, e0, erra)
            if not mono:
                qb = jnp.where(valid, qb2, qb)
                rb = jnp.where(valid, rb2, rb)
                errb = jnp.where(valid, e1, errb)
        err_c = erra if entidx == 0 else errb

        # median interval + 5/7-2/7 adaptation
        m0n = jnp.where(oc == 0,
                        m0 - ((m0 + (consts.DIV0 - 2)) >> 7) * 2,
                        m0 + ((m0 + consts.DIV0) >> 7) * 5)
        m1n = jnp.where(oc <= 0, m1,
                        jnp.where(oc == 1,
                                  m1 - ((m1 + (consts.DIV1 - 2)) >> 6) * 2,
                                  m1 + ((m1 + consts.DIV1) >> 6) * 5))
        m2n = jnp.where(oc <= 1, m2,
                        jnp.where(oc == 2,
                                  m2 - ((m2 + (consts.DIV2 - 2)) >> 5) * 2,
                                  m2 + ((m2 + consts.DIV2) >> 5) * 5))
        low = jnp.where(oc == 0, 0,
                        g0 + jnp.where(oc == 1, 0, g1 + (oc - 2) * g2))
        high = low + jnp.where(oc == 0, g0,
                               jnp.where(oc == 1, g1, g2)) - 1

        # value payload, lossless branch (err_c == 0)
        code = av - low
        maxcode = high - low
        bitcount = _bitlen(maxcode)
        extras = _bc_i32(_shl_u32(U32(1), bitcount)) - maxcode - 1
        small = code < extras
        cc = code + extras
        vb = jnp.where(small, _bc_u32(code),
                       _bc_u32(cc >> 1)
                       | _shl_u32(_bc_u32(cc & 1),
                                  jnp.maximum(bitcount - 1, 0)))
        vl = jnp.where(bitcount == 0, 0,
                       jnp.where(small, bitcount - 1, bitcount))

        # value payload, lossy branch: binary search down to the error
        # limit, one comparison bit per step (encode direction of
        # WordsUtils.cs:482-497; <= 28 steps fire for conforming widths)
        s_lo, s_hi = low, high
        s_mid = (s_hi + s_lo + 1) >> 1
        used = jnp.zeros_like(bitcount)
        val = jnp.zeros_like(_bc_u32(r))
        for _k in range(32):
            go = (s_hi - s_lo) > err_c
            bit = av >= s_mid
            s_lo = jnp.where(go & bit, s_mid, s_lo)
            s_hi = jnp.where(go & ~bit, s_mid - 1, s_hi)
            s_mid = jnp.where(go, (s_hi + s_lo + 1) >> 1, s_mid)
            val = val | jnp.where(go & bit, _shl_u32(U32(1), used),
                                  U32(0))
            used = used + jnp.where(go, 1, 0)

        ll = err_c == 0
        base_bits = jnp.where(ll, vb, val)
        base_len = jnp.where(ll, vl, used)
        wbits = base_bits | _shl_u32(jnp.where(sign, U32(1), U32(0)),
                                     base_len)
        wnb = base_len + 1
        mid_fin = jnp.where(ll, av, s_mid)
        rhat = jnp.where(sign, ~mid_fin, mid_fin)
        rhat = jnp.where(valid, rhat, 0)

        # state updates (masked by valid)
        m0c = jnp.where(valid, m0n, m0)
        m1c = jnp.where(valid, m1n, m1)
        m2c = jnp.where(valid, m2n, m2)
        if entidx == 0:
            m0a, m1a, m2a = m0c, m1c, m2c
        else:
            m0b, m1b, m2b = m0c, m1c, m2c
        if hybrid_bitrate:
            slow_c = slow_a if entidx == 0 else slow_b
            slow_c = jnp.where(valid,
                               slow_c - ((slow_c + SLO) >> SLS)
                               + mylog2_k(mid_fin), slow_c)
            if entidx == 0:
                slow_a = slow_c
            else:
                slow_b = slow_c

        segB_bits = jnp.where(h0, wbits, U32(0))
        segB_len = jnp.where(h0, wnb, 0)
        emit_unary = fromclear | h1
        pvalid = jnp.where(emit_unary, 1,
                           jnp.where(do_flush, 0, pvalid))
        poc = jnp.where(emit_unary, oc - jnp.where(h1, 1, 0), poc)
        pbits = jnp.where(emit_unary, wbits, pbits)
        pnb = jnp.where(emit_unary, wnb, pnb)
        clear = jnp.where(h0, 1, jnp.where(emit_unary, 0, clear))

        ent = (m0a, m1a, m2a, m0b, m1b, m2b, slow_a, slow_b, qa, ra, qb,
               rb, erra, errb, clear, pvalid, poc, pbits, pnb, nvals,
               da, db)
        return ent, (limbs[0], limbs[1], limbs[2], limbs[3], ln,
                     segB_bits, segB_len), rhat

    # ---- carry assembly ----
    flat0 = []
    for k in range(npasses):
        if mono:
            flat0 += [st[k:k + 1, :], st[nw + 8 * k:nw + 8 * k + 8, :]]
        else:
            base = nw + 16 * k
            flat0 += [st[2 * k:2 * k + 1, :], st[2 * k + 1:2 * k + 2, :],
                      st[base:base + 8, :], st[base + 8:base + 16, :]]
    nde = 2 * npasses if mono else 4 * npasses
    ent0 = []
    for k in range(H_NENT):
        row = st[nd + k:nd + k + 1, :]
        ent0.append(_bc_u32(row) if k == H_PBITS else row)
    for k in range(H_RO):
        ent0.append(state0_ref[nd + H_NENT + k:nd + H_NENT + k + 1, :])

    def body(tt, carry):
        carry = list(carry)
        t = j * chunk + tt
        m_slot = t & 7
        va = targ_a_ref[pl.ds(tt, 1), :]
        vb = None if mono else targ_b_ref[pl.ds(tt, 1), :]

        # peel (read-only)
        for k in reversed(range(npasses)):
            if mono:
                waj, ring_a = carry[2 * k], carry[2 * k + 1]
                wbj = ring_b = None
            else:
                waj, wbj = carry[4 * k], carry[4 * k + 1]
                ring_a, ring_b = carry[4 * k + 2], carry[4 * k + 3]
            va, vb = _static_pass_peel(static_terms[k], waj, wbj, ring_a,
                                       ring_b, va, vb, m_slot, iota8, mono)

        ent = tuple(carry[nde:])
        nvals = ent[H_NENT]        # nvals row rides after the state
        valid_a = (2 * t < nvals) if not mono else (t < nvals)
        ent, segs_a, ra_hat = hyb_word(ent, va, valid_a, 0)
        if not mono:
            ent, segs_b, rb_hat = hyb_word(ent, vb, (2 * t + 1) < nvals, 1)

        # apply over the RECONSTRUCTED residuals (decoder-state coupling)
        ca, cb = ra_hat, None if mono else rb_hat
        for k in range(npasses):
            if mono:
                waj, ring_a = carry[2 * k], carry[2 * k + 1]
                wbj = ring_b = None
            else:
                waj, wbj = carry[4 * k], carry[4 * k + 1]
                ring_a, ring_b = carry[4 * k + 2], carry[4 * k + 3]
            ca, cb, wa_n, wb_n, ring_a, ring_b = _static_pass_apply(
                static_terms[k], deltas[k], waj, wbj, ring_a, ring_b,
                ca, cb, m_slot, iota8, mono)
            if mono:
                carry[2 * k] = wa_n
                carry[2 * k + 1] = ring_a
            else:
                carry[4 * k] = wa_n
                carry[4 * k + 1] = wb_n
                carry[4 * k + 2] = ring_a
                carry[4 * k + 3] = ring_b
        carry[nde:] = list(ent)

        row = tt if mono else 2 * tt
        for ref, v in zip((a0_ref, a1_ref, a2_ref, a3_ref), segs_a[:4]):
            ref[pl.ds(row, 1), :] = _bc_i32(v)
        alen_ref[pl.ds(row, 1), :] = segs_a[4]
        bb_ref[pl.ds(row, 1), :] = _bc_i32(segs_a[5])
        bl_ref[pl.ds(row, 1), :] = segs_a[6]
        if not mono:
            for ref, v in zip((a0_ref, a1_ref, a2_ref, a3_ref),
                              segs_b[:4]):
                ref[pl.ds(2 * tt + 1, 1), :] = _bc_i32(v)
            alen_ref[pl.ds(2 * tt + 1, 1), :] = segs_b[4]
            bb_ref[pl.ds(2 * tt + 1, 1), :] = _bc_i32(segs_b[5])
            bl_ref[pl.ds(2 * tt + 1, 1), :] = segs_b[6]
        rec_a_ref[pl.ds(tt, 1), :] = ca
        if not mono:
            rec_b_ref[pl.ds(tt, 1), :] = cb
        return tuple(carry)

    final = jax.lax.fori_loop(0, chunk, body, tuple(flat0) + tuple(ent0))

    for k in range(npasses):
        if mono:
            st[k:k + 1, :] = final[2 * k]
            st[nw + 8 * k:nw + 8 * k + 8, :] = final[2 * k + 1]
        else:
            st[2 * k:2 * k + 1, :] = final[4 * k]
            st[2 * k + 1:2 * k + 2, :] = final[4 * k + 1]
            base = nw + 16 * k
            st[base:base + 8, :] = final[4 * k + 2]
            st[base + 8:base + 16, :] = final[4 * k + 3]
    for k in range(H_NENT):
        row = final[nde + k]
        st[nd + k:nd + k + 1, :] = _bc_i32(row) if k == H_PBITS else row
    st[nd + H_NENT:nd + H_NENT + H_RO, :] = \
        state0_ref[nd + H_NENT:nd + H_NENT + H_RO, :]
    stfin_ref[...] = st[...]


@partial(jax.jit, static_argnames=("mono", "static_terms",
                                   "hybrid_bitrate", "hybrid_balance",
                                   "interpret"))
def hybrid_encode_pallas(targets, deltas, med0, slow0, acc0, delta0,
                         nvals, w0a, w0b, h0a, h0b, *, mono: bool,
                         static_terms: tuple, hybrid_bitrate: bool,
                         hybrid_balance: bool, interpret: bool = False):
    """Pallas fused hybrid encode; same contract as
    encode_kernels.hybrid_encode_scan restricted to a homogeneous
    static term chain. Returns the 5 segment arrays + pending word +
    recon (T, L, C) int32."""
    T, L, C = targets.shape
    npasses = len(static_terms)
    assert npasses >= 1
    W = T * C
    lane_tile = min(512, max(128, 1 << max(L - 1, 1).bit_length()))
    Lp = ((L + lane_tile - 1) // lane_tile) * lane_tile
    chunk = min(T, 128 if lane_tile >= 512 else 256)
    Tp = ((T + chunk - 1) // chunk) * chunk

    def pad_lanes(x):
        return jnp.pad(x, ((0, Lp - L),) + ((0, 0),) * (x.ndim - 1))

    targ_a = jnp.pad(pad_lanes(targets[:, :, 0].T), ((0, 0), (0, Tp - T))).T
    targ_b = (jnp.pad(pad_lanes(targets[:, :, 1].T),
                      ((0, 0), (0, Tp - T))).T if C == 2
              else jnp.zeros_like(targ_a))

    deltas = pad_lanes(deltas.astype(I32))
    w0a = pad_lanes(w0a.astype(I32))
    w0b = pad_lanes(w0b.astype(I32))
    h0a = pad_lanes(h0a.astype(I32))
    h0b = pad_lanes(h0b.astype(I32))

    meta = jnp.zeros((npasses, Lp), I32)
    for k in range(npasses):
        meta = meta.at[k].set(deltas[:, k])

    nw = npasses if mono else 2 * npasses
    nd = nw + (8 if mono else 16) * npasses
    nstate = nd + H_NENT + H_RO
    state0 = jnp.zeros((nstate, Lp), I32)
    for k in range(npasses):
        if mono:
            state0 = state0.at[k].set(w0a[:, k])
            state0 = state0.at[nw + 8 * k:nw + 8 * k + 8].set(
                h0a[:, k, :].T)
        else:
            state0 = state0.at[2 * k].set(w0a[:, k])
            state0 = state0.at[2 * k + 1].set(w0b[:, k])
            base = nw + 16 * k
            state0 = state0.at[base:base + 8].set(h0a[:, k, :].T)
            state0 = state0.at[base + 8:base + 16].set(h0b[:, k, :].T)
    state0 = state0.at[nd + H_M0A, :L].set(med0[:, 0, 0].astype(I32))
    state0 = state0.at[nd + H_M1A, :L].set(med0[:, 0, 1].astype(I32))
    state0 = state0.at[nd + H_M2A, :L].set(med0[:, 0, 2].astype(I32))
    state0 = state0.at[nd + H_M0B, :L].set(med0[:, 1, 0].astype(I32))
    state0 = state0.at[nd + H_M1B, :L].set(med0[:, 1, 1].astype(I32))
    state0 = state0.at[nd + H_M2B, :L].set(med0[:, 1, 2].astype(I32))
    state0 = state0.at[nd + H_SLOWA, :L].set(slow0[:, 0].astype(I32))
    state0 = state0.at[nd + H_SLOWB, :L].set(slow0[:, 1].astype(I32))
    state0 = state0.at[nd + H_QA, :L].set((acc0[:, 0] >> 16).astype(I32))
    state0 = state0.at[nd + H_RA, :L].set(
        (acc0[:, 0] & 0xFFFF).astype(I32))
    state0 = state0.at[nd + H_QB, :L].set((acc0[:, 1] >> 16).astype(I32))
    state0 = state0.at[nd + H_RB, :L].set(
        (acc0[:, 1] & 0xFFFF).astype(I32))
    state0 = state0.at[nd + H_CLEAR].set(1)
    state0 = state0.at[nd + H_NENT, :L].set(nvals.astype(I32))
    state0 = state0.at[nd + H_NENT + 1, :L].set(delta0[:, 0].astype(I32))
    state0 = state0.at[nd + H_NENT + 2, :L].set(delta0[:, 1].astype(I32))

    from ..tables import EXP2_NP, LOG2_NP
    tabs = np.concatenate([EXP2_NP, LOG2_NP]).astype(np.uint32)
    b4 = tabs.reshape(128, 4)
    twords = (b4[:, 0] | (b4[:, 1] << 8) | (b4[:, 2] << 16)
              | (b4[:, 3] << 24)).astype(np.int32)
    tables = jnp.broadcast_to(jnp.asarray(twords)[:, None], (128, Lp))

    grid = (Lp // lane_tile, Tp // chunk)
    kernel = partial(_hybrid_kernel, mono=mono, npasses=npasses,
                     chunk=chunk, lane_tile=lane_tile,
                     static_terms=static_terms,
                     hybrid_bitrate=hybrid_bitrate,
                     hybrid_balance=hybrid_balance)
    Wp = Tp * C
    wblk = pl.BlockSpec((chunk * C, lane_tile), lambda i, j: (j, i),
                        memory_space=pltpu.VMEM)
    tblk = pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                        memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((nstate, lane_tile), lambda i, j: (0, i),
                        memory_space=pltpu.VMEM)
    out_shape = ([jax.ShapeDtypeStruct((Wp, Lp), I32)] * 7
                 + [jax.ShapeDtypeStruct((Tp, Lp), I32)] * 2
                 + [jax.ShapeDtypeStruct((nstate, Lp), I32)])
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[srow,
                      pl.BlockSpec((npasses, lane_tile),
                                   lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
                      tblk, tblk,
                      pl.BlockSpec((128, lane_tile), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[wblk] * 7 + [tblk, tblk, srow],
            scratch_shapes=[pltpu.VMEM((nstate, lane_tile), I32)],
            out_shape=out_shape,
            interpret=interpret,
        )(state0, meta, targ_a, targ_b, tables)
    a0, a1, a2, a3, alen, bb, bl, rec_a, rec_b, stfin = outs

    def u64(lo, hi):
        return (lo[:W, :L].astype(jnp.uint32).astype(jnp.uint64)
                | (hi[:W, :L].astype(jnp.uint32).astype(jnp.uint64) << 32))

    recon = (rec_a[:T, :L, None] if mono
             else jnp.stack([rec_a[:T, :L], rec_b[:T, :L]], axis=2))
    pvalid = stfin[nd + H_PVALID, :L] != 0
    poc = stfin[nd + H_POC, :L].astype(jnp.int64)
    pbits = stfin[nd + H_PBITS, :L].astype(jnp.uint32).astype(jnp.uint64)
    pnb = stfin[nd + H_PNB, :L]
    return (u64(a0, a1), u64(a2, a3), alen[:W, :L],
            bb[:W, :L].astype(jnp.uint32).astype(jnp.uint64), bl[:W, :L],
            pvalid, poc, pbits, pnb, recon)


@partial(jax.jit, static_argnames=("mono", "interpret"))
def entropy_encode_pallas(res_words, med0, nvals, *, mono: bool,
                          interpret: bool = False):
    """Pallas entropy word encoder; same contract as
    encode_kernels.entropy_encode_words. res_words (W, L) int32,
    med0 (L, 2, 3) quantized medians, nvals (L,) valid word counts.
    Returns (segA_lo u64, segA_hi u64, segA_len i32, segB_bits u64,
    segB_len i32) each (W, L) + the pending word (pvalid bool,
    poc i64, pbits u64, pnb i32)."""
    W, L = res_words.shape
    lane_tile = min(512, max(128, 1 << max(L - 1, 1).bit_length()))
    Lp = ((L + lane_tile - 1) // lane_tile) * lane_tile
    chunk = min(W, 128 if lane_tile >= 512 else 256)
    Wp = ((W + chunk - 1) // chunk) * chunk

    res = jnp.pad(res_words.astype(I32), ((0, Wp - W), (0, Lp - L)))
    nvals_i = jnp.pad(nvals.astype(I32), (0, Lp - L))

    # suffix zero-run lengths over VALID words via a parallel reverse
    # cummin (no serial scan): zlen[w] = first non-zero-valid index at
    # or after w, minus w
    iota_w = jnp.arange(Wp, dtype=I32)[:, None]
    iszero = (res == 0) & (iota_w < nvals_i[None, :])
    stop = jnp.where(iszero, I32(Wp), iota_w)
    nstop = jax.lax.cummin(stop, axis=0, reverse=True)
    zlen = nstop - iota_w

    state0 = jnp.zeros((E_NSTATE + E_NEXTRA, Lp), I32)
    state0 = state0.at[E_M0A, :L].set(med0[:, 0, 0].astype(I32))
    state0 = state0.at[E_M1A, :L].set(med0[:, 0, 1].astype(I32))
    state0 = state0.at[E_M2A, :L].set(med0[:, 0, 2].astype(I32))
    state0 = state0.at[E_M0B, :L].set(med0[:, 1, 0].astype(I32))
    state0 = state0.at[E_M1B, :L].set(med0[:, 1, 1].astype(I32))
    state0 = state0.at[E_M2B, :L].set(med0[:, 1, 2].astype(I32))
    state0 = state0.at[E_CLEAR].set(1)
    state0 = state0.at[E_NSTATE].set(nvals_i)

    grid = (Lp // lane_tile, Wp // chunk)
    kernel = partial(_encode_words_kernel, mono=mono, chunk=chunk,
                     lane_tile=lane_tile)
    blk = pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                       memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((E_NSTATE + E_NEXTRA, lane_tile),
                        lambda i, j: (0, i), memory_space=pltpu.VMEM)
    out_shape = ([jax.ShapeDtypeStruct((Wp, Lp), I32)] * 7
                 + [jax.ShapeDtypeStruct((E_NSTATE + E_NEXTRA, Lp), I32)])
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[srow, blk, blk],
            out_specs=[blk] * 7 + [srow],
            scratch_shapes=[pltpu.VMEM((E_NSTATE + E_NEXTRA, lane_tile),
                                       I32)],
            out_shape=out_shape,
            interpret=interpret,
        )(state0, res, zlen)
    a0, a1, a2, a3, alen, bb, bl, stfin = outs

    def u64(lo, hi):
        return (lo[:W, :L].astype(jnp.uint32).astype(jnp.uint64)
                | (hi[:W, :L].astype(jnp.uint32).astype(jnp.uint64) << 32))

    seg_lo = u64(a0, a1)
    seg_hi = u64(a2, a3)
    segb = bb[:W, :L].astype(jnp.uint32).astype(jnp.uint64)
    pvalid = stfin[E_PVALID, :L] != 0
    poc = stfin[E_POC, :L].astype(jnp.int64)
    pbits = stfin[E_PBITS, :L].astype(jnp.uint32).astype(jnp.uint64)
    pnb = stfin[E_PNB, :L]
    return (seg_lo, seg_hi, alen[:W, :L], segb, bl[:W, :L],
            pvalid, poc, pbits, pnb)
