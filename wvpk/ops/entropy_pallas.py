"""Pallas TPU entropy kernel (lossless profiles).

The XLA scan version (entropy.py) is bound by per-peek HBM gathers. This
kernel keeps each lane tile's bitstreams RESIDENT IN VMEM, laid out
transposed as (word, lane), and replaces the gather with an iota-compare
select-reduce sweep over the word axis — pure VPU work against VMEM.

All arithmetic is 32-bit (TPU-native): the bit window is an explicit
(lo: uint32, bit32) pair, the interval math uses the unsigned-32 identities
mid = low + ((high-low+1)>>1) etc. This covers the full sane value range
of conforming streams (medians < 2^31 => code widths <= 28 bits); the
reference's own degenerate median-wrap regime (readme.txt "limited in
resolution") falls back to the XLA/int64 kernel at bucket granularity.

Hybrid buckets also use the XLA path (the error-limit accumulators are
64-bit); this kernel handles MONO_DATA and stereo lossless — the bandwidth
configs that matter (BASELINE configs 1-3).

Grid: (lane_tiles, sample_chunks); the decode state persists across sample
chunks in a VMEM scratch (TPU grids run sequentially, innermost last).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts

LANE_TILE = 256
U32 = jnp.uint32
I32 = jnp.int32

# state rows in the persistent scratch
(R_BITPOS, R_M0A, R_M1A, R_M2A, R_M0B, R_M1B, R_M2B,
 R_H1, R_H0, R_ZACC, R_DONE, R_NDEC, NSTATE) = range(13)


def _bc_i32(x):
    return pltpu.bitcast(x, jnp.int32)


def _bc_u32(x):
    return pltpu.bitcast(x, jnp.uint32)


def _to32(y):
    """Trailing zeros of u32 (32 when zero)."""
    lsb = y & (U32(0) - y)
    return _bc_i32(jax.lax.population_count(lsb - U32(1)))


def _trailing_ones(lo):
    return _to32(~lo)


def _mask_u32(n):
    """(1 << n) - 1 for n in [0, 32]."""
    full = n >= 32
    nn = pltpu.bitcast(jnp.clip(n, 0, 31), jnp.uint32)
    return jnp.where(full, U32(0xFFFFFFFF), (U32(1) << nn) - U32(1))


def _entropy_kernel(state0_ref, words_ref, out_a_ref, out_b_ref, stfin_ref,
                    st, tmp, *, mono: bool, chunk: int, nsamples_total: int,
                    w_total: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        st[...] = state0_ref[...]

    L = LANE_TILE
    # keep the stream words as int32 (Mosaic lacks unsigned reductions);
    # with exactly one selected term per lane the int32 sum is the exact
    # bit pattern
    words = _bc_i32(words_ref[...])  # (W, L), resident in VMEM
    iota_w = jax.lax.broadcasted_iota(I32, (w_total, L), 0)
    max_word = I32(w_total - 2)

    def fetch(bitpos):
        """33-bit window at bitpos: (lo uint32, b32 in {0,1} uint32)."""
        idx = jnp.minimum(bitpos >> 5, max_word)
        off = _bc_u32(bitpos & 31)
        m0 = iota_w == idx
        m1 = iota_w == (idx + 1)
        w0 = _bc_u32(jnp.sum(jnp.where(m0, words, I32(0)), axis=0,
                             keepdims=True, dtype=I32))
        w1 = _bc_u32(jnp.sum(jnp.where(m1, words, I32(0)), axis=0,
                             keepdims=True, dtype=I32))
        # signed clip: Mosaic lacks unsigned min/max
        sh = _bc_u32(jnp.clip(32 - _bc_i32(off), 1, 31))
        lo = jnp.where(off == 0, w0, (w0 >> off) | (w1 << sh))
        b32 = jnp.where(off == 0, w1 & 1, (w1 >> off) & 1)
        return lo, b32

    def gamma(bitpos, lo, b32):
        """Elias-style escape code from a prefetched window:
        (value u32, consumed i32, break33). One extra fetch for the data
        bits (Mosaic cannot legalize lax.cond with vector results, so the
        rare paths execute unconditionally; fetches are cheap VMEM
        sweeps)."""
        t_lo = _trailing_ones(lo)
        cbits = jnp.where(t_lo >= 32, 32 + _bc_i32(b32), t_lo)
        cbits = jnp.minimum(cbits, 33)
        brk = cbits >= 33
        lo2, _ = fetch(bitpos + cbits + 1)
        data = lo2 & _mask_u32(cbits - 1)
        top = jnp.where(cbits >= 2,
                        U32(1) << _bc_u32(jnp.clip(cbits - 1, 0, 31)),
                        U32(0))
        # cbits == 33 lanes break; cbits == 32 would need bit 2^31 set: top
        # shift of 31 handles it (cbits-1 == 31 <= 31)
        v = jnp.where(cbits < 2, _bc_u32(cbits), data | top)
        consumed = jnp.where(cbits < 2, cbits + 1, cbits + 1 + cbits - 1)
        return v, consumed, brk

    def decode_word(state, entidx: int, active):
        (bitpos, m0a, m1a, m2a, m0b, m1b, m2b, h1, h0, zacc, done, ndec) = state
        act = active & (done == 0)
        med_c = (m0a, m1a, m2a) if entidx == 0 else (m0b, m1b, m2b)

        # ---- zero-run branch ----
        zcond = (act & ((m0a & ~1) == 0) & ((m0b & ~1) == 0)
                 & (h1 == 0) & (h0 == 0))
        in_run = zcond & (zacc > 0)
        zacc1 = jnp.where(in_run, zacc - 1, zacc)
        consumed_zero = in_run & (zacc1 > 0)
        start = zcond & (zacc == 0)

        # the zero-run gamma only runs when some lane starts a run this
        # step; pl.when + scratch rows keeps it off the common path
        # (Mosaic cannot legalize value-returning conds). Stale scratch on
        # skipped steps is harmless: `start` is all-false then.
        any_start = jnp.max(jnp.where(start, I32(1), I32(0)))

        @pl.when(any_start > 0)
        def _zero_run_gamma():
            lo0, b32_0 = fetch(bitpos)
            zv_, gcons_, gb_ = gamma(bitpos, lo0, b32_0)
            tmp[0:1, :] = _bc_i32(zv_)
            tmp[1:2, :] = gcons_
            tmp[2:3, :] = jnp.where(gb_, I32(1), I32(0))

        zv = _bc_u32(tmp[0:1, :])
        gcons = tmp[1:2, :]
        gb = tmp[2:3, :] != 0
        gbreak = start & gb
        do_gamma = start & ~gbreak
        bitpos = jnp.where(do_gamma, bitpos + gcons, bitpos)
        # saturate run lengths at 2^30 (only reachable on corrupt streams;
        # a run can never exceed the block's samples on valid ones);
        # signed ops only: negative-as-i32 means >= 2^31 unsigned
        zrun_raw = _bc_i32(zv)
        zrun = jnp.where((zrun_raw < 0) | (zrun_raw > (1 << 30)),
                         I32(1 << 30), zrun_raw)
        run_started = do_gamma & (zrun > 0)
        zacc1 = jnp.where(run_started, zrun, zacc1)
        emit_zero = consumed_zero | run_started
        m0a = jnp.where(run_started, 0, m0a)
        m1a = jnp.where(run_started, 0, m1a)
        m2a = jnp.where(run_started, 0, m2a)
        m0b = jnp.where(run_started, 0, m0b)
        m1b = jnp.where(run_started, 0, m1b)
        m2b = jnp.where(run_started, 0, m2b)
        med_c = (m0a, m1a, m2a) if entidx == 0 else (m0b, m1b, m2b)

        normal = act & ~gbreak & ~emit_zero

        # ---- unary / holding ----
        use_h0 = normal & (h0 != 0)
        read = normal & (h0 == 0)
        # fetch at the (possibly gamma-advanced) bitpos: correct for
        # fall-through lanes, and run-consumed lanes exit via emit_zero
        # without using the unary result
        lo_u, b32_u = fetch(bitpos)
        t_u = _trailing_ones(lo_u)  # cap 17 below; 32-bit lo suffices
        esc = t_u == consts.LIMIT_ONES
        ubreak = read & (t_u >= consts.LIMIT_ONES + 1)

        any_esc = jnp.max(jnp.where(esc & read, I32(1), I32(0)))

        @pl.when(any_esc > 0)
        def _escape_gamma():
            lo_e, b32_e = fetch(bitpos + 17)
            ev_, econs_, eb_ = gamma(bitpos + 17, lo_e, b32_e)
            tmp[0:1, :] = _bc_i32(ev_)
            tmp[1:2, :] = econs_
            tmp[2:3, :] = jnp.where(eb_, I32(1), I32(0))

        ev = _bc_u32(tmp[0:1, :])
        econs = tmp[1:2, :]
        eb = tmp[2:3, :] != 0
        ebreak = read & esc & eb
        # ones_count as u32 (escape values can be huge on corrupt streams)
        rawu = jnp.where(esc, ev + U32(consts.LIMIT_ONES),
                         _bc_u32(t_u))
        consume_u = jnp.where(esc, 17 + econs, t_u + 1)
        broke = gbreak | ubreak | ebreak
        ok_read = read & ~broke
        bitpos = jnp.where(ok_read, bitpos + consume_u, bitpos)

        oc = jnp.where(h1 != 0, (rawu >> 1) + U32(1), rawu >> 1)
        h1_new = _bc_i32(rawu & 1)
        oc = jnp.where(use_h0, U32(0), oc)
        h1 = jnp.where(ok_read, h1_new, jnp.where(use_h0, 0, h1))
        h0 = jnp.where(ok_read, 1 - h1_new, jnp.where(use_h0, 0, h0))

        code_mask = normal & ~broke

        # ---- median interval (u32 widths; C# int32-wrap updates) ----
        m0, m1, m2 = med_c
        g0 = _bc_u32((m0 >> 4) + 1)
        g1 = _bc_u32((m1 >> 4) + 1)
        g2 = _bc_u32((m2 >> 4) + 1)
        oc0 = oc == 0
        oc1 = oc == 1
        oc2 = oc == 2
        low = jnp.where(oc0, U32(0),
                        jnp.where(oc1, g0,
                                  jnp.where(oc2, g0 + g1,
                                            g0 + g1 + (oc - 2) * g2)))
        width = jnp.where(oc0, g0, jnp.where(oc1, g1, g2))
        high = low + width - 1
        m0n = jnp.where(oc0, m0 - ((m0 + (consts.DIV0 - 2)) >> 7) * 2,
                        m0 + ((m0 + consts.DIV0) >> 7) * 5)
        m1n = jnp.where(oc0, m1,
                        jnp.where(oc1, m1 - ((m1 + (consts.DIV1 - 2)) >> 6) * 2,
                                  m1 + ((m1 + consts.DIV1) >> 6) * 5))
        m2n = jnp.where(oc0 | oc1, m2,
                        jnp.where(oc2, m2 - ((m2 + (consts.DIV2 - 2)) >> 5) * 2,
                                  m2 + ((m2 + consts.DIV2) >> 5) * 5))
        m0c = jnp.where(code_mask, m0n, m0)
        m1c = jnp.where(code_mask, m1n, m1)
        m2c = jnp.where(code_mask, m2n, m2)
        if entidx == 0:
            m0a, m1a, m2a = m0c, m1c, m2c
        else:
            m0b, m1b, m2b = m0c, m1c, m2c

        # ---- value: read_code (lossless) ----
        lo_v, b32_v = fetch(bitpos)
        maxcode = high - low
        # bit_length of u32 via clz
        bitcount = jnp.where(maxcode != 0,
                             32 - _bc_i32(jax.lax.clz(maxcode)), 0)
        # C# 1 << bitcount is a mod-32 int shift
        extras_u = (U32(1) << _bc_u32(bitcount & 31)) - maxcode - 1
        code0 = lo_v & _mask_u32(bitcount - 1)
        # signed comparison code0 >= extras (both fit i32 in the sane
        # regime; extras negative (as i32) => always true, matching C#)
        need_extra = (bitcount > 0) & (_bc_i32(code0) >= _bc_i32(extras_u))
        extra_pos = _bc_u32(jnp.clip(bitcount - 1, 0, 31))
        extra_bit = (lo_v >> extra_pos) & 1
        code = jnp.where(need_extra, (code0 << 1) - extras_u + extra_bit,
                         code0)
        consume_v = jnp.where(bitcount == 0, 0,
                              bitcount - 1 + jnp.where(need_extra, 1, 0))
        mid = low + code

        sign_pos = consume_v
        sign = jnp.where(sign_pos >= 32, b32_v,
                         (lo_v >> _bc_u32(jnp.clip(sign_pos, 0, 31))) & 1)
        bitpos = jnp.where(code_mask, bitpos + consume_v + 1, bitpos)
        value = _bc_i32(jnp.where(sign != 0, ~mid, mid))

        out = jnp.where(code_mask, value, 0)
        done = jnp.where(broke, 1, done)
        ndec = ndec + jnp.where(emit_zero | code_mask, 1, 0)
        return ((bitpos, m0a, m1a, m2a, m0b, m1b, m2b, h1, h0, zacc1,
                 done, ndec), out)

    carry0 = tuple(st[k:k + 1, :] for k in range(NSTATE))

    # nwords per lane rides in state0 row NSTATE-1? (passed via state0)
    def body(t, carry):
        state = carry
        sample_idx = j * chunk + t
        limit = state0_ref[NSTATE:NSTATE + 1, :]  # samples per lane
        active = sample_idx < limit
        state, out_a = decode_word(state, 0, active)
        out_a_ref[pl.ds(t, 1), :] = out_a
        if not mono:
            state, out_b = decode_word(state, 1, active)
            out_b_ref[pl.ds(t, 1), :] = out_b
        return state

    # i32 bounds: under jax_enable_x64 a Python-int bound makes the
    # induction variable int64, which Mosaic cannot convert
    final = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk), body, carry0)

    for k in range(NSTATE):
        st[k:k + 1, :] = final[k]
    st[NSTATE:NSTATE + 1, :] = state0_ref[NSTATE:NSTATE + 1, :]
    stfin_ref[...] = st[...]


@partial(jax.jit, static_argnames=("mono", "nsteps", "interpret"))
def entropy_decode_pallas(words, nwords_lane, med0, *, mono: bool,
                          nsteps: int, interpret: bool = False):
    """Pallas lossless entropy decode; same contract as entropy_decode
    (minus the hybrid state). words (L, W) uint32; returns
    (residuals (T, L, C) int32, broke (L,) bool, ndec (L,) int32)."""
    L, W = words.shape
    C = 1 if mono else 2
    T = nsteps // C
    Lp = ((L + LANE_TILE - 1) // LANE_TILE) * LANE_TILE
    chunk = min(T, 256)
    assert T % chunk == 0

    wpad = jnp.pad(words, ((0, Lp - L), (0, 0)),
                   constant_values=np.uint32(0xFFFFFFFF))
    words_t = wpad.T  # (W, Lp)

    state0 = jnp.zeros((NSTATE + 1, Lp), jnp.int32)
    state0 = state0.at[R_M0A, :L].set(med0[:, 0, 0].astype(jnp.int32))
    state0 = state0.at[R_M1A, :L].set(med0[:, 0, 1].astype(jnp.int32))
    state0 = state0.at[R_M2A, :L].set(med0[:, 0, 2].astype(jnp.int32))
    state0 = state0.at[R_M0B, :L].set(med0[:, 1, 0].astype(jnp.int32))
    state0 = state0.at[R_M1B, :L].set(med0[:, 1, 1].astype(jnp.int32))
    state0 = state0.at[R_M2B, :L].set(med0[:, 1, 2].astype(jnp.int32))
    nsamp = (nwords_lane // C).astype(jnp.int32)
    state0 = state0.at[NSTATE, :L].set(nsamp)

    grid = (Lp // LANE_TILE, T // chunk)
    kernel = partial(_entropy_kernel, mono=mono, chunk=chunk,
                     nsamples_total=T, w_total=W)
    out_shape = [
        jax.ShapeDtypeStruct((T, Lp), jnp.int32),           # out_a
        jax.ShapeDtypeStruct((T, Lp), jnp.int32),           # out_b
        jax.ShapeDtypeStruct((NSTATE + 1, Lp), jnp.int32),  # final state
    ]
    with jax.enable_x64(False):
        out_a, out_b, stfin = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((NSTATE + 1, LANE_TILE), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, LANE_TILE), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((chunk, LANE_TILE), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, LANE_TILE), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NSTATE + 1, LANE_TILE), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((NSTATE + 1, LANE_TILE), jnp.int32),
                        pltpu.VMEM((4, LANE_TILE), jnp.int32)],
            out_shape=out_shape,
            interpret=interpret,
        )(state0, words_t)

    broke = stfin[R_DONE, :L] != 0
    ndec = stfin[R_NDEC, :L]  # counts words (both channels)
    if mono:
        res = out_a[:, :L, None]
    else:
        res = jnp.stack([out_a[:, :L], out_b[:, :L]], axis=2)
    return res, broke, ndec
