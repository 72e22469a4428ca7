"""Lane-parallel entropy word decoder (hot loop 1 on device).

A `lax.scan` over samples: every step decodes one residual per lane for
mono buckets and a FULL stereo pair (channel A then B inline) for stereo
buckets — halving scan length and making the entropy-channel index static,
so per-channel state needs no dynamic indexing. All control flow is
branchless via masks. The state machine mirrors the reference's get_words
exactly (WordsUtils.cs:272-511): zero-run escapes, unary ones_count with
holding_one/holding_zero carry, LIMIT_ONES escape, median intervals,
lossless read_code / hybrid error-limit binary search, and the
HYBRID_BITRATE slow_level recurrence.

Bit-serial within a lane is unavoidable (SURVEY.md section 7 hard part 1);
throughput comes from the lane axis, which maps onto the VPU's 8x128
elementwise shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from .bitio import (bit_length64, bits_of, exp2s_v, make_windows, mylog2_v,
                    peek, trailing_ones, wrap32)

SLO, SLS = consts.SLO, consts.SLS
I64 = jnp.int64


def _slow_decay(slow):
    return slow - ((slow + SLO) >> SLS)


def _update_error_limit(slow, acc, delta, errlim, mask, mono, hybrid_bitrate,
                        hybrid_balance):
    """Vectorized update_error_limit (WordsUtils.cs:195-261); slow/acc/
    errlim are (slow_a, slow_b) style tuples; `mask` selects lanes whose
    state advances."""
    slow_a, slow_b = slow
    acc_a, acc_b = acc
    err_a, err_b = errlim
    acc_a2 = acc_a + delta[:, 0]
    bitrate_0 = wrap32(acc_a2 >> 16)
    if mono:
        if hybrid_bitrate:
            slow_log_0 = (slow_a + SLO) >> SLS
            e0 = jnp.where(slow_log_0 - bitrate_0 > -0x100,
                           exp2s_v(slow_log_0 - bitrate_0 + 0x100), 0)
        else:
            e0 = exp2s_v(bitrate_0)
        return ((jnp.where(mask, acc_a2, acc_a), acc_b),
                (jnp.where(mask, e0, err_a), err_b))
    acc_b2 = acc_b + delta[:, 1]
    bitrate_1 = wrap32(acc_b2 >> 16)
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
                           jnp.where(lo, bitrate_0 * 2, bitrate_0 - balance))
            bitrate_0, bitrate_1 = b0, b1
        e0 = jnp.where(slow_log_0 - bitrate_0 > -0x100,
                       exp2s_v(slow_log_0 - bitrate_0 + 0x100), 0)
        e1 = jnp.where(slow_log_1 - bitrate_1 > -0x100,
                       exp2s_v(slow_log_1 - bitrate_1 + 0x100), 0)
    else:
        e0 = exp2s_v(bitrate_0)
        e1 = exp2s_v(bitrate_1)
    return ((jnp.where(mask, acc_a2, acc_a), jnp.where(mask, acc_b2, acc_b)),
            (jnp.where(mask, e0, err_a), jnp.where(mask, e1, err_b)))


@partial(jax.jit, static_argnames=("mono", "hybrid", "hybrid_bitrate",
                                   "hybrid_balance", "nsteps", "wvc"))
def entropy_decode(words, nwords_lane, med0, slow0, acc0, delta0,
                   *, mono: bool, hybrid: bool, hybrid_bitrate: bool,
                   hybrid_balance: bool, nsteps: int, wvc: bool = False):
    """Decode up to `nsteps` residual words per lane.

    words:       (L, W) uint32 staged bitstreams (0xff-padded)
    nwords_lane: (L,)   int32 words to decode per lane (nsamples * channels)
    med0:        (L, 2, 3) int64 initial medians
    slow0/acc0/delta0: (L, 2) int64 hybrid state
    Returns (residuals (nsteps, L) int32, broke (L,) bool, ndec (L,) int32).
    nsteps counts WORDS (the scan internally steps over samples).

    wvc=True (hybrid-lossless; requires hybrid) additionally emits, per
    word, the NARROWED interval's `maxcode = high - low` and
    `base = low - mid` after the error-limit binary search — everything
    the correction-stream scan (`wvc_corrections`) needs to restore
    exact residuals without re-deriving any serial entropy state.
    Returns (residuals, maxcode, base, broke, ndec) in that case.
    """
    windows = make_windows(words)
    L = words.shape[0]
    delta = delta0.astype(I64)
    nsamples_lane = nwords_lane if mono else (nwords_lane >> 1)
    nscan = nsteps if mono else (nsteps // 2)

    def decode_word(st, entidx: int, word_active):
        """One get_words iteration for static channel `entidx`."""
        (bitpos, med_a, med_b, slow_a, slow_b, acc, errlim,
         h1, h0, zacc, done, ndec) = st
        active = word_active & ~done
        med_c = med_a if entidx == 0 else med_b
        slow_c = slow_a if entidx == 0 else slow_b

        # ---- zero-run branch (WordsUtils.cs:304-352) ----
        zcond = (active & ((med_a[:, 0] & ~1) == 0)
                 & ((med_b[:, 0] & ~1) == 0) & ~h1 & ~h0)
        in_run = zcond & (zacc > 0)
        zacc1 = jnp.where(in_run, zacc - 1, zacc)
        consumed_zero = in_run & (zacc1 > 0)
        start = zcond & (zacc == 0)

        # the gamma read only runs when some lane starts a run this step
        # (rare outside silence) — lax.cond skips its two window gathers
        def gamma_path(bitpos):
            win_g = peek(windows, bitpos)
            cbits = jnp.minimum(trailing_ones(win_g), 33).astype(I64)
            win_g2 = peek(windows, bitpos + cbits + 1)
            gdata = bits_of(win_g2, cbits - 1)
            z = jnp.where(cbits < 2, cbits,
                          gdata | (jnp.int64(1) << jnp.clip(cbits - 1, 0, 62)))
            gconsume = jnp.where(cbits < 2, cbits + 1, cbits + 1 + cbits - 1)
            return z, gconsume, cbits >= 33

        def gamma_skip(bitpos):
            zz = jnp.zeros((L,), I64)
            return zz, zz, jnp.zeros((L,), bool)

        z, gconsume, gb = jax.lax.cond(jnp.any(start), gamma_path,
                                       gamma_skip, bitpos)
        gbreak = start & gb
        do_gamma = start & ~gbreak
        bitpos = jnp.where(do_gamma, bitpos + gconsume, bitpos)
        run_started = do_gamma & (z > 0)
        zacc1 = jnp.where(run_started, z, zacc1)
        emit_zero = consumed_zero | run_started
        slow_c = jnp.where(emit_zero, _slow_decay(slow_c), slow_c)
        rs = run_started[:, None]
        med_a = jnp.where(rs, jnp.int64(0), med_a)
        med_b = jnp.where(rs, jnp.int64(0), med_b)
        med_c = med_a if entidx == 0 else med_b

        normal = active & ~gbreak & ~emit_zero

        # ---- unary ones_count with holding carry (WordsUtils.cs:354-428) --
        use_h0 = normal & h0
        read = normal & ~h0
        win_u = peek(windows, bitpos)
        t_u = trailing_ones(win_u).astype(I64)
        esc = t_u == consts.LIMIT_ONES
        ubreak = read & (t_u >= consts.LIMIT_ONES + 1)

        # LIMIT_ONES escape is rare — cond away its two gathers
        def esc_path(bitpos):
            win_e = peek(windows, bitpos + 17)
            t_e = jnp.minimum(trailing_ones(win_e), 33).astype(I64)
            win_e2 = peek(windows, bitpos + 17 + t_e + 1)
            edata = bits_of(win_e2, t_e - 1)
            ev = jnp.where(t_e < 2, t_e,
                           edata | (jnp.int64(1) << jnp.clip(t_e - 1, 0, 62)))
            econsume = jnp.where(t_e < 2, t_e + 1, t_e + 1 + t_e - 1)
            return ev, econsume, t_e >= 33

        def esc_skip(bitpos):
            zz = jnp.zeros((L,), I64)
            return zz, zz, jnp.zeros((L,), bool)

        ev, econsume, eb = jax.lax.cond(jnp.any(esc & read), esc_path,
                                        esc_skip, bitpos)
        ebreak = read & esc & eb
        raw = jnp.where(esc, ev + consts.LIMIT_ONES, t_u)
        consume_u = jnp.where(esc, 17 + econsume, t_u + 1)
        broke = gbreak | ubreak | ebreak
        ok_read = read & ~broke
        bitpos = jnp.where(ok_read, bitpos + consume_u, bitpos)

        oc_read = jnp.where(h1, (raw >> 1) + 1, raw >> 1)
        h1_from_read = (raw & 1) > 0
        oc = jnp.where(use_h0, jnp.int64(0), oc_read)
        new_h1 = jnp.where(ok_read, h1_from_read, jnp.where(use_h0, False, h1))
        new_h0 = jnp.where(ok_read, ~h1_from_read, jnp.where(use_h0, False, h0))
        h1, h0 = new_h1, new_h0

        code_mask = normal & ~broke

        # ---- hybrid error limit (WordsUtils.cs:430-431): updated before
        # channel-A words (and every word in mono) ----
        acc_t = (acc[:, 0], acc[:, 1])
        err_t = (errlim[:, 0], errlim[:, 1])
        if hybrid and entidx == 0:
            acc_t, err_t = _update_error_limit(
                (slow_a if entidx != 0 else slow_c, slow_b), acc_t, delta,
                err_t, code_mask, mono, hybrid_bitrate, hybrid_balance)
            acc = jnp.stack(acc_t, axis=1)
            errlim = jnp.stack(err_t, axis=1)

        # ---- median interval (WordsUtils.cs:433-475) ----
        m0, m1, m2 = med_c[:, 0], med_c[:, 1], med_c[:, 2]
        g0 = (m0 >> 4) + 1
        g1 = (m1 >> 4) + 1
        g2 = (m2 >> 4) + 1
        oc0 = oc == 0
        oc1 = oc == 1
        oc2 = oc == 2
        low = jnp.where(oc0, 0,
                        jnp.where(oc1, g0,
                                  jnp.where(oc2, g0 + g1,
                                            g0 + g1 + (oc - 2) * g2)))
        width = jnp.where(oc0, g0, jnp.where(oc1, g1, g2))
        high = low + width - 1
        m0n = wrap32(jnp.where(oc0, m0 - ((m0 + (consts.DIV0 - 2)) >> 7) * 2,
                               m0 + ((m0 + consts.DIV0) >> 7) * 5))
        m1n = jnp.where(oc0, m1,
                        wrap32(jnp.where(oc1, m1 - ((m1 + (consts.DIV1 - 2)) >> 6) * 2,
                                         m1 + ((m1 + consts.DIV1) >> 6) * 5)))
        m2n = jnp.where(oc0 | oc1, m2,
                        wrap32(jnp.where(oc2, m2 - ((m2 + (consts.DIV2 - 2)) >> 5) * 2,
                                         m2 + ((m2 + consts.DIV2) >> 5) * 5)))
        med_new = jnp.stack([m0n, m1n, m2n], axis=1)
        med_c = jnp.where(code_mask[:, None], med_new, med_c)
        if entidx == 0:
            med_a = med_c
        else:
            med_b = med_c

        # ---- value: read_code or hybrid binary search ----
        err_c = err_t[entidx] if hybrid else jnp.zeros((L,), I64)
        win_v = peek(windows, bitpos)
        maxcode = high - low
        bitcount = jnp.where(maxcode > 0, bit_length64(maxcode), 0)
        # C# `1 << bitcount` is an int shift (mod-32), WordsUtils.cs:549
        extras = wrap32(jnp.int64(1) << (bitcount & 31)) - maxcode - 1
        code0 = bits_of(win_v, bitcount - 1)
        need_extra = (bitcount > 0) & (code0 >= extras)
        extra_bit = bits_of(
            win_v >> jnp.clip(bitcount - 1, 0, 62).astype(jnp.uint64),
            jnp.ones_like(bitcount))
        code = jnp.where(need_extra, (code0 << 1) - extras + extra_bit, code0)
        consume_ll = jnp.where(bitcount == 0, 0,
                               bitcount - 1 + need_extra.astype(I64))
        mid_ll = low + code

        if hybrid:
            def search_body(k, s):
                lo, hi, mid, used = s
                go = (hi - lo) > err_c
                bit = bits_of(win_v >> used.astype(jnp.uint64),
                              jnp.ones_like(used)) > 0
                lo2 = jnp.where(go & bit, mid, lo)
                hi2 = jnp.where(go & ~bit, mid - 1, hi)
                mid2 = jnp.where(go, (hi2 + lo2 + 1) >> 1, mid)
                return lo2, hi2, mid2, used + go.astype(I64)

            mid0 = (high + low + 1) >> 1
            lo_f, hi_f, mid_hy, used_hy = jax.lax.fori_loop(
                0, 32, search_body,
                (low, high, mid0, jnp.zeros((L,), I64)))
            lossless = err_c == 0
            mid = jnp.where(lossless, mid_ll, mid_hy)
            consume_v = jnp.where(lossless, consume_ll, used_hy)
            if wvc:
                coded = code_mask & ~lossless
                mc_out = jnp.where(coded, hi_f - lo_f, 0).astype(jnp.int32)
                base_out = jnp.where(coded, lo_f - mid_hy, 0) \
                    .astype(jnp.int32)
            else:
                mc_out = base_out = None
        else:
            mid = mid_ll
            consume_v = consume_ll
            mc_out = base_out = None

        # sign bit comes from win_v: value consumption is <= 32 bits and the
        # window holds >= 33, so no extra gather is needed
        sign = bits_of(win_v >> jnp.clip(consume_v, 0, 62).astype(jnp.uint64),
                       jnp.ones_like(consume_v)) > 0
        bitpos = jnp.where(code_mask, bitpos + consume_v + 1, bitpos)
        value = wrap32(jnp.where(sign, ~mid, mid))

        if hybrid_bitrate:
            slow_c = jnp.where(code_mask,
                               _slow_decay(slow_c) + mylog2_v(mid), slow_c)
        if entidx == 0:
            slow_a = slow_c
        else:
            slow_b = slow_c

        out = jnp.where(code_mask, value, 0).astype(jnp.int32)
        done = done | broke
        ndec = ndec + (emit_zero | code_mask).astype(jnp.int32)
        st = (bitpos, med_a, med_b, slow_a, slow_b, acc, errlim,
              h1, h0, zacc1, done, ndec)
        if wvc:
            z = jnp.zeros((L,), jnp.int32)
            return st, (out, mc_out if mc_out is not None else z,
                        base_out if base_out is not None else z)
        return st, out

    def step(st, step_idx):
        active = step_idx < nsamples_lane
        if wvc:
            st, (oa, ma, ba) = decode_word(st, 0, active)
            if mono:
                return st, (oa[:, None], ma[:, None], ba[:, None])
            st, (ob, mb, bb) = decode_word(st, 1, active)
            return st, (jnp.stack([oa, ob], axis=1),
                        jnp.stack([ma, mb], axis=1),
                        jnp.stack([ba, bb], axis=1))
        st, out_a = decode_word(st, 0, active)
        if mono:
            return st, out_a[:, None]
        st, out_b = decode_word(st, 1, active)
        return st, jnp.stack([out_a, out_b], axis=1)

    carry0 = (
        jnp.zeros((L,), I64),                 # bitpos
        med0[:, 0, :].astype(I64),            # medians channel A
        med0[:, 1, :].astype(I64),            # medians channel B
        slow0[:, 0].astype(I64),
        slow0[:, 1].astype(I64),
        acc0.astype(I64),
        jnp.zeros((L, 2), I64),               # errlim
        jnp.zeros((L,), bool),                # holding_one
        jnp.zeros((L,), bool),                # holding_zero
        jnp.zeros((L,), I64),                 # zeros_acc
        jnp.zeros((L,), bool),                # done (EOF break)
        jnp.zeros((L,), jnp.int32),           # words decoded
    )
    carry, outs = jax.lax.scan(step, carry0,
                               jnp.arange(nscan, dtype=jnp.int32))
    broke, ndec = carry[10], carry[11]
    # outs: (nscan, L, C) residuals in (sample, lane, channel) layout
    if wvc:
        res, mc, base = outs
        return res, mc, base, broke, ndec
    return outs, broke, ndec


@partial(jax.jit, static_argnames=())
def wvc_corrections(wvc_words, maxcode, base, residuals):
    """Hybrid-lossless correction-stream decode (beyond reference
    parity; libwavpack wvc semantics — the reference parses the stream
    at UnpackUtils.cs:93-108 but never reads it).

    The main entropy scan already fixed every word's narrowed interval:
    `maxcode` (T, L, C) is high - low after the error-limit search (0
    when the word carries no correction code) and `base` is low - mid.
    This scan only carries a bit cursor per lane: each word reads one
    minimal-binary code (read_code, WordsUtils.cs:546-570) from the
    correction bitstream and yields the signed sample-domain correction
    `residual_exact - residual_lossy`; corrections then add elementwise
    AFTER the decorr chain (which is linear in the residual for its
    lossy-driven prediction sequence).

    wvc_words: (L, W) uint32 staged correction bitstreams.
    Returns corr (T, L, C) int32.
    """
    windows = make_windows(wvc_words)
    T, L, C = maxcode.shape

    def read_one(bitpos, mc, bs_, neg):
        mc64 = mc.astype(I64)
        bitcount = jnp.where(mc64 > 0, bit_length64(mc64), 0)
        win_v = peek(windows, bitpos)
        extras = wrap32(jnp.int64(1) << (bitcount & 31)) - mc64 - 1
        code0 = bits_of(win_v, bitcount - 1)
        need_extra = (bitcount > 0) & (code0 >= extras)
        extra_bit = bits_of(
            win_v >> jnp.clip(bitcount - 1, 0, 62).astype(jnp.uint64),
            jnp.ones_like(bitcount))
        code = jnp.where(need_extra, (code0 << 1) - extras + extra_bit,
                         code0)
        consume = jnp.where(bitcount == 0, 0,
                            bitcount - 1 + need_extra.astype(I64))
        mag = bs_.astype(I64) + code
        corr = jnp.where(mc64 > 0, jnp.where(neg, -mag, mag), 0)
        return bitpos + consume, corr.astype(jnp.int32)

    def step(bitpos, xs):
        mc_t, b_t, r_t = xs
        outs = []
        for c in range(C):
            bitpos, corr = read_one(bitpos, mc_t[:, c], b_t[:, c],
                                    r_t[:, c] < 0)
            outs.append(corr)
        return bitpos, jnp.stack(outs, axis=1)

    _, corr = jax.lax.scan(step, jnp.zeros((L,), I64),
                           (maxcode, base, residuals))
    return corr
