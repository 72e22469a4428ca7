"""Pallas TPU entropy kernel (lossless + hybrid profiles).

The XLA scan version (entropy.py) is bound by per-peek HBM gathers. This
kernel keeps each lane tile's bitstreams RESIDENT IN VMEM, laid out
grouped as (word_group, 32, lane), and reads them through a carried 64-bit
bit window per lane fed from a double-buffered 32-word GROUP CACHE: a full
select-reduce sweep over the streams runs only on a fixed 10-iteration
schedule — and that schedule needs just ONE sweep, because a lane crosses
at most one group boundary between refreshes, so the cached next group
shifts into current (a 32-row select) and only the new next group is
fetched. Common refills are 32-row cache extractions (~12 vector ops)
instead of full-W sweeps. The cache cannot underrun between refreshes: a
decode_word's common path consumes at most 17+33 bits (unary cap + value
+ sign), so 10 stereo iterations consume <= 31.25 words while a refresh
always leaves >= 33 buffered.

Each iteration decodes SPECULATIVELY: both channels run the common path
with no cross-lane reduces, collecting a per-lane `rare` flag (zero-run
gamma start, LIMIT_ONES escape). A single any-reduce gates a repair body
that re-decodes the whole iteration from the pre-iteration state with the
Elias gammas inlined branchlessly (and the group cache re-centered for
lanes whose coverage actually dropped below 33 words — a nested scalar
gate, since most gammas advance <= ~2.6 words), merging per-lane.
Cross-lane reduces cost ~0.23 us each on v5e (latency-bound); this design
pays exactly one per iteration on the common path where the previous one
paid four (zero-run + escape whens x 2 channels).

All arithmetic is 32-bit (TPU-native): the window is an explicit
(lo, hi) uint32 pair and the interval math uses unsigned-32 identities.
This covers the full sane value range of conforming streams (medians
< 2^31 => code widths <= 28 bits); the reference's own degenerate
median-wrap regime (readme.txt "limited in resolution", unreachable for
conforming encoders) deviates — corrupt streams land in mute/CRC
concealment either way, and DecodeOptions.entropy_kernel="xla" forces the
int64-exact scan kernel. Hybrid profiles are supported natively: the
64-bit bitrate accumulators split into (Q = acc>>16 wrapped i32, R = low
16 bits) limbs with add-with-carry, exp2s/mylog2 use in-kernel 256-row
table lookups, and the error-limit binary search is statically unrolled.

Grid: (lane_tiles, sample_chunks); the decode state persists across sample
chunks in a VMEM scratch (TPU grids run sequentially, innermost last).
Mosaic portability notes: bitcasts instead of int<->uint converts, signed
clips (no unsigned min/max), int32 select-reduce sums (no unsigned
reductions), i32 fori bounds, pl.when + scratch instead of value-returning
conds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts

# Speculation span: iterations decoded per any-reduce. >1 halves the
# per-iteration reduce cost on paper but re-measured SLOWER end-to-end on
# the bench corpus (slope 0.79 -> 0.90 us/iter at 2, worse at 4): the
# span-wide OR fires the whole-span repair (2x the inline decode body)
# whenever ANY lane in ANY spanned iteration hits an escape, and at 512
# lanes that probability compounds fast.
UNROLL = 1
U32 = jnp.uint32
I32 = jnp.int32

# state rows in the persistent scratch (hybrid rows unused for lossless
# profiles; the bitrate accumulator is a C# int64 held as split limbs:
# Q = acc >> 16 wrapped to i32 — exactly the consumed bitrate value — and
# R = acc & 0xffff, updated with an add-with-carry)
(R_WLO, R_WHI, R_WCNT, R_WIDX,
 R_M0A, R_M1A, R_M2A, R_M0B, R_M1B, R_M2B,
 R_H1, R_H0, R_ZACC, R_DONE, R_NDEC,
 R_SLOWA, R_SLOWB, R_ACCQA, R_ACCRA, R_ACCQB, R_ACCRB,
 R_ERRA, R_ERRB, NSTATE) = range(24)
# read-only rows appended after the state: samples/lane, delta_a, delta_b
N_EXTRA = 3
SLO, SLS = consts.SLO, consts.SLS


def _bc_i32(x):
    return pltpu.bitcast(x, jnp.int32)


def _bc_u32(x):
    return pltpu.bitcast(x, jnp.uint32)


def _to32(y):
    """Trailing zeros of u32 (32 when zero)."""
    lsb = y & (U32(0) - y)
    return _bc_i32(jax.lax.population_count(lsb - U32(1)))


def _mask_u32(n):
    """(1 << n) - 1 for n in [0, 32]."""
    full = n >= 32
    nn = _bc_u32(jnp.clip(n, 0, 31))
    return jnp.where(full, U32(0xFFFFFFFF), (U32(1) << nn) - U32(1))


def _lane_tile(w_words: int) -> int:
    """Largest lane tile whose VMEM footprint fits: the words scratch plus
    the (W, tile) select-reduce temporary are the big consumers (~8 bytes
    per word-lane), outs/state take ~3 MB of the 16 MB budget."""
    for tile in (512, 256, 128):
        if w_words * tile * 8 <= 12 * 1024 * 1024:
            return tile
    return 128


def _entropy_kernel(state0_ref, words_ref, tables_ref, *refs, mono: bool,
                    hybrid: bool, hybrid_bitrate: bool, hybrid_balance: bool,
                    chunk: int, w_total: int, lane_tile: int, unroll: int,
                    wvc: bool = False):
    # wvc (hybrid-lossless): four extra output blocks carry each word's
    # error-limit-NARROWED interval — maxcode = high-low and
    # base = low-mid — which the correction-stream scan needs to restore
    # exact residuals (the values are live in the hybrid search below;
    # beyond reference parity, WavPackUtils.cs:31)
    if wvc:
        (out_a_ref, out_b_ref, mca_ref, mcb_ref, ba_ref, bb_ref,
         stfin_ref, st, tmp, wvmem, bufs, dma_sem) = refs
    else:
        (out_a_ref, out_b_ref, stfin_ref,
         st, tmp, wvmem, bufs, dma_sem) = refs
        mca_ref = mcb_ref = ba_ref = bb_ref = None
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        st[...] = state0_ref[...]
        # one-shot DMA of this lane tile's words HBM -> VMEM scratch; a
        # VMEM-blocked input would be double-buffered by the pipeline and
        # blow the 16 MB budget at larger tiles
        cp = pltpu.make_async_copy(
            words_ref.at[:, :, pl.ds(i * lane_tile, lane_tile)], wvmem,
            dma_sem)
        cp.start()
        cp.wait()

    L = lane_tile
    n_groups = w_total // 32
    # stream words as int32 (Mosaic lacks unsigned reductions); exactly one
    # selected term per lane makes the int32 sum the exact bit pattern.
    # Materialized ONCE per grid step and reused by every scheduled sweep
    # in the chunk — slicing wvmem per sweep re-measured 31% slower
    # (0.907 -> 1.192 us/iter on hardware)
    grouped = _bc_i32(wvmem[...])  # (W/32, 32, L), resident in VMEM
    iota_g = jax.lax.broadcasted_iota(I32, (n_groups, 1, 1), 0)
    iota32 = jax.lax.broadcasted_iota(I32, (32, 1), 0)
    max_g = I32(n_groups - 1)
    # group cache rows in `bufs`: [0:32) current group's words, [32:64)
    # next group's, [64] current group index, [65] next group index
    B_CUR, B_NXT, B_CG, B_NG = 0, 32, 64, 65

    def fetch_group(tgt):
        """One select-reduce sweep: the 32 words of group tgt per lane."""
        m = iota_g == tgt[None, :, :]
        return jnp.sum(jnp.where(m, grouped, I32(0)), axis=0, dtype=I32)

    def refresh_cache(widx, mask=None):
        """Refill the double-buffered group cache at widx's group (+1) for
        `mask` lanes (all lanes when None). Two sweeps; runs on the fixed
        schedule and inside the rare-path pl.when bodies."""
        eff = jnp.minimum(widx >> 5, max_g)
        nxt = jnp.minimum(eff + 1, max_g)
        cg = fetch_group(eff)
        ng = fetch_group(nxt)
        if mask is None:
            bufs[B_CUR:B_CUR + 32, :] = cg
            bufs[B_NXT:B_NXT + 32, :] = ng
            bufs[B_CG:B_CG + 1, :] = eff
            bufs[B_NG:B_NG + 1, :] = nxt
        else:
            bufs[B_CUR:B_CUR + 32, :] = jnp.where(mask, cg,
                                                  bufs[B_CUR:B_CUR + 32, :])
            bufs[B_NXT:B_NXT + 32, :] = jnp.where(mask, ng,
                                                  bufs[B_NXT:B_NXT + 32, :])
            bufs[B_CG:B_CG + 1, :] = jnp.where(mask, eff,
                                               bufs[B_CG:B_CG + 1, :])
            bufs[B_NG:B_NG + 1, :] = jnp.where(mask, nxt,
                                               bufs[B_NG:B_NG + 1, :])

    def refresh_cache_shift(widx):
        """Scheduled refresh in ONE full-W sweep instead of two: between
        scheduled refreshes a lane consumes < 33 words from an offset
        <= 31 inside its current group, so it crosses AT MOST ONE group
        boundary — i.e. widx's group is either the cached current group
        or the cached next group. Shift the next group's 32 cached words
        into current for crossed lanes (a 32-row select, no sweep) and
        fetch only the new next group. Lanes that re-centered mid-span
        (gamma cond_refresh) re-established widx-in-current there, so the
        bound holds from the most recent refresh of any kind."""
        eff = jnp.minimum(widx >> 5, max_g)
        nxt = jnp.minimum(eff + 1, max_g)
        crossed = eff != bufs[B_CG:B_CG + 1, :]
        bufs[B_CUR:B_CUR + 32, :] = jnp.where(
            crossed, bufs[B_NXT:B_NXT + 32, :], bufs[B_CUR:B_CUR + 32, :])
        # for uncrossed lanes nxt equals the cached next index, so the
        # sweep rewrites identical rows; crossed lanes get the new group
        bufs[B_NXT:B_NXT + 32, :] = fetch_group(nxt)
        bufs[B_CG:B_CG + 1, :] = eff
        bufs[B_NG:B_NG + 1, :] = nxt

    def cond_refresh(widx, mask):
        """Re-center the group cache for `mask` lanes whose remaining
        coverage dropped below 33 words, gated on a scalar any-reduce so
        the two full-W refresh sweeps only run when some lane actually
        needs them. A gamma consumes <= ~2.6 words, so most gamma events
        stay covered and pay only the reduce (~0.23 us), not the sweeps
        (~1.4 us). Invariant kept: after every gamma event each affected
        lane has >= 33 words of coverage (re-centered or already there),
        and <= 25.5 + 2.6 words are consumed before the next check, so
        every fetch_word stays inside the cached groups."""
        short = (widx + 33) > ((bufs[B_NG:B_NG + 1, :] + 1) << 5)
        need = mask & short
        any_need = jnp.max(jnp.where(need, I32(1), I32(0)))

        @pl.when(any_need > 0)
        def _recenter():
            refresh_cache(widx, need)

    def fetch_word(widx):
        """words[widx] per lane (uint32) from the group cache: two 32-row
        extractions + a select, no full-W sweep. The cache always covers
        widx (see module docstring for the consumption-bound argument)."""
        eff = jnp.minimum(widx >> 5, max_g)
        e = jnp.minimum(widx, I32(w_total - 1)) & 31
        sel_c = iota32 == e
        wc = jnp.sum(jnp.where(sel_c, bufs[B_CUR:B_CUR + 32, :], I32(0)),
                     axis=0, keepdims=True, dtype=I32)
        wn = jnp.sum(jnp.where(sel_c, bufs[B_NXT:B_NXT + 32, :], I32(0)),
                     axis=0, keepdims=True, dtype=I32)
        use_n = eff == bufs[B_NG:B_NG + 1, :]
        return _bc_u32(jnp.where(use_n, wn, wc))

    def table_lookup(base_row: int, idx):
        """Byte-packed constant-table lookup (hybrid only): the 256-byte
        exp2/log2 tables ride 4 entries per u32 word, so one lookup is a
        64-row onehot select-reduce + an in-word byte extract — 4x fewer
        row-ops than the naive 256-row sweep. These run up to 4x per
        stereo iteration (2 exp2s in update_error_limit, 2 mylog2 in the
        slow_level updates), so they set the hybrid/lossless gap."""
        tab = tables_ref[base_row:base_row + 64, :]
        iota = jax.lax.broadcasted_iota(I32, (64, 1), 0)
        m = iota == (idx >> 2)
        w = jnp.sum(jnp.where(m, tab, I32(0)), axis=0, keepdims=True,
                    dtype=I32)
        return _bc_i32(_bc_u32(w) >> _bc_u32((idx & 3) * 8)) & 0xFF

    def exp2s_k(log):
        """exp2s in i32 (WordsUtils.cs:633-646), sane input range."""
        neg = log < 0
        a = jnp.where(neg, -log, log)
        v = table_lookup(0, a & 0xFF) | 0x100
        sh = a >> 8
        r = jnp.where(sh <= 9, v >> jnp.clip(9 - sh, 0, 31),
                      v << jnp.clip(sh - 9, 0, 31))
        return jnp.where(neg, -r, r)

    def mylog2_k(av):
        """mylog2 in i32 (WordsUtils.cs:588-608), sane input range."""
        av = av + (av >> 9)
        dbits = jnp.where(av > 0,
                          32 - _bc_i32(jax.lax.clz(_bc_u32(av))), 0)
        sh = dbits - 9
        idx = jnp.where(sh >= 0, av >> jnp.clip(sh, 0, 31),
                        av << jnp.clip(-sh, 0, 31)) & 0xFF
        return (dbits << 8) + table_lookup(64, idx)

    def update_error_limit(hyb):
        """WordsUtils.cs:195-261 on split accumulators; `hyb` is the
        (slow_a, slow_b, qa, ra, qb, rb, erra, errb, da, db) tuple."""
        slow_a, slow_b, qa, ra, qb, rb, erra, errb, da, db = hyb
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
            return (slow_a, slow_b, qa2, ra2, qb, rb, e0, errb, da, db)
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
        return (slow_a, slow_b, qa2, ra2, qb2, rb2, e0, e1, da, db)

    def refill_once(win, need):
        """Insert one stream word at offset wcnt for lanes with `need` and
        room (wcnt <= 32). One sweep."""
        wlo, whi, wcnt, widx = win
        w = fetch_word(widx)
        do = need & (wcnt <= 32)
        sh_lo = _bc_u32(wcnt & 31)
        lo_ins = jnp.where(wcnt < 32, wlo | (w << sh_lo), wlo)
        sh_hi = _bc_u32((32 - wcnt) & 31)
        hi_ins = jnp.where(wcnt == 0, whi,
                           jnp.where(wcnt < 32, whi | (w >> sh_hi),
                                     whi | w))
        wlo = jnp.where(do, lo_ins, wlo)
        whi = jnp.where(do, hi_ins, whi)
        widx = jnp.where(do, widx + 1, widx)
        wcnt = jnp.where(do, wcnt + 32, wcnt)
        return (wlo, whi, wcnt, widx)

    def ensure33(win):
        """Refill to >= 33 held bits: two unconditional cache refills
        (cache extraction is ~12 vector ops, cheaper than gating the
        second refill behind a cross-lane reduce)."""
        win = refill_once(win, win[2] < 33)
        return refill_once(win, win[2] < 33)

    def consume(win, k, mask):
        """Drop k (<= 33, per-lane) bits for masked lanes."""
        wlo, whi, wcnt, widx = win
        kk = jnp.where(mask, k, 0)
        ksm = _bc_u32(kk & 31)
        inv = _bc_u32((32 - kk) & 31)
        lo_small = (wlo >> ksm) | jnp.where(kk == 0, U32(0), whi << inv)
        lo_big = whi >> _bc_u32((kk - 32) & 31)       # kk in [32, 33]
        wlo = jnp.where(kk < 32, lo_small, lo_big)
        whi = jnp.where(kk < 32, whi >> ksm, U32(0))
        wcnt = wcnt - kk
        return (wlo, whi, wcnt, widx)

    def trailing_ones33(win):
        t_lo = _to32(~win[0])
        b32 = _bc_i32(win[1] & 1)
        return jnp.minimum(jnp.where(t_lo >= 32, 32 + b32, t_lo), 33)

    def gamma(win):
        """Elias-style escape code (WordsUtils.cs:321-335) from the carried
        window. Returns (value u32, brk, win'); consumes its bits."""
        win = ensure33(win)
        cbits = trailing_ones33(win)
        brk = cbits >= 33
        win = consume(win, cbits + 1, ~brk)
        win = ensure33(win)
        data = win[0] & _mask_u32(cbits - 1)
        top = jnp.where(cbits >= 2,
                        U32(1) << _bc_u32(jnp.clip(cbits - 1, 0, 31)),
                        U32(0))
        v = jnp.where(cbits < 2, _bc_u32(cbits), data | top)
        win = consume(win, jnp.maximum(cbits - 1, 0), ~brk & (cbits >= 2))
        return v, brk, win

    def win_sel(mask, a, b):
        """Per-lane select between two windows."""
        return tuple(jnp.where(mask, x, y) for x, y in zip(a, b))

    def decode_word(state, entidx: int, active, inline: bool):
        (wlo, whi, wcnt, widx, m0a, m1a, m2a, m0b, m1b, m2b,
         h1, h0, zacc, done, ndec,
         slow_a, slow_b, qa, ra, qb, rb, erra, errb, da, db) = state
        win = (wlo, whi, wcnt, widx)
        act = active & (done == 0)
        med_c = (m0a, m1a, m2a) if entidx == 0 else (m0b, m1b, m2b)

        # ---- zero-run branch (WordsUtils.cs:304-352) ----
        zcond = (act & ((m0a & ~1) == 0) & ((m0b & ~1) == 0)
                 & (h1 == 0) & (h0 == 0))
        in_run = zcond & (zacc > 0)
        zacc1 = jnp.where(in_run, zacc - 1, zacc)
        consumed_zero = in_run & (zacc1 > 0)
        start = zcond & (zacc == 0)
        if inline:
            # rare path (runs under the iteration's single pl.when): gamma
            # computed branchlessly for every lane, merged for start lanes.
            # gamma may jump widx past the cached groups; re-center the
            # cache for the affected lanes (pre-gamma coverage was enough
            # for gamma itself: >= 7.5 words vs <= 66 bits consumed)
            zv, gb, win_g = gamma(win)
            cond_refresh(win_g[3], start)
            win = win_sel(start, win_g, win)
        else:
            # speculative common path: flag start lanes as rare; their
            # results are discarded and recomputed by the inline pass
            zv = jnp.zeros_like(_bc_u32(zacc))
            gb = start & False
        gbreak = start & gb
        do_gamma = start & ~gbreak
        # saturate run lengths at 2^30 (only reachable on corrupt streams;
        # a run can never exceed the block's samples on valid ones)
        zrun_raw = _bc_i32(zv)
        zrun = jnp.where((zrun_raw < 0) | (zrun_raw > (1 << 30)),
                         I32(1 << 30), zrun_raw)
        run_started = do_gamma & (zrun > 0)
        zacc1 = jnp.where(run_started, zrun, zacc1)
        emit_zero = consumed_zero | run_started
        if hybrid_bitrate:
            # slow_level decays on run-consumed zeros (WordsUtils.cs:313)
            slow_c0 = slow_a if entidx == 0 else slow_b
            slow_c0 = jnp.where(
                emit_zero, slow_c0 - ((slow_c0 + SLO) >> SLS), slow_c0)
            if entidx == 0:
                slow_a = slow_c0
            else:
                slow_b = slow_c0
        m0a = jnp.where(run_started, 0, m0a)
        m1a = jnp.where(run_started, 0, m1a)
        m2a = jnp.where(run_started, 0, m2a)
        m0b = jnp.where(run_started, 0, m0b)
        m1b = jnp.where(run_started, 0, m1b)
        m2b = jnp.where(run_started, 0, m2b)
        med_c = (m0a, m1a, m2a) if entidx == 0 else (m0b, m1b, m2b)

        normal = act & ~gbreak & ~emit_zero

        # ---- unary ones_count with holding carry (WordsUtils.cs:354-428) --
        use_h0 = normal & (h0 != 0)
        read = normal & (h0 == 0)
        win = ensure33(win)
        t_u = _to32(~win[0])  # trailing ones; values > 17 break below
        esc = t_u == consts.LIMIT_ONES
        ubreak = read & (t_u >= consts.LIMIT_ONES + 1)
        esc_lanes = esc & read
        if inline:
            win_e = consume(win, I32(17), esc_lanes)
            ev, eb, win_e = gamma(win_e)
            cond_refresh(win_e[3], esc_lanes)
            win = win_sel(esc_lanes, win_e, win)
            ebreak = esc_lanes & eb
        else:
            # escape lanes are rare: flagged, discarded, recomputed inline
            ev = jnp.zeros_like(_bc_u32(t_u))
            ebreak = esc_lanes & False
        rawu = jnp.where(esc, ev + U32(consts.LIMIT_ONES), _bc_u32(t_u))
        broke = gbreak | ubreak | ebreak
        ok_read = read & ~broke
        # fast-path consumption; escape lanes already consumed above
        win = consume(win, t_u + 1, ok_read & ~esc)

        oc = jnp.where(h1 != 0, (rawu >> 1) + U32(1), rawu >> 1)
        h1_new = _bc_i32(rawu & 1)
        oc = jnp.where(use_h0, U32(0), oc)
        h1 = jnp.where(ok_read, h1_new, jnp.where(use_h0, 0, h1))
        h0 = jnp.where(ok_read, 1 - h1_new, jnp.where(use_h0, 0, h0))

        code_mask = normal & ~broke

        # ---- hybrid error limit (WordsUtils.cs:430-431): before channel-A
        # words (and every word in mono) ----
        if hybrid and entidx == 0:
            hyb2 = update_error_limit((slow_a, slow_b, qa, ra, qb, rb,
                                       erra, errb, da, db))
            (_, _, qa2, ra2, qb2, rb2, e0, e1, _, _) = hyb2
            qa = jnp.where(code_mask, qa2, qa)
            ra = jnp.where(code_mask, ra2, ra)
            qb = jnp.where(code_mask, qb2, qb)
            rb = jnp.where(code_mask, rb2, rb)
            erra = jnp.where(code_mask, e0, erra)
            errb = jnp.where(code_mask, e1, errb)

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

        # ---- value: read_code (WordsUtils.cs:546-570) + sign ----
        # ONE refill suffices here (vs ensure33's two): every path into the
        # value read leaves wcnt >= 1 — common lanes hold >= 33 - 17 = 16
        # after the unary consume, and both inline gamma paths end with
        # ensure33 followed by a <= 31-bit consume, leaving >= 2 — so a
        # single insert from wcnt <= 32 always reaches >= 33 (and lanes
        # already at >= 33 skip it). The value+sign consume needs <= 33.
        win = refill_once(win, win[2] < 33)
        lo_v = win[0]
        b32_v = win[1] & 1
        maxcode = high - low
        bitcount = jnp.where(maxcode != 0,
                             32 - _bc_i32(jax.lax.clz(maxcode)), 0)
        # C# 1 << bitcount is a mod-32 int shift
        extras_u = (U32(1) << _bc_u32(bitcount & 31)) - maxcode - 1
        code0 = lo_v & _mask_u32(bitcount - 1)
        # signed comparison (both fit i32 in the sane regime; extras
        # negative as i32 => always true, matching C#)
        need_extra = (bitcount > 0) & (_bc_i32(code0) >= _bc_i32(extras_u))
        extra_pos = _bc_u32(jnp.clip(bitcount - 1, 0, 31))
        extra_bit = (lo_v >> extra_pos) & 1
        code = jnp.where(need_extra, (code0 << 1) - extras_u + extra_bit,
                         code0)
        consume_v = jnp.where(bitcount == 0, 0,
                              bitcount - 1 + jnp.where(need_extra, 1, 0))
        mid = low + code

        wvc_mc = wvc_base = None
        if hybrid:
            # error-limited binary search (WordsUtils.cs:486-492);
            # statically unrolled 32 single-bit steps read from the window
            err_c = (erra if entidx == 0 else errb)
            err_u = _bc_u32(err_c)
            s_lo, s_hi = low, high
            s_mid = (s_hi + s_lo + 1) >> U32(1)
            used = jnp.zeros_like(consume_v)
            for _k in range(32):
                go = (s_hi - s_lo) > err_u
                bit = (lo_v >> _bc_u32(jnp.clip(used, 0, 31))) & 1
                s_lo = jnp.where(go & (bit != 0), s_mid, s_lo)
                s_hi = jnp.where(go & (bit == 0), s_mid - 1, s_hi)
                s_mid = jnp.where(go, (s_hi + s_lo + 1) >> U32(1), s_mid)
                used = used + jnp.where(go, 1, 0)
            lossless_lane = err_c == 0
            mid = jnp.where(lossless_lane, mid, s_mid)
            consume_v = jnp.where(lossless_lane, consume_v, used)
            if wvc:
                coded = code_mask & jnp.logical_not(lossless_lane)
                wvc_mc = _bc_i32(jnp.where(coded, s_hi - s_lo, U32(0)))
                wvc_base = _bc_i32(jnp.where(coded, s_lo - s_mid, U32(0)))

        sign = jnp.where(consume_v >= 32, b32_v,
                         (lo_v >> _bc_u32(jnp.clip(consume_v, 0, 31))) & 1)
        win = consume(win, consume_v + 1, code_mask)
        value = _bc_i32(jnp.where(sign != 0, ~mid, mid))

        if hybrid_bitrate:
            # slow_level tracks decoded magnitudes (WordsUtils.cs:501-502)
            slow_c0 = slow_a if entidx == 0 else slow_b
            slow_new = (slow_c0 - ((slow_c0 + SLO) >> SLS)
                        + mylog2_k(_bc_i32(mid)))
            slow_c0 = jnp.where(code_mask, slow_new, slow_c0)
            if entidx == 0:
                slow_a = slow_c0
            else:
                slow_b = slow_c0

        out = jnp.where(code_mask, value, 0)
        done = jnp.where(broke, 1, done)
        ndec = ndec + jnp.where(emit_zero | code_mask, 1, 0)
        # rare = lanes whose speculative (common-path) decode is invalid:
        # zero-run gamma starts and LIMIT_ONES escapes. Exact in spec mode
        # for any lane whose earlier words this iteration were common —
        # lanes already flagged by an earlier word are recomputed anyway.
        rare = start | esc_lanes
        st_out = (win[0], win[1], win[2], win[3],
                  m0a, m1a, m2a, m0b, m1b, m2b, h1, h0, zacc1,
                  done, ndec,
                  slow_a, slow_b, qa, ra, qb, rb, erra, errb, da, db)
        if wvc:
            z = jnp.zeros_like(out)
            return (st_out, out,
                    wvc_mc if wvc_mc is not None else z,
                    wvc_base if wvc_base is not None else z, rare)
        return st_out, out, rare

    def load_state():
        out = []
        for k in range(NSTATE):
            row = st[k:k + 1, :]
            out.append(_bc_u32(row) if k in (R_WLO, R_WHI) else row)
        # read-only delta rows ride along in the carry
        out.append(state0_ref[NSTATE + 1:NSTATE + 2, :])
        out.append(state0_ref[NSTATE + 2:NSTATE + 3, :])
        return tuple(out)

    carry0 = load_state()

    # refresh cadence: every 10 decoded iterations regardless of unroll.
    # Budget: a common-path word consumes <= 50 bits (17 unary + 33
    # value+sign, hybrid search included), so 10 stereo iterations consume
    # <= 31.25 words while a refresh always leaves >= 33 buffered (widx
    # offset <= 31 inside its group + the cached next group). Gamma paths
    # re-center their own lanes inside the rare-repair body.
    sched = max(1, 10 // unroll)

    def body(t0, carry):
        # scheduled group-cache refresh: the only full-W sweep on the
        # common path (scalar condition, no cross-lane reduce). The first
        # refresh of the kernel must populate both cached groups (bufs is
        # uninitialized scratch); every later one shifts + single-sweeps.
        first = (j == 0) & (t0 == 0)

        @pl.when(first)
        def _first_refresh():
            refresh_cache(carry[R_WIDX])

        @pl.when(jnp.logical_not(first) & ((t0 % sched) == 0))
        def _sched_refresh():
            refresh_cache_shift(carry[R_WIDX])

        state = carry
        limit = state0_ref[NSTATE:NSTATE + 1, :]  # samples per lane
        # speculative pass: all `unroll` iterations x both channels run the
        # common path with no cross-lane reduces, OR-accumulating per-lane
        # rare flags; ONE any-reduce then gates a repair of the whole
        # unrolled span. A lane rare in any iteration discards its whole
        # span (its later speculative iterations read a garbage window);
        # non-rare lanes' speculative results equal the inline recompute.
        spec = state
        outs = []
        rare = None
        rows = 6 if wvc else 2          # tmp rows per unroll iteration

        def _dw(s, entidx, active, inline):
            if wvc:
                s, o, mc, ba_, r = decode_word(s, entidx, active,
                                               inline=inline)
                return s, (o, mc, ba_), r
            s, o, r = decode_word(s, entidx, active, inline=inline)
            return s, (o, None, None), r

        for u in range(unroll):
            t = t0 * unroll + u
            active = (j * chunk + t) < limit
            spec, pa, r = _dw(spec, 0, active, inline=False)
            pb = (None, None, None)
            if not mono:
                spec, pb, rb = _dw(spec, 1, active, inline=False)
                r = r | rb
            outs.append((pa, pb))
            rare = r if rare is None else rare | r
        any_rare = jnp.max(jnp.where(rare, I32(1), I32(0)))

        # rare repair: re-decode the span from the pre-span state with
        # gammas inlined branchlessly (the span's ONLY cross-lane reduce
        # gates this body). tmp row layout per iteration u (base
        # NSTATE + rows*u): [oa, ob] — plus [mca, mcb, ba, bb] under wvc
        @pl.when(any_rare > 0)
        def _rare_repair():
            s1 = state
            for u in range(unroll):
                t = t0 * unroll + u
                active = (j * chunk + t) < limit
                base = NSTATE + rows * u
                s1, (oa, mca, baa), _ = _dw(s1, 0, active, inline=True)
                tmp[base:base + 1, :] = oa
                if wvc:
                    tmp[base + 2:base + 3, :] = mca
                    tmp[base + 4:base + 5, :] = baa
                if not mono:
                    s1, (ob, mcb, bab), _ = _dw(s1, 1, active, inline=True)
                    tmp[base + 1:base + 2, :] = ob
                    if wvc:
                        tmp[base + 3:base + 4, :] = mcb
                        tmp[base + 5:base + 6, :] = bab
            for k in range(NSTATE):
                row = s1[k]
                tmp[k:k + 1, :] = (_bc_i32(row)
                                   if k in (R_WLO, R_WHI) else row)

        merged = []
        for k in range(NSTATE):
            t_k = tmp[k:k + 1, :]
            if k in (R_WLO, R_WHI):
                merged.append(jnp.where(rare, _bc_u32(t_k), spec[k]))
            else:
                merged.append(jnp.where(rare, t_k, spec[k]))
        merged.append(spec[NSTATE])      # delta_a (read-only)
        merged.append(spec[NSTATE + 1])  # delta_b (read-only)
        for u in range(unroll):
            t = t0 * unroll + u
            (out_a, mca, baa), (out_b, mcb, bab) = outs[u]
            base = NSTATE + rows * u
            out_a_ref[pl.ds(t, 1), :] = jnp.where(
                rare, tmp[base:base + 1, :], out_a)
            if wvc:
                mca_ref[pl.ds(t, 1), :] = jnp.where(
                    rare, tmp[base + 2:base + 3, :], mca)
                ba_ref[pl.ds(t, 1), :] = jnp.where(
                    rare, tmp[base + 4:base + 5, :], baa)
            if not mono:
                out_b_ref[pl.ds(t, 1), :] = jnp.where(
                    rare, tmp[base + 1:base + 2, :], out_b)
                if wvc:
                    mcb_ref[pl.ds(t, 1), :] = jnp.where(
                        rare, tmp[base + 3:base + 4, :], mcb)
                    bb_ref[pl.ds(t, 1), :] = jnp.where(
                        rare, tmp[base + 5:base + 6, :], bab)
        return tuple(merged)

    # static Python-int bounds; tracing runs under enable_x64(False), so
    # the induction variable stays int32 for Mosaic
    assert chunk % unroll == 0
    final = jax.lax.fori_loop(0, chunk // unroll, body, carry0)

    for k in range(NSTATE):
        row = final[k]
        st[k:k + 1, :] = _bc_i32(row) if k in (R_WLO, R_WHI) else row
    st[NSTATE:NSTATE + N_EXTRA, :] = state0_ref[NSTATE:NSTATE + N_EXTRA, :]
    stfin_ref[...] = st[...]


@partial(jax.jit, static_argnames=("mono", "hybrid", "hybrid_bitrate",
                                   "hybrid_balance", "nsteps", "interpret",
                                   "wvc"))
def entropy_decode_pallas(words, nwords_lane, med0, slow0=None, acc0=None,
                          delta0=None, *, mono: bool, hybrid: bool = False,
                          hybrid_bitrate: bool = False,
                          hybrid_balance: bool = False,
                          nsteps: int, interpret: bool = False,
                          wvc: bool = False):
    """Pallas entropy decode; same contract as entropy_decode. words
    (L, W) uint32; returns (residuals (T, L, C) int32, broke (L,) bool,
    ndec (L,) int32).

    wvc=True (requires hybrid) additionally returns each word's
    error-limit-narrowed interval — (maxcode, base) (T, L, C) int32 —
    for the hybrid-lossless correction scan:
    (residuals, maxcode, base, broke, ndec)."""
    assert not wvc or hybrid
    L, W = words.shape
    C = 1 if mono else 2
    T = nsteps // C
    lane_tile = _lane_tile(((W + 31) // 32) * 32)
    Lp = ((L + lane_tile - 1) // lane_tile) * lane_tile
    # chunk bounds the double-buffered output blocks (2 outs x 2 buffers x
    # chunk x tile x 4B); at tile 512 the words scratch + sweep temporary
    # already push the 16 MB VMEM budget, so halve the chunk there.
    # wvc triples the output blocks (6 outs): halve again to stay inside
    chunk = min(T, 128 if lane_tile >= 512 else 256)
    if wvc:
        chunk = min(T, max(chunk // 2, 32))
    while T % chunk:
        chunk //= 2
    assert chunk >= 1
    # speculate UNROLL iterations per any-reduce (the reduce is ~0.23 us
    # latency-bound whether taken or not; spanning 2 iterations halves it)
    unroll = UNROLL if chunk % UNROLL == 0 else 1

    # W padded to the 32-word cache group for the grouped layout
    W = ((W + 31) // 32) * 32
    wpad = jnp.pad(words, ((0, Lp - L), (0, W - words.shape[1])),
                   constant_values=np.uint32(0xFFFFFFFF))
    words_t = wpad.T.reshape(W // 32, 32, Lp)

    state0 = jnp.zeros((NSTATE + N_EXTRA, Lp), jnp.int32)
    state0 = state0.at[R_M0A, :L].set(med0[:, 0, 0].astype(jnp.int32))
    state0 = state0.at[R_M1A, :L].set(med0[:, 0, 1].astype(jnp.int32))
    state0 = state0.at[R_M2A, :L].set(med0[:, 0, 2].astype(jnp.int32))
    state0 = state0.at[R_M0B, :L].set(med0[:, 1, 0].astype(jnp.int32))
    state0 = state0.at[R_M1B, :L].set(med0[:, 1, 1].astype(jnp.int32))
    state0 = state0.at[R_M2B, :L].set(med0[:, 1, 2].astype(jnp.int32))
    if hybrid:
        state0 = state0.at[R_SLOWA, :L].set(slow0[:, 0].astype(jnp.int32))
        state0 = state0.at[R_SLOWB, :L].set(slow0[:, 1].astype(jnp.int32))
        # acc arrives as a multiple of 2^16 (metadata << 16): Q = acc >> 16
        state0 = state0.at[R_ACCQA, :L].set(
            (acc0[:, 0] >> 16).astype(jnp.int32))
        state0 = state0.at[R_ACCQB, :L].set(
            (acc0[:, 1] >> 16).astype(jnp.int32))
        state0 = state0.at[NSTATE + 1, :L].set(delta0[:, 0].astype(jnp.int32))
        state0 = state0.at[NSTATE + 2, :L].set(delta0[:, 1].astype(jnp.int32))
    nsamp = (nwords_lane // C).astype(jnp.int32)
    state0 = state0.at[NSTATE, :L].set(nsamp)

    if hybrid:
        from ..tables import EXP2_NP, LOG2_NP
        tabs = np.concatenate([EXP2_NP, LOG2_NP]).astype(np.uint32)
        b4 = tabs.reshape(128, 4)
        words = (b4[:, 0] | (b4[:, 1] << 8) | (b4[:, 2] << 16)
                 | (b4[:, 3] << 24)).astype(np.int32)
        tables = jnp.broadcast_to(jnp.asarray(words)[:, None], (128, Lp))
        tab_rows = 128
    else:
        tables = jnp.zeros((8, Lp), jnp.int32)
        tab_rows = 8

    grid = (Lp // lane_tile, T // chunk)
    kernel = partial(_entropy_kernel, mono=mono, hybrid=hybrid,
                     hybrid_bitrate=hybrid_bitrate,
                     hybrid_balance=hybrid_balance, chunk=chunk, w_total=W,
                     lane_tile=lane_tile, unroll=unroll, wvc=wvc)
    n_tl = 6 if wvc else 2               # (T, Lp) output blocks
    tl_spec = pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                           memory_space=pltpu.VMEM)
    out_shape = ([jax.ShapeDtypeStruct((T, Lp), jnp.int32)] * n_tl
                 + [jax.ShapeDtypeStruct((NSTATE + N_EXTRA, Lp),
                                         jnp.int32)])
    with jax.enable_x64(False):
        res_all = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((NSTATE + N_EXTRA, lane_tile),
                             lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((tab_rows, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[tl_spec] * n_tl + [
                pl.BlockSpec((NSTATE + N_EXTRA, lane_tile),
                             lambda i, j: (0, i), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((NSTATE + N_EXTRA, lane_tile), jnp.int32),
                pltpu.VMEM((NSTATE + (6 if wvc else 2) * unroll,
                            lane_tile), jnp.int32),
                pltpu.VMEM((W // 32, 32, lane_tile), jnp.uint32),
                pltpu.VMEM((66, lane_tile), jnp.int32),
                pltpu.SemaphoreType.DMA(())],
            out_shape=out_shape,
            interpret=interpret,
        )(state0, words_t, tables)
    if wvc:
        out_a, out_b, mc_a, mc_b, ba_a, ba_b, stfin = res_all
    else:
        out_a, out_b, stfin = res_all

    broke = stfin[R_DONE, :L] != 0
    ndec = stfin[R_NDEC, :L]  # counts words (both channels)
    if mono:
        res = out_a[:, :L, None]
    else:
        res = jnp.stack([out_a[:, :L], out_b[:, :L]], axis=2)
    if wvc:
        if mono:
            mc = mc_a[:, :L, None]
            base = ba_a[:, :L, None]
        else:
            mc = jnp.stack([mc_a[:, :L], mc_b[:, :L]], axis=2)
            base = jnp.stack([ba_a[:, :L], ba_b[:, :L]], axis=2)
        return res, mc, base, broke, ndec
    return res, broke, ndec
