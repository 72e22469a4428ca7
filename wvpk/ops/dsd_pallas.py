"""Pallas TPU kernels for DSD mode 3 ("high") and mode 1 ("fast") decode.

The XLA scan kernels (dsd.py) are bound by per-step HBM gathers and
anti-scale with lane count (NOTES.md). These kernels keep the per-lane
tables RESIDENT IN VMEM and feed byte consumption from the same
double-buffered 32-word group cache as the entropy kernel.

Mode 3 (DsdUtils.cs:391-493): binary arithmetic coder with adaptive
ptable (a (256, tile) VMEM scratch; lookup/update = 256-row onehot
select-reduce) + 6-stage leaky-integrator filter bank per channel,
channels interleaved in one arithmetic stream, 8 bits per output byte.

Mode 1 (DsdUtils.cs:244-304): byte-wise range decoder over per-history-bin
cumulative probability tables. The reference's value_lookup expansion
table (code = lookup[vlook[p0] + index]) is replaced by a rank search on
the cumulative `summed` table — code = #{c : summed[p0][c] <= index} —
which also yields summed[code-1] (running max) and summed[code] (running
min) in the same sweep, so neither the `probs` nor the `lookup` tables
are staged at all. The unsigned 32-bit divisions (no Mosaic vector div)
are 32-step restoring long divisions; the rare interval-reset path
(mult == 0, detected as high - low < sp255 BEFORE dividing) shares the
main division.

Both kernels renormalize in CLOSED FORM: the reference's byte-at-a-time
loop `while ((high^low) & 0xFF000000) == 0` runs exactly
clz(high^low) >> 3 iterations (each shift lowers clz by exactly 8), so
renorm = one clz + a 4-byte windowed fetch instead of four sequential
conditional byte fetches.

All C# uint arithmetic is int32 bit patterns with unsigned compares via
the sign-bias trick.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dsd import DECAY, DOWN, PRECISION, PRECISION_USE, PTABLE_MASK, UP

I32 = jnp.int32
U32 = jnp.uint32
VALUE_ONE = 1 << PRECISION
SIGN = -0x80000000  # i32 bias for unsigned compares


def _bc_i32(x):
    return pltpu.bitcast(x, jnp.int32)


def _bc_u32(x):
    return pltpu.bitcast(x, jnp.uint32)


def _ult(a, b):
    """Unsigned a < b on i32 bit patterns."""
    return (a ^ SIGN) < (b ^ SIGN)


def _ule(a, b):
    return (a ^ SIGN) <= (b ^ SIGN)


def _lshr(x, k):
    """Logical shift right by scalar int k."""
    return _bc_i32(_bc_u32(x) >> U32(k))


# state scratch rows
(S_VAL, S_LOW, S_HIGH, S_BPTR, S_CRC, S_CH0) = range(6)
CH_ROWS = 7  # f1..f6, factor


def _dsd_high_kernel(state0_ref, ptable0_ref, meta_ref, words_ref,
                     out_a_ref, out_b_ref, st, pt, bufs, wvmem, dma_sem, *,
                     mono: bool, chunk: int, w_total: int, lane_tile: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    C = 1 if mono else 2
    nstate = S_CH0 + CH_ROWS * C

    @pl.when(j == 0)
    def _init():
        st[...] = state0_ref[...]
        pt[...] = ptable0_ref[...]
        # poison the cached next-group index so the first step's coverage
        # guard always fires and populates the cache + byte window
        bufs[64:66, :] = jnp.full((2, lane_tile), -1, I32)
        cp = pltpu.make_async_copy(
            words_ref.at[:, :, pl.ds(i * lane_tile, lane_tile)], wvmem,
            dma_sem)
        cp.start()
        cp.wait()

    n_groups = w_total // 32
    iota_g = jax.lax.broadcasted_iota(I32, (n_groups, 1, 1), 0)
    iota32 = jax.lax.broadcasted_iota(I32, (32, 1), 0)
    iota256 = jax.lax.broadcasted_iota(I32, (256, 1), 0)
    max_g = I32(n_groups - 1)
    nbytes = meta_ref[0:1, :]
    nsamp = meta_ref[1:2, :]

    def fetch_group(tgt):
        # chunked select-reduce: bounds the masked temporary to 32 groups
        # (a full (G, 32, tile) where-temp at G >= 128 blows the 16 MB
        # VMEM stack on top of the resident words scratch)
        acc = None
        for g0 in range(0, n_groups, 32):
            blk = _bc_i32(wvmem[g0:g0 + 32])   # slice the ref, not a copy
            m = iota_g[g0:g0 + 32] == tgt[None, :, :]
            part = jnp.sum(jnp.where(m, blk, I32(0)), axis=0, dtype=I32)
            acc = part if acc is None else acc + part
        return acc

    # bufs rows [66] and [67] carry the two stream words at bptr>>2 and
    # bptr>>2 + 1 — a per-lane byte window kept in sync with bptr so the
    # per-bit renorm reads bytes with NO cache extraction (rebuilt after
    # every scheduled refresh, advanced with one lookahead fetch per bit)
    B_W0, B_W1 = 66, 67

    def refresh_cache(bptr):
        widx = bptr >> 2
        eff = jnp.minimum(widx >> 5, max_g)
        nxt = jnp.minimum(eff + 1, max_g)
        bufs[0:32, :] = fetch_group(eff)
        bufs[32:64, :] = fetch_group(nxt)
        bufs[64:65, :] = eff
        bufs[65:66, :] = nxt
        bufs[B_W0:B_W0 + 1, :] = fetch_word(widx)
        bufs[B_W1:B_W1 + 1, :] = fetch_word(widx + 1)

    def fetch_word(widx):
        eff = jnp.minimum(widx >> 5, max_g)
        e = jnp.minimum(widx, I32(w_total - 1)) & 31
        sel = iota32 == e
        wc = jnp.sum(jnp.where(sel, bufs[0:32, :], I32(0)), axis=0,
                     keepdims=True, dtype=I32)
        wn = jnp.sum(jnp.where(sel, bufs[32:64, :], I32(0)), axis=0,
                     keepdims=True, dtype=I32)
        return jnp.where(eff == bufs[65:66, :], wn, wc)

    def _swap_be(lwi):
        return (((lwi & 0xFF) << 24) | ((lwi & 0xFF00) << 8)
                | (_lshr(lwi, 8) & 0xFF00) | (_lshr(lwi, 24) & 0xFF))

    def renorm(high, low, value, bptr, active):
        """Closed-form byte renormalization (DsdUtils.cs:295-300): the
        loop runs exactly clz(high^low) >> 3 times (each shift lowers clz
        by exactly 8), clamped by bytes left. Bytes come from the carried
        two-word window (bufs[B_W0/B_W1]); the window advances by at most
        one word per bit (k <= 4 from a word-aligned base + in-word
        offset), refilled with a single lookahead cache extraction."""
        w0 = bufs[B_W0:B_W0 + 1, :]
        w1 = bufs[B_W1:B_W1 + 1, :]
        lead = _bc_i32(jax.lax.clz(_bc_u32(high ^ low)))
        k = jnp.minimum(lead >> 3, jnp.clip(nbytes - bptr, 0, 4))
        k = jnp.where(active, k, 0)
        o = (bptr & 3) * 8
        lw = (_bc_u32(w0) >> _bc_u32(o)) | jnp.where(
            o == 0, U32(0), _bc_u32(w1) << _bc_u32((32 - o) & 31))
        w4 = _swap_be(_bc_i32(lw))
        shu = _bc_u32((k * 8) & 31)
        vmix = _bc_i32((_bc_u32(value) << shu)
                       | (_bc_u32(w4) >> _bc_u32((32 - k * 8) & 31)))
        value = jnp.where(k == 0, value, jnp.where(k == 4, w4, vmix))
        ones = _bc_i32((U32(1) << shu) - U32(1))
        high = jnp.where(k == 4, I32(-1),
                         _bc_i32(_bc_u32(high) << shu) | ones)
        low = jnp.where(k == 4, I32(0), _bc_i32(_bc_u32(low) << shu))
        wi = bptr >> 2
        bptr = bptr + k
        adv = (bptr >> 2) != wi
        wnew = fetch_word(wi + 2)
        bufs[B_W0:B_W0 + 1, :] = jnp.where(adv, w1, w0)
        bufs[B_W1:B_W1 + 1, :] = jnp.where(adv, wnew, w1)
        return high, low, value, bptr

    def pp_of(val):
        return _lshr(val, PRECISION - PRECISION_USE) & PTABLE_MASK

    def ptable_get(pp):
        m = iota256 == pp
        return jnp.sum(jnp.where(m, pt[...], I32(0)), axis=0,
                       keepdims=True, dtype=I32)

    def one_bit(coder, ch, active, pt_pp):
        """Decode one arithmetic-coded bit (DsdUtils.cs:405-470) given a
        prefetched ptable entry; returns the new entry value for the
        caller's deferred (paired) table update instead of writing it."""
        value, low, high, bptr = coder
        f1, f2, f3, f4, f5, f6, factor, val, bytei = ch
        # split = low + ((high - low) >> 8) * (pt >> 16), uint wrap
        split = low + _lshr(high - low, 8) * _lshr(pt_pp, 16)
        bit1 = _ule(value, split)
        high = jnp.where(bit1 & active, split, high)
        low = jnp.where(bit1 | ~active, low, split + 1)
        pt_new = jnp.where(bit1, pt_pp + ((UP - pt_pp) >> DECAY),
                           pt_pp + ((DOWN - pt_pp) >> DECAY))
        f0 = jnp.where(bit1, I32(-1), I32(0))
        high, low, value, bptr = renorm(high, low, value, bptr, active)
        val = val + f6 * 8
        bytei = (bytei << 1) | (f0 & 1)
        factor = factor + ((((val ^ f0) >> 31) | 1)
                           & ((val ^ (val - f6 * 16)) >> 31))
        f1 = f1 + (((f0 & VALUE_ONE) - f1) >> 6)
        f2 = f2 + (((f0 & VALUE_ONE) - f2) >> 4)
        f3 = f3 + ((f2 - f3) >> 4)
        f4 = f4 + ((f3 - f4) >> 4)
        val = (f4 - f5) >> 4
        f5 = f5 + val
        f6 = f6 + ((val - f6) >> 3)
        val = f1 - f5 + ((f6 * factor) >> 2)
        return ((value, low, high, bptr),
                (f1, f2, f3, f4, f5, f6, factor, val, bytei),
                pt_new)

    def load_state():
        rows = [st[k:k + 1, :] for k in range(nstate)]
        return tuple(rows)

    def body(tt, carry):
        t = j * chunk + tt
        active = t < nsamp

        # guarded refresh: a fully-converged ptable entry (pt>>16 == 256)
        # lets the unlikely branch collapse the interval to
        # (high-low) & 0xFF, so ONE bit can renormalize up to 4 bytes —
        # worst-case consumption is 16 bits x 4 bytes = 16 words per
        # stereo step (no amortized bound holds). Guard per step instead
        # of a fixed schedule: refresh when any lane's remaining coverage
        # drops below 16 + 2 lookahead words (one scalar any-reduce per
        # step; the two full sweeps run only when actually needed)
        widx0 = carry[S_BPTR] >> 2
        short = (widx0 + 18) > ((bufs[65:66, :] + 1) << 5)
        any_short = jnp.max(jnp.where(short, I32(1), I32(0)))

        @pl.when(any_short > 0)
        def _guard_refresh():
            refresh_cache(carry[S_BPTR])

        coder = (carry[S_VAL], carry[S_LOW], carry[S_HIGH], carry[S_BPTR])
        crc = carry[S_CRC]
        chans = []
        for c in range(C):
            base = S_CH0 + CH_ROWS * c
            f = list(carry[base:base + CH_ROWS])
            # per-sample predictor seed (DsdUtils.cs:401-404)
            val = f[0] - f[4] + ((f[5] * f[6]) >> 2)
            chans.append(tuple(f) + (val, jnp.zeros_like(val)))
        # paired table updates: bit 2k+1's entry is read STALE (missing
        # only bit 2k's pending row update, reconstructed by a cheap
        # per-lane scalar select when the rows collide), then both row
        # updates land in ONE masked sweep — 32 -> 24 full-(256, tile)
        # traversals per stereo step, with reads and writes kept as
        # independent sweeps (a read-through-write fusion measured 34%
        # slower; see NOTES.md)
        pend = None
        for _bit in range(8):
            for c in range(C):
                pp = pp_of(chans[c][7])
                pt_pp = ptable_get(pp)
                if pend is not None:
                    pt_pp = jnp.where(pp == pend[0], pend[1], pt_pp)
                coder, chans[c], ptnew = one_bit(coder, chans[c], active,
                                                 pt_pp)
                if pend is None:
                    pend = (pp, ptnew)
                else:
                    m2 = (iota256 == pp) & active
                    m1 = (iota256 == pend[0]) & active
                    pt[...] = jnp.where(m2, ptnew,
                                        jnp.where(m1, pend[1], pt[...]))
                    pend = None
        if pend is not None:
            pt[...] = jnp.where((iota256 == pend[0]) & active, pend[1],
                                pt[...])
        out = list(carry)
        out[S_VAL], out[S_LOW], out[S_HIGH], out[S_BPTR] = coder
        for c in range(C):
            f1, f2, f3, f4, f5, f6, factor, val, bytei = chans[c]
            code = bytei & 0xFF
            crc = jnp.where(active, crc * 3 + code, crc)
            factor = factor - ((factor + 512) >> 10)
            base = S_CH0 + CH_ROWS * c
            upd = (f1, f2, f3, f4, f5, f6, factor)
            for r in range(CH_ROWS):
                out[base + r] = jnp.where(active, upd[r], carry[base + r])
            ocode = jnp.where(active, code, 0)
            if c == 0:
                out_a_ref[pl.ds(tt, 1), :] = ocode
            else:
                out_b_ref[pl.ds(tt, 1), :] = ocode
        out[S_CRC] = crc
        return tuple(out)

    final = jax.lax.fori_loop(0, chunk, body, load_state())
    for k in range(nstate):
        st[k:k + 1, :] = final[k]


@partial(jax.jit, static_argnames=("mono", "nsteps", "interpret"))
def dsd_high_decode_pallas(data, nbytes, ptable0, filters0, value0,
                           nsamples, *, mono: bool, nsteps: int,
                           interpret: bool = False):
    """Pallas DSD high decode; same contract as dsd.dsd_high_decode.

    data (L, NB) int32 byte values; nbytes (L,); ptable0 (L, 256) int32;
    filters0 (L, 2, 8) int32; value0 (L,); nsamples (L,).
    Returns (out (nsteps, L, C) int32, crc (L,) int32).
    """
    import numpy as np

    L, NB = data.shape
    C = 1 if mono else 2
    # the coder chain is latency-bound on (1, tile) ops: wider tiles do
    # more work per op at the same latency (VMEM: ptable 0.5MB + words
    # ~4MB at tile 512 for typical 8k-byte payload caps)
    lane_tile = min(512, max(128, 1 << max(L - 1, 1).bit_length()))
    Lp = ((L + lane_tile - 1) // lane_tile) * lane_tile
    chunk = min(nsteps, 256)
    T = ((nsteps + chunk - 1) // chunk) * chunk

    # LE-pack 4 bytes per word; pad NB to a 32-word group multiple
    NBp = ((NB + 127) // 128) * 128
    b = jnp.pad(data.astype(jnp.uint32), ((0, Lp - L), (0, NBp - NB)))
    b4 = b.reshape(Lp, NBp // 4, 4)
    words = (b4[:, :, 0] | (b4[:, :, 1] << 8) | (b4[:, :, 2] << 16)
             | (b4[:, :, 3] << 24))
    words_t = words.T.reshape(NBp // 128, 32, Lp)

    nstate = S_CH0 + CH_ROWS * C
    state0 = jnp.zeros((nstate, Lp), I32)
    state0 = state0.at[S_VAL, :L].set(value0.astype(I32))
    state0 = state0.at[S_HIGH, :L].set(I32(-1))
    state0 = state0.at[S_CRC, :].set(I32(-1))
    for c in range(C):
        base = S_CH0 + CH_ROWS * c
        for r in range(CH_ROWS):
            state0 = state0.at[base + r, :L].set(
                filters0[:, c, r].astype(I32))
    ptab = jnp.zeros((256, Lp), I32).at[:, :L].set(
        ptable0.astype(I32).T)
    meta = jnp.zeros((2, Lp), I32)
    meta = meta.at[0, :L].set(nbytes.astype(I32))
    meta = meta.at[1, :L].set(nsamples.astype(I32))

    grid = (Lp // lane_tile, T // chunk)
    kernel = partial(_dsd_high_kernel, mono=mono, chunk=chunk,
                     w_total=NBp // 4, lane_tile=lane_tile)
    out_shape = [jax.ShapeDtypeStruct((T, Lp), I32),
                 jax.ShapeDtypeStruct((T, Lp), I32)]
    with jax.enable_x64(False):
        out_a, out_b = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nstate, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((nstate, lane_tile), I32),
                pltpu.VMEM((256, lane_tile), I32),
                pltpu.VMEM((68, lane_tile), I32),
                pltpu.VMEM((NBp // 128, 32, lane_tile), jnp.uint32),
                pltpu.SemaphoreType.DMA(())],
            out_shape=out_shape,
            interpret=interpret,
        )(state0, ptab, meta, words_t)

    # final-state CRC rides in the scratch; recompute from outputs is
    # wrong (mute semantics) — so thread it out via an extra output row
    # instead: cheaper to recompute here in XLA over the small outputs.
    # We instead return CRC computed the same way as the kernel did:
    tidx = jnp.arange(T, dtype=I32)[:, None]
    valid = tidx < nsamples[None, :L]
    crc = jnp.full((L,), jnp.uint32(0xFFFFFFFF))
    a = jnp.where(valid, jnp.uint32(9 if C == 2 else 3), jnp.uint32(1))
    if C == 2:
        v = (out_a[:, :L].astype(jnp.uint32) * 3
             + out_b[:, :L].astype(jnp.uint32))
    else:
        v = out_a[:, :L].astype(jnp.uint32)
    bvec = jnp.where(valid, v, jnp.uint32(0))

    def compose(x, y):
        return (y[0] * x[0], y[0] * x[1] + y[1])

    A, B = jax.lax.associative_scan(compose, (a, bvec), axis=0)
    crc = A[-1] * crc + B[-1]
    crc = crc.astype(I32)

    if mono:
        out = out_a[:nsteps, :L, None]
    else:
        out = jnp.stack([out_a[:nsteps, :L], out_b[:nsteps, :L]], axis=2)
    return out, crc


# ---------------------------------------------------------------------------
# Mode 1 ("fast") range decoder
# ---------------------------------------------------------------------------

# state rows
(F_VAL, F_LOW, F_HIGH, F_BPTR, F_P0, F_P1, F_CRC, F_ERR, F_NSTATE) = range(9)


def _dsd_fast_kernel(state0_ref, summed_ref, meta_ref, words_ref, out_ref,
                     stfin_ref, st, bufs, wvmem, dma_sem, *, bins: int,
                     mono: bool, chunk: int, w_total: int, lane_tile: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        st[...] = state0_ref[...]
        cp = pltpu.make_async_copy(
            words_ref.at[:, :, pl.ds(i * lane_tile, lane_tile)], wvmem,
            dma_sem)
        cp.start()
        cp.wait()

    n_groups = w_total // 32
    iota_g = jax.lax.broadcasted_iota(I32, (n_groups, 1, 1), 0)
    iota32 = jax.lax.broadcasted_iota(I32, (32, 1), 0)
    iota_b = jax.lax.broadcasted_iota(I32, (bins, 1, 1), 0)
    max_g = I32(n_groups - 1)
    nbytes = meta_ref[0:1, :]
    nvals = meta_ref[1:2, :]
    tab3 = summed_ref[...].reshape(bins, 256, lane_tile)

    def fetch_group(tgt):
        # chunked select-reduce: bounds the masked temporary to 32 groups
        # (a full (G, 32, tile) where-temp at G >= 128 blows the 16 MB
        # VMEM stack on top of the resident words scratch)
        acc = None
        for g0 in range(0, n_groups, 32):
            blk = _bc_i32(wvmem[g0:g0 + 32])   # slice the ref, not a copy
            m = iota_g[g0:g0 + 32] == tgt[None, :, :]
            part = jnp.sum(jnp.where(m, blk, I32(0)), axis=0, dtype=I32)
            acc = part if acc is None else acc + part
        return acc

    def refresh_cache(bptr):
        widx = bptr >> 2
        eff = jnp.minimum(widx >> 5, max_g)
        nxt = jnp.minimum(eff + 1, max_g)
        bufs[0:32, :] = fetch_group(eff)
        bufs[32:64, :] = fetch_group(nxt)
        bufs[64:65, :] = eff
        bufs[65:66, :] = nxt

    def fetch_word(widx):
        eff = jnp.minimum(widx >> 5, max_g)
        e = jnp.minimum(widx, I32(w_total - 1)) & 31
        sel = iota32 == e
        wc = jnp.sum(jnp.where(sel, bufs[0:32, :], I32(0)), axis=0,
                     keepdims=True, dtype=I32)
        wn = jnp.sum(jnp.where(sel, bufs[32:64, :], I32(0)), axis=0,
                     keepdims=True, dtype=I32)
        return jnp.where(eff == bufs[65:66, :], wn, wc)

    def fetch4_be(bptr):
        """bytes data[bptr..bptr+3] as one big-endian u32 (i32 pattern)."""
        wi = bptr >> 2
        o = (bptr & 3) * 8
        w0 = _bc_u32(fetch_word(wi))
        w1 = _bc_u32(fetch_word(wi + 1))
        lw = (w0 >> _bc_u32(o)) | jnp.where(o == 0, U32(0),
                                            w1 << _bc_u32((32 - o) & 31))
        lwi = _bc_i32(lw)
        return (((lwi & 0xFF) << 24) | ((lwi & 0xFF00) << 8)
                | (_lshr(lwi, 8) & 0xFF00) | (_lshr(lwi, 24) & 0xFF))

    def renorm(high, low, value, bptr, active):
        """Closed-form renormalization (DsdUtils.cs:295-300): the loop
        runs exactly clz(high^low) >> 3 times, clamped by bytes left."""
        lead = _bc_i32(jax.lax.clz(_bc_u32(high ^ low)))
        k = jnp.minimum(lead >> 3, jnp.clip(nbytes - bptr, 0, 4))
        k = jnp.where(active, k, 0)
        w4 = fetch4_be(bptr)
        shu = _bc_u32((k * 8) & 31)
        vmix = _bc_i32((_bc_u32(value) << shu)
                       | (_bc_u32(w4) >> _bc_u32((32 - k * 8) & 31)))
        value = jnp.where(k == 0, value, jnp.where(k == 4, w4, vmix))
        ones = _bc_i32((U32(1) << shu) - U32(1))
        high = jnp.where(k == 4, I32(-1),
                         _bc_i32(_bc_u32(high) << shu) | ones)
        low = jnp.where(k == 4, I32(0), _bc_i32(_bc_u32(low) << shu))
        return high, low, value, bptr + k

    def udiv(n, d):
        """Unsigned n / d on i32 bit patterns, d >= 1. 32-step restoring
        long division; the pre-shift top bit of the remainder forces a
        subtract (conceptual r >= 2^32 > d), keeping everything in u32."""
        r = jnp.zeros_like(n)
        q = jnp.zeros_like(n)
        for b in range(31, -1, -1):
            top = r < 0
            r2 = (r << 1) | (_lshr(n, b) & 1)
            ge = top | ~_ult(r2, d)
            r = jnp.where(ge, r2 - d, r2)
            q = jnp.where(ge, q | (I32(1) << b), q)
        return q

    def body(tt, carry):
        value, low, high, bptr, p0, p1, crc, err = carry

        @pl.when((tt & 7) == 0)
        def _sched_refresh():
            refresh_cache(carry[F_BPTR])

        t = j * chunk + tt
        active = (t < nvals) & (err == 0)

        # per-lane cumulative table of bin p0: one grouped select-reduce
        sel_bin = iota_b == p0[None, :, :]
        sl = jnp.sum(jnp.where(sel_bin, tab3, I32(0)), axis=0, dtype=I32)
        sp255 = sl[255:256, :]
        bad0 = sp255 == 0

        # interval reset (DsdUtils.cs:258-266): mult == 0 iff
        # u32(high - low) < sp255, detected before dividing so the reset
        # path shares the main division (numerator 0xFFFFFFFF)
        d0 = high - low
        need4 = active & _ult(d0, sp255) & ~bad0
        can4 = (nbytes - bptr) >= 4
        w4 = fetch4_be(bptr)
        value = jnp.where(need4 & can4, w4, value)
        bptr = jnp.where(need4 & can4, bptr + 4, bptr)
        low = jnp.where(need4, I32(0), low)
        high = jnp.where(need4, I32(-1), high)
        mult = udiv(jnp.where(need4, I32(-1), d0),
                    jnp.where(bad0, I32(1), sp255))
        index = udiv(value - low, jnp.maximum(mult, 1))
        bad_i = ~_ult(index, sp255)
        bad = bad0 | (~_ult(I32(0), mult)) | bad_i
        idx_s = jnp.where(bad, I32(0), index)

        # rank search on the cumulative table: code, summed[code-1],
        # summed[code] in one sweep (values <= 65280, signed-safe)
        le = sl <= idx_s
        code = jnp.sum(jnp.where(le, I32(1), I32(0)), axis=0,
                       keepdims=True, dtype=I32)
        base = jnp.max(jnp.where(le, sl, I32(0)), axis=0, keepdims=True)
        topv = jnp.min(jnp.where(le, I32(0x7FFFFFFF), sl), axis=0,
                       keepdims=True)

        low2 = low + base * mult
        high2 = low2 + (topv - base) * mult - 1
        crc2 = crc * 3 + code
        if mono:
            p02, p12 = code & (bins - 1), p1
        else:
            p02, p12 = p1, code & (bins - 1)
        upd = active & ~bad
        high3, low3, value3, bptr3 = renorm(high2, low2, value, bptr, upd)

        out_ref[pl.ds(tt, 1), :] = jnp.where(upd, code, 0)
        err = jnp.where(active & bad, I32(1), err)
        return (jnp.where(upd, value3, carry[F_VAL]),
                jnp.where(upd, low3, carry[F_LOW]),
                jnp.where(upd, high3, carry[F_HIGH]),
                jnp.where(upd, bptr3, carry[F_BPTR]),
                jnp.where(upd, p02, carry[F_P0]),
                jnp.where(upd, p12, carry[F_P1]),
                jnp.where(upd, crc2, carry[F_CRC]),
                err)

    carry0 = tuple(st[k:k + 1, :] for k in range(F_NSTATE))
    final = jax.lax.fori_loop(0, chunk, body, carry0)
    for k in range(F_NSTATE):
        st[k:k + 1, :] = final[k]
    stfin_ref[...] = st[...]


@partial(jax.jit, static_argnames=("bins", "mono", "nsteps", "interpret"))
def dsd_fast_decode_pallas(data, nbytes, summed, value0, nvals, *,
                           bins: int, mono: bool, nsteps: int,
                           interpret: bool = False):
    """Pallas DSD fast (mode 1) decode; matches dsd.dsd_fast_decode.

    data (L, NB) int32 byte values; nbytes (L,); summed (L, bins*256)
    int32 cumulative probabilities; value0 (L,) initial coder window
    (i32 bit pattern); nvals (L,) output byte count.
    Returns (out (nsteps, L) int32, err (L,) bool, crc (L,) int32).
    """
    L, NB = data.shape
    # latency-bound like mode 3: widest tile the summed table allows
    # (bins*256 rows x tile x 4B; bins <= 8 fits 512 lanes comfortably)
    lane_tile = 512 if bins <= 8 else 128
    lane_tile = min(lane_tile, max(128, 1 << max(L - 1, 1).bit_length()))
    Lp = ((L + lane_tile - 1) // lane_tile) * lane_tile
    chunk = min(nsteps, 256)
    T = ((nsteps + chunk - 1) // chunk) * chunk

    NBp = ((NB + 127) // 128) * 128
    b = jnp.pad(data.astype(jnp.uint32), ((0, Lp - L), (0, NBp - NB)))
    b4 = b.reshape(Lp, NBp // 4, 4)
    words = (b4[:, :, 0] | (b4[:, :, 1] << 8) | (b4[:, :, 2] << 16)
             | (b4[:, :, 3] << 24))
    words_t = words.T.reshape(NBp // 128, 32, Lp)

    state0 = jnp.zeros((F_NSTATE, Lp), I32)
    state0 = state0.at[F_VAL, :L].set(value0.astype(I32))
    state0 = state0.at[F_HIGH, :].set(I32(-1))
    state0 = state0.at[F_CRC, :].set(I32(-1))
    summed_t = jnp.zeros((bins * 256, Lp), I32).at[:, :L].set(
        summed.astype(I32).T)
    meta = jnp.zeros((2, Lp), I32)
    meta = meta.at[0, :L].set(nbytes.astype(I32))
    meta = meta.at[1, :L].set(nvals.astype(I32))

    grid = (Lp // lane_tile, T // chunk)
    kernel = partial(_dsd_fast_kernel, bins=bins, mono=mono, chunk=chunk,
                     w_total=NBp // 4, lane_tile=lane_tile)
    out_shape = [jax.ShapeDtypeStruct((T, Lp), I32),
                 jax.ShapeDtypeStruct((F_NSTATE, Lp), I32)]
    with jax.enable_x64(False):
        out, stfin = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((F_NSTATE, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bins * 256, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec((chunk, lane_tile), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F_NSTATE, lane_tile), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((F_NSTATE, lane_tile), I32),
                pltpu.VMEM((66, lane_tile), I32),
                pltpu.VMEM((NBp // 128, 32, lane_tile), jnp.uint32),
                pltpu.SemaphoreType.DMA(())],
            out_shape=out_shape,
            interpret=interpret,
        )(state0, summed_t, meta, words_t)

    err = stfin[F_ERR, :L] != 0
    crc = stfin[F_CRC, :L]
    return out[:nsteps, :L], err, crc
