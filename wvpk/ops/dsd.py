"""Lane-parallel DSD decode kernels (hot loop 3 on device).

Mode 0 (raw): byte copy + CRC prefix scan (DsdUtils.cs:73-82).
Mode 1 (fast): byte-wise range decoder over per-history-bin probability
tables (DsdUtils.cs:244-304) — one scan step per output byte, tables staged
per lane, renormalization as a masked 4-iteration unroll.
Mode 3 (high): binary arithmetic coder with adaptive ptable + 6-stage
leaky-integrator filter bank (DsdUtils.cs:391-493) — one scan step per
output sample (8 bits x channels inline); the adaptive ptable update uses a
256-wide one-hot select instead of scatter to stay compile-friendly.

All coder arithmetic is C# uint wrap semantics held in int64.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

I64 = jnp.int64
M32 = 0xFFFFFFFF

PTABLE_MASK = 255
UP = 0x010000FE
DOWN = 0x00010000
DECAY = 8
PRECISION = 20
VALUE_ONE = 1 << PRECISION
PRECISION_USE = 12


def _u32(x):
    return x & M32


def _wrap32s(x):
    return ((x + 0x80000000) & M32) - 0x80000000


@jax.jit
def dsd_raw_crc(data, nvalid):
    """Mode 0: CRC over the raw byte payload. data (L, N) int32 bytes;
    nvalid (L,). Returns crc (L,) int32 (init -1, crc' = 3*crc + b)."""
    L, N = data.shape
    tidx = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = tidx < nvalid[:, None]
    a = jnp.where(valid, jnp.uint32(3), jnp.uint32(1))
    b = jnp.where(valid, data.astype(jnp.uint32), jnp.uint32(0))

    def compose(x, y):
        return (y[0] * x[0], y[0] * x[1] + y[1])

    A, B = jax.lax.associative_scan(compose, (a, b), axis=1)
    crc = A[:, -1] * jnp.uint32(0xFFFFFFFF) + B[:, -1]
    return _wrap32s(crc.astype(I64)).astype(jnp.int32)


def _renorm(high, low, value, byteptr, data, nbytes):
    """Masked 4x unroll of the byte renormalization loop
    (DsdUtils.cs:295-300)."""
    for _ in range(4):
        go = (((high ^ low) & 0xFF000000) == 0) & (byteptr < nbytes)
        nxt = jnp.take_along_axis(data, jnp.clip(byteptr, 0, data.shape[1] - 1)
                                  [:, None].astype(jnp.int32), axis=1)[:, 0]
        value = jnp.where(go, _u32((value << 8) | nxt.astype(I64)), value)
        high = jnp.where(go, _u32((high << 8) | 0xFF), high)
        low = jnp.where(go, _u32(low << 8), low)
        byteptr = jnp.where(go, byteptr + 1, byteptr)
    return high, low, value, byteptr


@partial(jax.jit, static_argnames=("mono", "nsteps"))
def dsd_fast_decode(data, nbytes, summed, probs, vlook, lookup, value0,
                    bins, nvals, *, mono: bool, nsteps: int):
    """Mode 1 range decoder.

    data: (L, NB) int32 coded bytes (after host table init); nbytes (L,);
    summed/probs: (L, BMAX*256) int32; vlook: (L, BMAX) int32 offsets;
    lookup: (L, LK) int32; value0 (L,) initial 32-bit window; bins (L,);
    nvals (L,) output byte count (samples * channels).
    Returns (out (nsteps, L) int32, err (L,) bool, crc (L,) int32).
    """
    L = data.shape[0]

    def step(carry, t):
        value, low, high, p0, p1, byteptr, crc, err = carry
        active = (t < nvals) & ~err
        sp_base = p0 * 256
        sp255 = jnp.take_along_axis(summed, (sp_base + 255)[:, None], axis=1)[:, 0].astype(I64)
        bad0 = sp255 == 0
        sp255s = jnp.maximum(sp255, 1)
        mult = _u32(high - low) // sp255s
        # mult == 0: pull 4 fresh bytes and reset the interval
        need4 = active & (mult == 0)
        can4 = (nbytes - byteptr) >= 4
        v4 = value
        bp4 = byteptr
        for _ in range(4):
            nxt = jnp.take_along_axis(data, jnp.clip(bp4, 0, data.shape[1] - 1)
                                      [:, None].astype(jnp.int32), axis=1)[:, 0]
            v4n = _u32((v4 << 8) | nxt.astype(I64))
            v4 = jnp.where(need4 & can4, v4n, v4)
            bp4 = jnp.where(need4 & can4, bp4 + 1, bp4)
        value = jnp.where(need4, v4, value)
        byteptr = jnp.where(need4, bp4, byteptr)
        low = jnp.where(need4, 0, low)
        high = jnp.where(need4, M32, high)
        mult = jnp.where(need4, M32 // sp255s, mult)
        bad_m = mult == 0

        index = _u32(value - low) // jnp.maximum(mult, 1)
        bad_i = index >= sp255
        index_c = jnp.minimum(index, sp255s - 1)
        code = jnp.take_along_axis(
            lookup, jnp.clip(jnp.take_along_axis(vlook, p0[:, None], axis=1)[:, 0]
                             + index_c, 0, lookup.shape[1] - 1)[:, None].astype(jnp.int32),
            axis=1)[:, 0].astype(I64)
        sp_code_m1 = jnp.take_along_axis(
            summed, (sp_base + jnp.maximum(code, 1) - 1)[:, None].astype(jnp.int32),
            axis=1)[:, 0].astype(I64)
        low = jnp.where(code > 0, _u32(low + sp_code_m1 * mult), low)
        pr = jnp.take_along_axis(probs, (sp_base + code)[:, None].astype(jnp.int32),
                                 axis=1)[:, 0].astype(I64)
        high = _u32(low + pr * mult - 1)
        crc_new = _wrap32s(crc * 3 + code)
        if mono:
            p0n, p1n = (code & (bins - 1)).astype(jnp.int32), p1
        else:
            p0n, p1n = p1, (code & (bins - 1)).astype(jnp.int32)
        high, low, value, byteptr = _renorm(high, low, value, byteptr,
                                            data, nbytes)
        errn = err | (active & (bad0 | bad_m | bad_i))
        upd = active & ~errn
        out = jnp.where(upd, code, 0).astype(jnp.int32)
        return ((jnp.where(upd, value, carry[0]), jnp.where(upd, low, carry[1]),
                 jnp.where(upd, high, carry[2]), jnp.where(upd, p0n, p0),
                 jnp.where(upd, p1n, p1), jnp.where(upd, byteptr, carry[5]),
                 jnp.where(upd, crc_new, crc), errn), out)

    carry0 = (value0.astype(I64), jnp.zeros((L,), I64),
              jnp.full((L,), M32, I64), jnp.zeros((L,), jnp.int32),
              jnp.zeros((L,), jnp.int32), jnp.zeros((L,), I64),
              jnp.full((L,), -1, I64), jnp.zeros((L,), bool))
    carry, outs = jax.lax.scan(step, carry0,
                               jnp.arange(nsteps, dtype=jnp.int32))
    return outs, carry[7], carry[6].astype(jnp.int32)


@partial(jax.jit, static_argnames=("mono", "nsteps"))
def dsd_high_decode(data, nbytes, ptable0, filters0, value0, nsamples,
                    *, mono: bool, nsteps: int):
    """Mode 3 arithmetic decoder + filter bank.

    data: (L, NB) int32; ptable0: (L, 256) int32; filters0: (L, 2, 8) int32
    (f1..f5, f6, factor slots per blockstate); value0 (L,); nsamples (L,).
    Returns (out (nsteps, L, C) int32, crc (L,) int32).
    """
    L = data.shape[0]
    C = 1 if mono else 2
    iota256 = jnp.arange(256, dtype=jnp.int32)[None, :]

    def one_bit(state, ch_f):
        value, low, high, ptable, byteptr = state
        f1, f2, f3, f4, f5, f6, factor, val, bytei = ch_f
        pp = ((val >> (PRECISION - PRECISION_USE)) & PTABLE_MASK).astype(jnp.int32)
        pt_pp = jnp.take_along_axis(ptable, pp[:, None], axis=1)[:, 0].astype(I64)
        split = _u32(low + (_u32(high - low) >> 8) * (_u32(pt_pp) >> 16))
        bit1 = value <= split
        high = jnp.where(bit1, split, high)
        low = jnp.where(bit1, low, _u32(split + 1))
        pt_new = jnp.where(bit1, pt_pp + ((UP - pt_pp) >> DECAY),
                           pt_pp + ((DOWN - pt_pp) >> DECAY))
        pt_new = _wrap32s(pt_new)
        onehot = iota256 == pp[:, None]
        ptable = jnp.where(onehot, pt_new[:, None].astype(jnp.int32), ptable)
        f0 = jnp.where(bit1, jnp.int64(-1), jnp.int64(0))
        high, low, value, byteptr = _renorm(high, low, value, byteptr,
                                            data, nbytes)
        val = _wrap32s(val + _wrap32s(f6 * 8))
        bytei = _wrap32s((bytei << 1) | (f0 & 1))
        factor = _wrap32s(factor + ((((val ^ f0) >> 31) | 1)
                                    & ((val ^ _wrap32s(val - _wrap32s(f6 * 16))) >> 31)))
        f1 = _wrap32s(f1 + (((f0 & VALUE_ONE) - f1) >> 6))
        f2 = _wrap32s(f2 + (((f0 & VALUE_ONE) - f2) >> 4))
        f3 = _wrap32s(f3 + ((f2 - f3) >> 4))
        f4 = _wrap32s(f4 + ((f3 - f4) >> 4))
        val = (f4 - f5) >> 4
        f5 = _wrap32s(f5 + val)
        f6 = _wrap32s(f6 + ((val - f6) >> 3))
        val = _wrap32s(f1 - f5 + (_wrap32s(f6 * factor) >> 2))
        return ((value, low, high, ptable, byteptr),
                (f1, f2, f3, f4, f5, f6, factor, val, bytei))

    def step(carry, t):
        value, low, high, ptable, byteptr, chans, crc = carry
        active = t < nsamples
        # per-sample predictor seed (DsdUtils.cs:401-404)
        chans = list(chans)
        for c in range(C):
            f1, f2, f3, f4, f5, f6, factor, val, bytei = chans[c]
            val = _wrap32s(f1 - f5 + (_wrap32s(f6 * factor) >> 2))
            chans[c] = (f1, f2, f3, f4, f5, f6, factor, val, jnp.zeros_like(bytei))
        state = (value, low, high, ptable, byteptr)

        # scan over the 8 bits (unrolling 8 x C bit-units makes the XLA
        # graph explode; cf. the decorr pass-scan note)
        def bit_step(s, _):
            st, ch = s
            ch = list(ch)
            for c in range(C):
                st, ch[c] = one_bit(st, ch[c])
            return (st, tuple(ch)), 0

        (state, chans), _ = jax.lax.scan(
            bit_step, (state, tuple(chans)), jnp.arange(8), unroll=1)
        chans = list(chans)
        value, low, high, ptable, byteptr = state
        outs = []
        for c in range(C):
            f1, f2, f3, f4, f5, f6, factor, val, bytei = chans[c]
            code = bytei & 0xFF
            crc = jnp.where(active, _wrap32s(crc * 3 + code), crc)
            factor = _wrap32s(factor - ((factor + 512) >> 10))
            chans[c] = (f1, f2, f3, f4, f5, f6, factor, val, bytei)
            outs.append(jnp.where(active, code, 0).astype(jnp.int32))
        # freeze state on inactive steps
        return ((value, low, high, ptable, byteptr, tuple(chans), crc),
                jnp.stack(outs, axis=1))

    def ch_init(c):
        f = filters0[:, c, :].astype(I64)
        val = _wrap32s(f[:, 0] - f[:, 4] + (_wrap32s(f[:, 5] * f[:, 6]) >> 2))
        return (f[:, 0], f[:, 1], f[:, 2], f[:, 3], f[:, 4], f[:, 5],
                f[:, 6], val, jnp.zeros((L,), I64))

    carry0 = (value0.astype(I64), jnp.zeros((L,), I64),
              jnp.full((L,), M32, I64), ptable0.astype(jnp.int32),
              jnp.zeros((L,), I64), tuple(ch_init(c) for c in range(C)),
              jnp.full((L,), -1, I64))
    carry, outs = jax.lax.scan(step, carry0,
                               jnp.arange(nsteps, dtype=jnp.int32))
    return outs, carry[6].astype(jnp.int32)
