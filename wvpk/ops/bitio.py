"""Vectorized bitstream primitives for lane-parallel entropy decode.

The staged layout replaces the reference's byte-refill shift register
(BitsUtils.cs:15-68): each lane's payload is packed into little-endian
uint32 words padded with 0xFFFFFFFF (the EOF fill, BitsUtils.cs:123-140),
pre-combined into overlapping uint64 windows so one gather yields >= 33
valid bits at any bit position.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import EXP2_NP, LOG2_NP

EXTRA_PAD_WORDS = 8  # room for bounded post-EOF overreads


def _quantize_words(nwords: int) -> int:
    """Round the staged word capacity up to a coarse grid (>= 1/16
    granularity, min 32 words): the capacity is a compile-time shape for
    every downstream kernel, and content-driven per-batch W values would
    otherwise trigger a fresh (remote, tens-of-seconds) compile per
    decode batch on a long streaming file. Worst-case padding 6.25%, all
    padded bytes are the 0xff EOF fill the bitstream contract expects."""
    gran = 32
    while gran * 16 < nwords:
        gran *= 2
    return ((nwords + gran - 1) // gran) * gran


def pack_streams(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack per-lane byte payloads into a (L, W) uint32 array (LSB-first
    bit order within word) padded with the 0xff EOF fill. Returns (words,
    nbits). Uses the native C stager (wvpk/native) when available."""
    nbytes = max((len(p) for p in payloads), default=0)
    nwords = _quantize_words((nbytes + 3) // 4 + EXTRA_PAD_WORDS)
    out = None
    try:
        from ..native import pack_streams_native
        out = pack_streams_native(payloads, nwords * 4)
    except Exception:
        out = None
    if out is None:
        out = np.full((len(payloads), nwords * 4), 0xFF, np.uint8)
        for i, p in enumerate(payloads):
            out[i, :len(p)] = np.frombuffer(p, np.uint8)
    words = out.view("<u4")
    nbits = np.asarray([len(p) * 8 for p in payloads], np.int32)
    return np.ascontiguousarray(words), nbits


def make_windows(words: jnp.ndarray) -> jnp.ndarray:
    """(L, W) uint32 -> (L, W) uint64 overlapping windows
    win[i] = w[i] | w[i+1] << 32 (last window pads with the EOF fill)."""
    w64 = words.astype(jnp.uint64)
    nxt = jnp.concatenate(
        [w64[:, 1:], jnp.full((w64.shape[0], 1), 0xFFFFFFFF, jnp.uint64)], axis=1)
    return w64 | (nxt << np.uint64(32))


def peek(windows: jnp.ndarray, bitpos: jnp.ndarray) -> jnp.ndarray:
    """>= 33 low bits of the stream starting at bitpos, per lane (uint64)."""
    max_bit = np.int64((windows.shape[1] - 1) * 32)
    bp = jnp.minimum(bitpos.astype(jnp.int64), max_bit)
    idx = (bp >> 5).astype(jnp.int32)
    w = jnp.take_along_axis(windows, idx[:, None], axis=1)[:, 0]
    return w >> (bp & 31).astype(jnp.uint64)


def trailing_ones(win: jnp.ndarray) -> jnp.ndarray:
    """Count of consecutive low 1-bits of a uint64 window (int32; 64 if all
    ones)."""
    y = ~win
    lsb = y & (jnp.uint64(0) - y)
    ctz = jax.lax.population_count(lsb - jnp.uint64(1))
    return jnp.where(y == 0, jnp.uint64(64), ctz).astype(jnp.int32)


def bits_of(win: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Low n (<= 63, per-lane) bits of the window as int64."""
    n64 = jnp.clip(n, 0, 63).astype(jnp.uint64)
    mask = (jnp.uint64(1) << n64) - jnp.uint64(1)
    return (win & mask).astype(jnp.int64)


# --- vectorized format primitives (tables.py semantics, lane-parallel) -----

_LOG2_DEV = jnp.asarray(LOG2_NP, jnp.int32)
_EXP2_DEV = jnp.asarray(EXP2_NP, jnp.int32)


def wrap32(x: jnp.ndarray) -> jnp.ndarray:
    """Truncate int64 to C# int32 wrap semantics, kept in int64."""
    return ((x + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def bit_length64(x: jnp.ndarray) -> jnp.ndarray:
    """bit_length of a non-negative int64 (== count_bits, WordsUtils.cs:513)."""
    return (64 - jax.lax.clz(x.astype(jnp.uint64)).astype(jnp.int64))


def mylog2_v(av: jnp.ndarray) -> jnp.ndarray:
    """Vectorized mylog2 (WordsUtils.cs:588-608); av int64 >= 0."""
    av = av + (av >> 9)
    dbits = jnp.where(av > 0, bit_length64(av), 0)
    sh = dbits - 9
    idx = jnp.where(sh >= 0, av >> jnp.maximum(sh, 0),
                    av << jnp.maximum(-sh, 0)) & 0xFF
    return (dbits << 8) + _LOG2_DEV[idx].astype(jnp.int64)


def exp2s_v(log: jnp.ndarray) -> jnp.ndarray:
    """Vectorized exp2s (WordsUtils.cs:633-646); int64 in/out with int32
    wrap on the left-shift branch."""
    neg = log < 0
    a = jnp.abs(log)
    v = (_EXP2_DEV[a & 0xFF] | 0x100).astype(jnp.int64)
    sh = a >> 8
    r = jnp.where(sh <= 9, v >> jnp.clip(9 - sh, 0, 63),
                  wrap32(v << jnp.clip(sh - 9, 0, 63)))
    return jnp.where(neg, -r, r)
