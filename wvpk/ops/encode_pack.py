"""Device-side segment packing for the encode pipeline.

The encode word scan (ops/encode_kernels.py::words_any) emits per-step
variable-length bit segments: segment A (flush unary / escape gamma /
run gamma + pended payload, <= 128 bits as lo/hi uint64 halves) and
segment B (immediate payload, <= 64 bits), with per-(step, lane) bit
lengths. Fetching those sparse descriptors to pack on host moves ~16
bytes per coded value over the host link to deliver ~1-3 payload bits —
the transfer, not the scan, then dominates end-to-end device encode
(measured 95% of wall time through wvpk.trace).

This module concatenates the segments into dense per-lane LSB-first
bitstreams ON DEVICE, so only the compressed payload (plus one tiny
(L,) length vector) crosses the link. The algorithm is XLA-native:

1. exclusive cumsum of segment lengths along the step axis gives every
   segment's absolute output bit offset per lane (lanes independent);
2. each segment's value, shifted by (offset & 31), contributes to at
   most 5 (segment A, 128+31 bits) or 3 (segment B) consecutive 32-bit
   output words starting at word (offset >> 5);
3. one scatter-ADD per word slot accumulates all contributions. Every
   output bit is written by exactly one segment (the lengths partition
   the stream), so ADD == OR with no carries. Offsets are monotone in
   the step index, so the lane-major flattened scatter indices are
   sorted — the efficient XLA lowering (indices_are_sorted=True).
   Masked/overhanging word slots carry value 0 (segment values are zero
   above their bit length), so index clamping (mode="clip") is a no-op
   add rather than a correctness hazard, and sortedness is preserved.

The host side then trims each lane to its bit length and appends the
<=~150-bit BitWriter tail flush (EntropyEncoder.finish semantics) —
byte-identical to the host packers (pack_segments / the C
wvpk_pack_lanes_all), which remain the oracle in tests.

Reference: the bit stream being packed is the reference decoder's input
(BitsUtils.cs:15-68 read side); packing order matches the scalar
encoder's BitWriter emission exactly.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.cache
def _packer(nw_cap: int):
    import jax
    import jax.numpy as jnp

    U64 = jnp.uint64

    @jax.jit
    def pack(sa_lo, sa_hi, sa_len, sb_bits, sb_len):
        W, L = sa_len.shape
        la = sa_len.astype(jnp.int64)
        lb = sb_len.astype(jnp.int64)
        lens = la + lb
        end = jnp.cumsum(lens, axis=0)
        off_a = end - lens                 # segment A start, per lane
        off_b = off_a + la                 # segment B follows A
        total_bits = end[-1]

        out = jnp.zeros(L * nw_cap, jnp.uint32)
        lane_base = (jnp.arange(L, dtype=jnp.int64) * nw_cap)[None, :]

        def slots(lo, hi, ln, off, nwords):
            """(index, value) word contributions for one segment family."""
            s = (off & 31).astype(U64)
            w0 = lane_base + (off >> 5)
            m = ln > 0
            lo = jnp.where(m, lo, U64(0))   # zero-len values may be junk
            hi = jnp.where(m, hi, U64(0))
            pieces = [lo & U64(0xFFFFFFFF), lo >> U64(32)]
            if nwords > 3:
                pieces += [hi & U64(0xFFFFFFFF), hi >> U64(32)]
            t = [p << s for p in pieces]    # < 2^63, no overflow
            for k in range(nwords):
                v = U64(0)
                if k < len(t):
                    v = t[k] & U64(0xFFFFFFFF)
                if 1 <= k and k - 1 < len(t):
                    v = v | (t[k - 1] >> U64(32))
                yield w0 + k, v.astype(jnp.uint32)

        for lo, hi, ln, off, nw in (
                (sa_lo, sa_hi, sa_len, off_a, 5),
                (sb_bits, jnp.zeros_like(sb_bits), sb_len, off_b, 3)):
            for idx, val in slots(lo, hi, ln, off, nw):
                # (W, L) -> (L, W) flatten: sorted lane-major indices
                out = out.at[idx.T.reshape(-1)].add(
                    val.T.reshape(-1), indices_are_sorted=True,
                    mode="clip")
        return out.reshape(L, nw_cap), total_bits

    return pack


def pack_segments_words(sa_lo, sa_hi, sa_len, sb_bits, sb_len, *,
                        nw_cap: int):
    """Pack (W, L) bit segments into (L, nw_cap) uint32 payload words on
    device (little-endian bit order: word w holds stream bits
    [32w, 32w+32), LSB first). Returns (words, total_bits (L,) int64).
    nw_cap*32 must be >= every lane's total_bits (see segment_total_bits);
    words beyond a lane's total are zero."""
    return _packer(nw_cap)(sa_lo, sa_hi, sa_len, sb_bits, sb_len)


def segment_total_bits(sa_len, sb_len):
    """Device reduce: per-lane payload bit totals (L,) int64."""
    import jax.numpy as jnp

    return (jnp.sum(sa_len.astype(jnp.int64), axis=0)
            + jnp.sum(sb_len.astype(jnp.int64), axis=0))


CRC_INV3 = pow(3, -1, 1 << 32)   # 3 is odd => invertible mod 2^32


def hybrid_crc_acc(recon, nvals, *, joint: bool, mono: bool):
    """Device half of the hybrid-encode CRC stamp.

    The block CRC is the affine recurrence crc = crc*3 + x over the
    decoder-visible final values (UnpackUtils.cs:577,626) — for hybrid
    blocks those are the scan's lossy reconstruction, joint-stereo
    UNDONE, interleaved (time, ch). Closed form:
    crc_M = 3^M*crc0 + sum_j 3^(M-1-j) x_j = 3^M*crc0 + 3^(M-1)*acc
    with acc = sum_j 3^(-j) x_j — and acc is the only data-sized part,
    so it reduces on device (uint32 wraparound == mod 2^32) and the
    host finishes with two pow()s per lane instead of fetching the
    whole (T, L, C) reconstruction. 3^(-1) mod 2^32 is exact (3 is
    odd), so this equals testgen.encoder._crc_fast bit-for-bit.

    recon: (T, L, C) device ints; nvals: (L,) valid interleaved counts.
    Returns (L,) uint32 acc (junk where nvals == 0; callers special-case
    empty blocks to crc0 like _crc_fast does).
    """
    import jax.numpy as jnp

    from .bitio import wrap32

    T, L, C = recon.shape
    v = recon.astype(jnp.int64)
    if joint and not mono:
        r = wrap32(v[:, :, 1] - (v[:, :, 0] >> 1))
        left = wrap32(r + v[:, :, 0])
        v = jnp.stack([left, r], axis=2)
    vals = (v.transpose(0, 2, 1).reshape(T * C, L)
            & 0xFFFFFFFF).astype(jnp.uint32)
    q = jnp.full(T * C, CRC_INV3, jnp.uint32).at[0].set(1)
    q = jnp.cumprod(q)                       # 3^(-j) mod 2^32
    mask = (jnp.arange(T * C, dtype=jnp.int64)[:, None]
            < nvals.astype(jnp.int64)[None, :])
    return jnp.sum(jnp.where(mask, vals * q[:, None], jnp.uint32(0)),
                   axis=0, dtype=jnp.uint32)


def finish_crc(acc: int, m: int, crc0: int = 0xFFFFFFFF) -> int:
    """Host half: crc = 3^m*crc0 + 3^(m-1)*acc mod 2^32 (m = value
    count; m == 0 degenerates to crc0)."""
    if m == 0:
        return crc0
    return (pow(3, m, 1 << 32) * crc0
            + pow(3, m - 1, 1 << 32) * int(acc)) & 0xFFFFFFFF


def _append_tail(buf: bytes, nbits: int, tail: bytes,
                 tail_bits: int) -> bytes:
    """Append tail_bits (LSB-first, from `tail`) at bit offset nbits of
    the trimmed segment payload `buf` ((nbits+7)//8 bytes)."""
    if tail_bits == 0:
        return buf
    t = int.from_bytes(tail, "little") & ((1 << tail_bits) - 1)
    sh = nbits & 7
    out_len = (nbits + tail_bits + 7) // 8
    if sh == 0:
        return buf + t.to_bytes(out_len - len(buf), "little")
    head, last = buf[:-1], buf[-1]
    merged = last | (t << sh)
    return head + merged.to_bytes(out_len - len(head), "little")


NW_BUCKET = 512   # word-cap rounding (compile-cache granularity)


def pack_segments_device(segs, tails, total=None) -> list[bytes]:
    """Pack the word scan's device-resident segment arrays into per-lane
    payload byte strings, fetching only (L,) totals + the dense payload.

    `segs` = (sa_lo, sa_hi, sa_len, sb_bits, sb_len) device arrays;
    `tails` = [(tail_bytes, tail_bits)] per lane (the host BitWriter
    final flush); `total` = precomputed np per-lane bit totals (callers
    that already fetched segment_total_bits in a batched transfer pass
    it to skip this function's own small fetch). Byte-identical to
    pack_segments on the same inputs.
    """
    sa_lo, sa_hi, sa_len, sb_bits, sb_len = segs
    W, L = sa_len.shape
    if L == 0 or W == 0:
        from ..engine.device_encoder import pack_segments
        return pack_segments(*(np.asarray(x) for x in segs), tails)
    if total is None:
        total = np.asarray(segment_total_bits(sa_len, sb_len))
    # +1 word: a segment starting in the last word can overhang into the
    # next slot with zero bits (clipped adds of zero need the headroom
    # only conceptually; the fetch cap still must cover ceil(total/32))
    max_words = int(total.max() + 31) // 32 + 1
    nw_cap = -(-max_words // NW_BUCKET) * NW_BUCKET
    words, _tb = pack_segments_words(sa_lo, sa_hi, sa_len, sb_bits,
                                     sb_len, nw_cap=nw_cap)
    wnp = np.ascontiguousarray(np.asarray(words))
    out = []
    for i in range(L):
        nb = int(total[i])
        buf = wnp[i].tobytes()[:(nb + 7) // 8]
        tb, tn = tails[i]
        out.append(_append_tail(buf, nb, bytes(tb), tn))
    return out
