"""Device-encoder payload packing: native C vs numpy vs bit reference.

pack_segments concatenates per-step variable-length bit segments
(segment A up to 128 bits, segment B up to ~64, plus a per-lane tail
flush) into LSB-first byte payloads. Two implementations exist — the
ctypes C fast path (wvpk_encode.c::wvpk_pack_lane) and the vectorized
numpy bincount-scatter fallback — and both must agree bit-for-bit with
a trivial per-bit reference.
"""

import numpy as np
import pytest

import wvpk.native as native
from wvpk.engine.device_encoder import pack_segments


def _ref_pack(seg_lo, seg_hi, seg_len, segb_bits, segb_len, tails):
    """Per-bit reference: append segment A then B per step, then tail."""
    W, L = seg_len.shape
    out = []
    for lane in range(L):
        bits = []
        for w in range(W):
            la = int(seg_len[w, lane])
            v = (int(seg_hi[w, lane]) << 64) | int(seg_lo[w, lane])
            bits.extend((v >> k) & 1 for k in range(la))
            lb = int(segb_len[w, lane])
            vb = int(segb_bits[w, lane])
            bits.extend((vb >> k) & 1 for k in range(lb))
        tb, tn = tails[lane]
        bits.extend((tb[k >> 3] >> (k & 7)) & 1 for k in range(tn))
        buf = bytearray((len(bits) + 7) // 8)
        for i, b in enumerate(bits):
            buf[i >> 3] |= b << (i & 7)
        out.append(bytes(buf))
    return out


def _random_case(rng, W, L):
    seg_len = rng.integers(0, 129, (W, L)).astype(np.int32)
    # bias in some zero-length steps and some exactly-64/128 edges
    seg_len[rng.random((W, L)) < 0.3] = 0
    seg_len[rng.random((W, L)) < 0.05] = 64
    seg_len[rng.random((W, L)) < 0.05] = 128
    full = rng.integers(0, 1 << 63, (W, L), dtype=np.int64).astype(np.uint64)
    full |= full << np.uint64(1)  # densify high bits a little
    lo = np.where(seg_len >= 64, full,
                  full & ((np.uint64(1) << seg_len.astype(np.uint64))
                          - np.uint64(1)))
    hi_len = np.maximum(seg_len - 64, 0).astype(np.uint64)
    hi = rng.integers(0, 1 << 63, (W, L), dtype=np.int64).astype(np.uint64)
    hi = np.where(hi_len > 0,
                  hi & ((np.uint64(1) << hi_len) - np.uint64(1)),
                  np.uint64(0))
    segb_len = rng.integers(0, 64, (W, L)).astype(np.int32)
    segb_len[rng.random((W, L)) < 0.4] = 0
    sb = rng.integers(0, 1 << 63, (W, L), dtype=np.int64).astype(np.uint64)
    segb_bits = np.where(
        segb_len > 0,
        sb & ((np.uint64(1) << segb_len.astype(np.uint64)) - np.uint64(1)),
        np.uint64(0))
    tails = []
    for _ in range(L):
        tn = int(rng.integers(0, 80))
        tb = bytes(rng.integers(0, 256, (tn + 7) // 8, dtype=np.int64)
                   .astype(np.uint8).tobytes())
        tails.append((tb, tn))
    return lo, hi, seg_len, segb_bits, segb_len, tails


@pytest.mark.parametrize("seed,W,L", [(0, 37, 5), (1, 128, 9), (2, 3, 1)])
def test_numpy_fallback_matches_reference(monkeypatch, seed, W, L):
    monkeypatch.setattr(native, "pack_lanes_native",
                        lambda *a, **k: None)
    rng = np.random.default_rng(seed)
    case = _random_case(rng, W, L)
    assert pack_segments(*case) == _ref_pack(*case)


@pytest.mark.parametrize("seed,W,L", [(3, 37, 5), (4, 128, 9), (5, 3, 1)])
def test_native_matches_reference(seed, W, L):
    if native.get_encode_lib() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(seed)
    case = _random_case(rng, W, L)
    assert pack_segments(*case) == _ref_pack(*case)


@pytest.mark.parametrize("seed,W,L", [(6, 23, 33), (7, 9, 70)])
def test_batched_all_crosses_lane_tiles(seed, W, L):
    """The one-call batched packer (wvpk_pack_lanes_all) walks lanes in
    tiles of 32; L=33/70 exercise the partial last tile, and the result
    must match both the per-bit reference and the per-lane C path."""
    lib = native.get_encode_lib()
    if lib is None or not hasattr(lib, "wvpk_pack_lanes_all"):
        pytest.skip("no C toolchain / stale cached .so")
    rng = np.random.default_rng(seed)
    case = _random_case(rng, W, L)
    got = native._pack_lanes_all(lib, *case)
    assert got == _ref_pack(*case)


@pytest.mark.parametrize("seed,W,L", [(8, 37, 5), (9, 200, 33), (10, 3, 1)])
def test_device_packer_matches_reference(seed, W, L):
    """ops/encode_pack.py packs segments ON DEVICE (scatter-add of
    shifted word contributions); must be byte-identical to the per-bit
    reference, including zero-length steps, 64/128-bit edges, and the
    host-appended tail flush at arbitrary bit offsets."""
    import jax.numpy as jnp

    from wvpk.ops.encode_pack import pack_segments_device
    rng = np.random.default_rng(seed)
    lo, hi, ln, sb, sbl, tails = _random_case(rng, W, L)
    segs = (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(ln),
            jnp.asarray(sb), jnp.asarray(sbl))
    got = pack_segments_device(segs, tails)
    assert got == _ref_pack(lo, hi, ln, sb, sbl, tails)


def test_device_packer_junk_values_at_zero_len():
    """Zero-length segments may carry junk value bits (the scan's where
    masks normally zero them; the packer must not rely on it)."""
    import jax.numpy as jnp

    from wvpk.ops.encode_pack import pack_segments_device
    W, L = 6, 4
    ln = np.zeros((W, L), np.int32)
    ln[0, :] = 5
    lo = np.full((W, L), 0xDEADBEEFDEADBEEF, np.uint64)
    lo[0, :] = 0x15                      # 5 valid bits
    hi = np.full((W, L), 0xFFFFFFFFFFFFFFFF, np.uint64)
    hi[0, :] = 0
    sbl = np.zeros((W, L), np.int32)
    sb = np.full((W, L), 0xABCDABCDABCDABCD, np.uint64)
    tails = [(b"", 0)] * L
    segs = tuple(jnp.asarray(x) for x in (lo, hi, ln, sb, sbl))
    got = pack_segments_device(segs, tails)
    lo2, hi2, sb2 = lo.copy(), hi.copy(), sb.copy()
    lo2[1:] = 0
    hi2[1:] = 0
    sb2[:] = 0
    assert got == _ref_pack(lo2, hi2, ln, sb2, sbl, tails)


def test_empty_and_tail_only():
    W, L = 4, 3
    z32 = np.zeros((W, L), np.int32)
    zu = np.zeros((W, L), np.uint64)
    tails = [(b"", 0), (bytes([0b101]), 3), (bytes([0xFF, 0x01]), 9)]
    got = pack_segments(zu, zu, z32, zu, z32, tails)
    assert got == [b"", bytes([0b101]), bytes([0xFF, 0x01])]
