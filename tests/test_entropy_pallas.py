"""Pallas entropy kernel (interpret mode on CPU) vs the XLA kernel."""

import numpy as np
import pytest

from wvpk import config
from wvpk.container import parse_blocks
from wvpk.engine.staging import group_blocks
from wvpk.ops.entropy import entropy_decode
from wvpk.ops.entropy_pallas import entropy_decode_pallas
from wvpk.testgen import EncodeSpec, encode_file


def check(data: bytes, mono: bool):
    b = group_blocks([bb.state for bb in parse_blocks(data)])[0]
    prof = b.profile
    ref, broke_r, ndec_r = entropy_decode(
        b.words, b.nwords_lane, b.med, b.slow, b.acc, b.delta,
        mono=mono, hybrid=False, hybrid_bitrate=False,
        hybrid_balance=False, nsteps=prof.nsteps)
    res, broke, ndec = entropy_decode_pallas(
        b.words.astype(np.uint32), b.nwords_lane, b.med,
        mono=mono, nsteps=prof.nsteps, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(res))
    np.testing.assert_array_equal(np.asarray(broke_r), np.asarray(broke))
    np.testing.assert_array_equal(np.asarray(ndec_r), np.asarray(ndec))


def noise(n, ch, scale, seed):
    return np.round(np.random.default_rng(seed).normal(0, scale, (n, ch))
                    ).astype(np.int64)


def test_pallas_stereo():
    check(encode_file(noise(700, 2, 3000, 1),
                      EncodeSpec(block_samples=350, joint=True)), False)


def test_pallas_mono():
    check(encode_file(noise(512, 1, 900, 2),
                      EncodeSpec(block_samples=256, mono=True,
                                 terms=(18, 2), deltas=(2, 1))), True)


def test_pallas_zero_runs():
    pcm = np.zeros((512, 2), np.int64)
    pcm[100:130] = noise(30, 2, 50, 3)
    check(encode_file(pcm, EncodeSpec(block_samples=256, joint=True,
                                      initial_medians=((0, 0, 0), (0, 0, 0)))),
          False)


def test_pallas_escapes():
    check(encode_file(np.random.default_rng(4).integers(-2**22, 2**22, (256, 2)),
                      EncodeSpec(block_samples=256, bytes_stored=4)), False)


def test_pallas_corrupt_breaks():
    data = bytearray(encode_file(noise(512, 2, 2000, 5),
                                 EncodeSpec(block_samples=256, joint=True)))
    data[200] ^= 0xFF
    check(bytes(data), False)


def test_pallas_engine_integration():
    # force the pallas kernel through the full pipeline (interpret on CPU)
    from wvpk.engine import decode_bytes
    from wvpk.ref import decode_block
    pcm = noise(600, 2, 2500, 6)
    data = encode_file(pcm, EncodeSpec(block_samples=300, joint=True))
    config.set_options(entropy_kernel="pallas")
    try:
        blocks, dev = decode_bytes(data)
    finally:
        config.set_options(entropy_kernel="auto")
    for blk, d in zip(blocks, dev):
        want = decode_block(blk.state)
        np.testing.assert_array_equal(d.samples, want.samples)
        assert not d.crc_error


def check_hybrid(data: bytes, mono: bool):
    """Pallas (interpret) vs XLA kernel with the bucket's hybrid profile."""
    b = group_blocks([bb.state for bb in parse_blocks(data)])[0]
    prof = b.profile
    kw = dict(mono=mono, hybrid=prof.hybrid,
              hybrid_bitrate=prof.hybrid_bitrate,
              hybrid_balance=prof.hybrid_balance, nsteps=prof.nsteps)
    ref, broke_r, ndec_r = entropy_decode(
        b.words, b.nwords_lane, b.med, b.slow, b.acc, b.delta, **kw)
    res, broke, ndec = entropy_decode_pallas(
        b.words.astype(np.uint32), b.nwords_lane, b.med, b.slow, b.acc,
        b.delta, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(res))
    np.testing.assert_array_equal(np.asarray(broke_r), np.asarray(broke))
    np.testing.assert_array_equal(np.asarray(ndec_r), np.asarray(ndec))


def test_pallas_hybrid_balance():
    rng = np.random.default_rng(7)
    pcm = np.stack([np.round(rng.normal(0, 15000, 512)),
                    np.round(rng.normal(0, 60, 512))], axis=1).astype(np.int64)
    check_hybrid(encode_file(pcm, EncodeSpec(
        block_samples=256, joint=False, hybrid=True, hybrid_bitrate=True,
        hybrid_balance=True, bitrate=300, bitrate_delta=1)), False)


def test_pallas_hybrid_balance_clamped():
    rng = np.random.default_rng(8)
    pcm = np.stack([np.round(rng.normal(0, 25000, 256)),
                    np.zeros(256)], axis=1).astype(np.int64)
    check_hybrid(encode_file(pcm, EncodeSpec(
        block_samples=256, joint=True, hybrid=True, hybrid_bitrate=True,
        hybrid_balance=True, bitrate=70, bitrate_delta=2)), False)
