"""Lossless roundtrip identity: PCM -> encode -> oracle decode -> PCM.

This is the independent-oracle gate from SURVEY.md section 4: the encoder and
decoder share no decode code path (the encoder only *stamps* CRC via the
oracle; the identity check is on sample values), so agreement here validates
both sides.
"""

import numpy as np
import pytest

from wvpk import consts
from wvpk.container import parse_blocks
from wvpk.ref import decode_block
from wvpk.testgen import EncodeSpec, encode_file


def rng(seed=0):
    return np.random.default_rng(seed)


def roundtrip(pcm, spec, expect_lossless=True):
    data = encode_file(pcm, spec)
    blocks = parse_blocks(data)
    assert blocks, "no blocks parsed"
    outs = []
    for b in blocks:
        res = decode_block(b.state)
        assert not res.mute_error, "unexpected mute"
        assert not res.crc_error, "crc mismatch"
        outs.append(res.samples)
    out = np.concatenate(outs, axis=0)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if spec.false_stereo:
        assert out.shape[1] == 2
        np.testing.assert_array_equal(out[:, 0:1], pcm)
        np.testing.assert_array_equal(out[:, 1:2], pcm)
    elif expect_lossless:
        np.testing.assert_array_equal(out, pcm.astype(np.int32))
    return out


def noise(n, ch, scale, seed=0):
    x = rng(seed).normal(0, scale, size=(n, ch))
    return np.round(x).astype(np.int64)


def tone(n, ch, amp, period=50):
    t = np.arange(n)[:, None]
    return np.round(amp * np.sin(2 * np.pi * t / period)).astype(np.int64) \
        * np.ones((1, ch), np.int64)


def test_stereo_lossless_basic():
    pcm = noise(2000, 2, 3000, seed=1) + tone(2000, 2, 8000)
    roundtrip(pcm, EncodeSpec(block_samples=512, joint=True))


def test_stereo_non_joint():
    pcm = noise(1000, 2, 500, seed=2)
    roundtrip(pcm, EncodeSpec(block_samples=300, joint=False))


def test_mono_lossless():
    pcm = noise(1500, 1, 2000, seed=3)
    roundtrip(pcm, EncodeSpec(block_samples=400, mono=True,
                              terms=(18, 2), deltas=(2, 1)))


def test_false_stereo():
    pcm = noise(700, 1, 1000, seed=4)
    roundtrip(pcm, EncodeSpec(block_samples=256, false_stereo=True, joint=True))


@pytest.mark.parametrize("terms,deltas", [
    ((1,), (2,)), ((2, 17), (1, 2)), ((8, 5, 3, 1), (2, 2, 1, 1)),
    ((-1, 18, 2), (1, 2, 2)), ((-2, 17), (2, 2)), ((-3, 18, 18, 2), (2, 2, 2, 1)),
    ((18, 18, 18, 18, 18, 2, 2, 17, 17, 3, 5, 7, 8, 1, 4, 6),
     (2,) * 16),
])
def test_term_matrix_stereo(terms, deltas):
    pcm = noise(600, 2, 4000, seed=hash(terms) % 2**31)
    roundtrip(pcm, EncodeSpec(block_samples=600, joint=True,
                              terms=terms, deltas=deltas))


@pytest.mark.parametrize("terms", [(17,), (18, 3), (8, 2, 1)])
def test_term_matrix_mono(terms):
    pcm = noise(500, 1, 700, seed=11)
    roundtrip(pcm, EncodeSpec(block_samples=500, mono=True, terms=terms,
                              deltas=(2,) * len(terms)))


def test_zero_runs_silence():
    pcm = np.zeros((900, 2), np.int64)
    pcm[300:320] = noise(20, 2, 100, seed=5)
    roundtrip(pcm, EncodeSpec(block_samples=450, joint=True,
                              initial_medians=((0, 0, 0), (0, 0, 0))))


def test_all_silence():
    pcm = np.zeros((1000, 1), np.int64)
    roundtrip(pcm, EncodeSpec(block_samples=250, mono=True,
                              initial_medians=((0, 0, 0), (0, 0, 0))))


def test_shift():
    pcm = noise(400, 2, 1000, seed=6) << 4
    roundtrip(pcm, EncodeSpec(block_samples=200, joint=True, shift=4))


@pytest.mark.parametrize("bytes_stored,scale", [(1, 40), (2, 8000), (3, 2**20), (4, 2**22)])
def test_bit_depths(bytes_stored, scale):
    # stored residuals stay <= ~24 bits like real encoders produce: the
    # reference's int32 medians wrap past 2^31 ("limited in resolution",
    # readme.txt), so larger magnitudes go through INT32 handling instead
    pcm = noise(500, 2, scale, seed=bytes_stored)
    roundtrip(pcm, EncodeSpec(block_samples=250, joint=True,
                              bytes_stored=bytes_stored))


def test_multi_block_state_carry():
    pcm = noise(3000, 2, 5000, seed=7)
    roundtrip(pcm, EncodeSpec(block_samples=333, joint=True,
                              terms=(18, 17, 3, 2)))


def test_large_values_int32():
    # full 32-bit values ride the INT32/wvx path (sent_bits strips low bits
    # so stored residuals stay in the entropy coder's sane range)
    pcm = rng(8).integers(-2**30, 2**30, size=(400, 2))
    roundtrip(pcm, EncodeSpec(block_samples=200, bytes_stored=4,
                              int32_mode="wvx", int32_sent_bits=8))


def test_hybrid_lossy_within_error():
    pcm = noise(800, 2, 6000, seed=9)
    spec = EncodeSpec(block_samples=400, joint=True, hybrid=True, bitrate=768)
    data = encode_file(pcm, spec)
    blocks = parse_blocks(data)
    outs = []
    for b in blocks:
        res = decode_block(b.state)
        assert not res.mute_error
        assert not res.crc_error, "hybrid crc must match its own stream"
        outs.append(res.samples)
    out = np.concatenate(outs, axis=0)
    err = np.abs(out.astype(np.int64) - pcm)
    assert err.mean() < 4000, "hybrid error unexpectedly large"


def test_hybrid_bitrate_mode():
    pcm = noise(600, 2, 3000, seed=10)
    spec = EncodeSpec(block_samples=300, joint=True, hybrid=True,
                      hybrid_bitrate=True, bitrate=256, bitrate_delta=1)
    data = encode_file(pcm, spec)
    for b in parse_blocks(data):
        res = decode_block(b.state)
        assert not res.mute_error and not res.crc_error


def test_int32_zeros_mode():
    pcm = noise(300, 2, 10**6, seed=12) << 5
    roundtrip(pcm, EncodeSpec(block_samples=150, bytes_stored=4,
                              int32_mode="zeros", int32_zeros=5))


def test_int32_wvx_mode():
    pcm = rng(13).integers(-2**29, 2**29, size=(300, 2))
    roundtrip(pcm, EncodeSpec(block_samples=150, bytes_stored=4,
                              int32_mode="wvx", int32_sent_bits=6,
                              int32_max_width=0))


def test_int32_wvx_new_mode():
    pcm = rng(14).integers(-2**26, 2**26, size=(300, 2))
    roundtrip(pcm, EncodeSpec(block_samples=150, bytes_stored=4,
                              int32_mode="wvx", int32_sent_bits=4,
                              int32_max_width=31))


def test_float_mode_shift0():
    pcm = rng(15).integers(-2**22, 2**22, size=(300, 2))
    spec = EncodeSpec(block_samples=150, float_data=True, bytes_stored=4,
                      float_shift=0, float_max_exp=127, float_norm_exp=127)
    roundtrip(pcm, spec)
