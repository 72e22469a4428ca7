"""Multichannel (>2ch) segments: encode, full decode, parity behaviors."""

import numpy as np
import pytest

from wvpk import api, consts
from wvpk.testgen import EncodeSpec, encode_multichannel


def mc_pcm(n, ch, seed=0, scale=3000):
    return np.round(np.random.default_rng(seed).normal(0, scale, (n, ch))
                    ).astype(np.int64)


def test_51_lossless_24bit():
    # BASELINE config 3: 24-bit 5.1 multichannel with deep decorr chains
    pcm = mc_pcm(900, 6, seed=1, scale=200000)
    data = encode_multichannel(pcm, EncodeSpec(
        block_samples=300, joint=True, bytes_stored=3,
        terms=(18, 18, 18, 18, 18, 2, 2, 17, 17, 3), deltas=(2,) * 10))
    wpc = api.WavpackOpenFileInput(data, flags=consts.OPEN_ALL_CHANNELS)
    assert api.WavpackGetErrorMessage(wpc) == ""
    assert api.WavpackGetNumChannels(wpc) == 6
    buf = np.zeros(900 * 6, np.int32)
    got = api.WavpackUnpackSamples(wpc, buf, 900)
    assert got == 900
    np.testing.assert_array_equal(buf.reshape(-1, 6), pcm)
    assert api.WavpackGetNumErrors(wpc) == 0


def test_odd_channel_count():
    pcm = mc_pcm(400, 5, seed=2)
    data = encode_multichannel(pcm, EncodeSpec(block_samples=200, joint=True))
    wpc = api.WavpackOpenFileInput(data, flags=consts.OPEN_ALL_CHANNELS)
    buf = np.zeros(400 * 5, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, 400) == 400
    np.testing.assert_array_equal(buf.reshape(-1, 5), pcm)


def test_parity_refuses_without_flag():
    pcm = mc_pcm(200, 4, seed=3)
    data = encode_multichannel(pcm, EncodeSpec(block_samples=200))
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetErrorMessage(wpc) == "only two channels supported!"


def test_parity_2ch_max_first_stream():
    pcm = mc_pcm(300, 4, seed=4)
    data = encode_multichannel(pcm, EncodeSpec(block_samples=300, joint=True))
    wpc = api.WavpackOpenFileInput(data, flags=consts.OPEN_2CH_MAX)
    assert api.WavpackGetErrorMessage(wpc) == ""
    assert api.WavpackGetReducedChannels(wpc) == 2
    buf = np.zeros(300 * 2, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, 300) == 300
    np.testing.assert_array_equal(buf.reshape(-1, 2), pcm[:, :2])


def test_multichannel_seek():
    pcm = mc_pcm(1000, 6, seed=5)
    data = encode_multichannel(pcm, EncodeSpec(block_samples=250, joint=True))
    wpc = api.WavpackOpenFileInput(data, flags=consts.OPEN_ALL_CHANNELS)
    assert api.SetSample(wpc, 377)
    buf = np.zeros(50 * 6, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, 50) == 50
    np.testing.assert_array_equal(buf.reshape(-1, 6), pcm[377:427])


def test_multichannel_cli(tmp_path):
    from wvpk.cli import decode_one
    pcm = mc_pcm(600, 6, seed=6)
    src = tmp_path / "mc.wv"
    src.write_bytes(encode_multichannel(pcm, EncodeSpec(block_samples=300,
                                                        joint=True)))
    out = tmp_path / "mc.wav"
    assert decode_one(str(src), str(out), quiet=True) == 0
    blob = out.read_bytes()
    got = np.frombuffer(blob[44:], "<i2").reshape(-1, 6)
    np.testing.assert_array_equal(got, pcm)
