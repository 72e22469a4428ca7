"""Public API surface: open/unpack/getters/seek parity behaviors."""

import numpy as np
import pytest

from wvpk import api, consts
from wvpk.testgen import EncodeSpec, encode_dsd_file, encode_file


def stereo_file(n=2000, block=500, seed=0, **kw):
    pcm = np.round(np.random.default_rng(seed).normal(0, 3000, (n, 2))
                   ).astype(np.int64)
    return pcm, encode_file(pcm, EncodeSpec(block_samples=block, joint=True, **kw))


def test_open_info():
    pcm, data = stereo_file()
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetErrorMessage(wpc) == ""
    assert api.WavpackGetNumChannels(wpc) == 2
    assert api.WavpackGetNumSamples(wpc) == 2000
    assert api.WavpackGetBitsPerSample(wpc) == 16
    assert api.WavpackGetBytesPerSample(wpc) == 2
    assert api.WavpackGetSampleRate(wpc) == 44100
    assert api.WavpackGetVersion(wpc) == 0x410
    assert not api.WavpackLossy(wpc)


def test_unpack_all_at_once():
    pcm, data = stereo_file()
    wpc = api.WavpackOpenFileInput(data)
    buf = np.zeros(2000 * 2, np.int32)
    got = api.WavpackUnpackSamples(wpc, buf, 2000)
    assert got == 2000
    np.testing.assert_array_equal(buf.reshape(-1, 2), pcm)
    assert api.WavpackGetNumErrors(wpc) == 0


@pytest.mark.parametrize("chunk", [1, 7, 100, 4096])
def test_unpack_chunking_invariance(chunk):
    pcm, data = stereo_file(n=1100, block=300, seed=1)
    wpc = api.WavpackOpenFileInput(data)
    out = []
    buf = np.zeros(chunk * 2, np.int32)
    while True:
        got = api.WavpackUnpackSamples(wpc, buf, chunk)
        if got == 0:
            break
        out.append(buf[:got * 2].copy())
    res = np.concatenate(out).reshape(-1, 2)
    np.testing.assert_array_equal(res, pcm)


def test_seek_exact():
    pcm, data = stereo_file(n=3000, block=512, seed=2)
    wpc = api.WavpackOpenFileInput(data)
    assert api.SetSample(wpc, 1234)
    buf = np.zeros(100 * 2, np.int32)
    got = api.WavpackUnpackSamples(wpc, buf, 100)
    assert got == 100
    np.testing.assert_array_equal(buf.reshape(-1, 2), pcm[1234:1334])
    # seek past end fails
    assert not api.SetSample(wpc, 3000)


def test_format_samples_depths():
    src = np.asarray([0, 1, -1, 127, -128], np.int32)
    b1 = api.WavpackFormatSamples(src, 5, 1)
    assert b1 == bytes([128, 129, 127, 255, 0])
    b2 = api.WavpackFormatSamples(np.asarray([0x1234, -2], np.int32), 2, 2)
    assert b2 == bytes([0x34, 0x12, 0xFE, 0xFF])
    b3 = api.WavpackFormatSamples(np.asarray([0x123456], np.int32), 1, 3)
    assert b3 == bytes([0x56, 0x34, 0x12])
    b4 = api.WavpackFormatSamples(np.asarray([-2], np.int32), 1, 4)
    assert b4 == bytes([0xFE, 0xFF, 0xFF, 0xFF])


def test_mode_mask_and_config():
    pcm, data = stereo_file(seed=3, hybrid=True, bitrate=800)
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackLossy(wpc)


def test_dsd_getters():
    d = np.random.default_rng(4).integers(0, 256, (300, 2)).astype(np.int64)
    data = encode_dsd_file(d, 0, mono=False, mult_log=3)
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetMode(wpc) & consts.MODE_DSD
    assert api.WavpackGetBytesPerSample(wpc) == 1
    # native sample count is x8 for DSD
    assert api.WavpackGetNumSamples(wpc, native=True) == 300 * 8
    assert api.WavpackGetSampleRate(wpc) == 44100 * 8 * 8
    buf = np.zeros(300 * 2, np.int32)
    got = api.WavpackUnpackSamples(wpc, buf, 300)
    assert got == 300
    np.testing.assert_array_equal(buf.reshape(-1, 2), d)


def test_dsd_seek_mid_block():
    """SetSample works in the byte-sample domain on multi-block DSD files
    (the reference seeks DSD like PCM; native x8 applies to getters only,
    WavPackUtils.cs:346-350 vs 504-594)."""
    rng = np.random.default_rng(6)
    d = rng.integers(0, 256, (900, 2)).astype(np.int64)
    data = encode_dsd_file(d, 1, mono=False, block_samples=300,
                           history_bits=2)
    wpc = api.WavpackOpenFileInput(data)
    assert api.SetSample(wpc, 437)
    buf = np.zeros(200 * 2, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, 200) == 200
    np.testing.assert_array_equal(buf.reshape(-1, 2), d[437:637])
    assert api.WavpackGetNumErrors(wpc) == 0
    assert not api.SetSample(wpc, 900)


def test_garbage_file_error():
    wpc = api.WavpackOpenFileInput(b"\x00" * 1000)
    assert api.WavpackGetErrorMessage(wpc) != ""


def test_resync_over_garbage():
    pcm, data = stereo_file(n=500, block=500, seed=5)
    wpc = api.WavpackOpenFileInput(b"JUNKJUNK" * 13 + data)
    buf = np.zeros(500 * 2, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, 500) == 500
    np.testing.assert_array_equal(buf.reshape(-1, 2), pcm)


def test_riff_header_passthrough():
    pcm = np.zeros((100, 2), np.int64)
    hdr = b"RIFFxxxxWAVEfmt " + bytes(24)
    data = encode_file(pcm, EncodeSpec(block_samples=100, riff_header=hdr))
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetHeader(wpc) == hdr


def test_segment_lookup_searchsorted():
    """_find_segment is O(log n): the cumulative-end array is built at
    open (monotone block indices) and agrees with a linear walk at every
    boundary, including the out-of-range sentinel."""
    pcm, data = stereo_file(n=6400, block=64, seed=5)
    wpc = api.WavpackOpenFileInput(data)
    assert wpc._seg_ends is not None
    assert len(wpc._segments) == 100

    def linear(sample):
        for s, (_start, end, _blocks) in enumerate(wpc._segments):
            if sample < end:
                return s
        return None

    probes = [0, 1, 63, 64, 65, 3200, 6399, 6400, 9999]
    for p in probes:
        assert api._find_segment(wpc, p) == linear(p), p
    # seek still lands exactly through the searchsorted path
    assert api.SetSample(wpc, 4321)
    buf = np.zeros(10 * 2, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, 10) == 10
    np.testing.assert_array_equal(buf.reshape(-1, 2), pcm[4321:4331])
