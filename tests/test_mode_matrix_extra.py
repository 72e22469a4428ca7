"""Extra mode-matrix corners: old stream versions, int32 ones/dups on
device, 8-bit, odd block sizes, non-standard sample rates."""

import numpy as np
import pytest

from wvpk import api
from wvpk.container import parse_blocks
from wvpk.engine import decode_bytes
from wvpk.ref import decode_block
from wvpk.testgen import EncodeSpec, encode_file


def compare(data: bytes):
    blocks, dev = decode_bytes(data)
    assert blocks
    for blk, d in zip(blocks, dev):
        want = decode_block(blk.state)
        np.testing.assert_array_equal(d.samples, want.samples)
        assert d.crc_error == want.crc_error
    return blocks, dev


def noise(n, ch, scale, seed):
    return np.round(np.random.default_rng(seed).normal(0, scale, (n, ch))
                    ).astype(np.int64)


def test_version_0x402_hybrid_samples_skip():
    pcm = noise(400, 2, 4000, 1)
    data = encode_file(pcm, EncodeSpec(block_samples=200, joint=True,
                                       hybrid=True, bitrate=700,
                                       version=0x402))
    blocks, dev = compare(data)
    assert blocks[0].header.version == 0x402
    assert not any(d.crc_error for d in dev)


def test_version_0x402_lossless_roundtrip():
    pcm = noise(400, 2, 2000, 2)
    data = encode_file(pcm, EncodeSpec(block_samples=200, joint=True,
                                       version=0x402))
    wpc = api.WavpackOpenFileInput(data)
    buf = np.zeros(400 * 2, np.int32)
    assert api.WavpackUnpackSamples(wpc, buf, 400) == 400
    np.testing.assert_array_equal(buf.reshape(-1, 2), pcm)


def test_int32_ones_mode_device():
    base = noise(300, 2, 10**6, 3) << 3
    pcm = base + 7  # low 3 bits all ones
    compare(encode_file(pcm, EncodeSpec(block_samples=150, bytes_stored=4,
                                        int32_mode="ones", int32_ones=3)))


def test_int32_dups_mode_device():
    raw = noise(300, 2, 10**5, 4)
    # duplicated-bit property: low `dups` bits copy bit `dups`
    dups = 2
    pcm = (raw << dups) | np.where(raw & 1, (1 << dups) - 1, 0)
    compare(encode_file(pcm, EncodeSpec(block_samples=150, bytes_stored=4,
                                        int32_mode="dups", int32_dups=dups)))


def test_8bit_device():
    pcm = np.clip(noise(500, 2, 30, 5), -128, 127)
    compare(encode_file(pcm, EncodeSpec(block_samples=250, joint=True,
                                        bytes_stored=1)))


def test_odd_block_sizes_mixed_bucket():
    # non-power-of-two sizes land in padded capacity buckets
    out = b""
    for n, seed in ((97, 6), (511, 7), (513, 8)):
        pcm = noise(n, 2, 1500, seed)
        out += encode_file(pcm, EncodeSpec(block_samples=n, joint=True))
    compare(out)


def test_nonstandard_sample_rate_metadata():
    pcm = noise(200, 2, 800, 9)
    data = encode_file(pcm, EncodeSpec(block_samples=200, sample_rate=12345))
    # the encoder emits ID_SAMPLE_RATE for non-table rates; the decoder
    # honors it (UnpackUtils.cs:461-472)
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetSampleRate(wpc) == 12345

    # srate index 0xF in flags WITHOUT ID_SAMPLE_RATE metadata falls
    # back to the 44100 default (reference WavPackUtils.cs:82-88)
    data = bytearray(encode_file(pcm, EncodeSpec(block_samples=200)))
    flags = int.from_bytes(data[24:28], "little") | (0xF << 23)
    data[24:28] = flags.to_bytes(4, "little")
    wpc = api.WavpackOpenFileInput(bytes(data))
    assert api.WavpackGetSampleRate(wpc) == 44100


def test_mono_hybrid_device():
    pcm = noise(400, 1, 5000, 10)
    data = encode_file(pcm, EncodeSpec(block_samples=200, mono=True,
                                       terms=(18, 2), deltas=(2, 2),
                                       hybrid=True, bitrate=650))
    compare(data)


def test_false_stereo_hybrid_device():
    pcm = noise(300, 1, 3000, 11)
    data = encode_file(pcm, EncodeSpec(block_samples=150, false_stereo=True,
                                       hybrid=True, bitrate=700))
    compare(data)


def test_false_stereo_wvx_crcx_quirk():
    """FALSE_STEREO + INT32/wvx: the reference's fixup counts
    sample_count*2 whenever MONO_FLAG is clear (UnpackUtils.cs:1265), so
    it injects wvx bits into the not-yet-duplicated half of the buffer
    and folds those values into crc_x. The device path must replicate
    that (samples are unaffected; crc_x and the wvx cursor are)."""
    pcm = noise(300, 1, 60000, 12) << 4
    data = encode_file(pcm, EncodeSpec(block_samples=150, false_stereo=True,
                                       bytes_stored=4, int32_mode="wvx",
                                       int32_sent_bits=4, int32_max_width=30))
    blocks, dev = compare(data)
    for blk, d in zip(blocks, dev):
        want = decode_block(blk.state)
        assert d.crc_x == want.crc_x == blk.state.crc_mvx
        assert not d.crc_error
