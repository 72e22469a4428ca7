"""Bounded-memory streaming encode (wvpk/encode.py::encode_wav_file).

Beyond reference parity (the reference is decode-only): a multi-GB WAV
must encode in O(window) memory, with output that decodes sample-exactly
through the same differential paths as the in-memory encoder. Contracts:
single-window host output is byte-identical to `encode`; device output
is byte-identical to `encode_device` for ANY window split (blocks are
independent lanes); the stamped MD5 covers the whole file regardless of
windowing.
"""

import hashlib

import numpy as np
import pytest

from wvpk import consts
from wvpk.container import parse_blocks
from wvpk.encode import encode, encode_device, encode_wav_file
from wvpk.io.pcm import format_samples
from wvpk.io.wav import (decode_pcm_bytes, make_wav_header, read_wav,
                         scan_wav_file)
from wvpk.ref import decode_block


def oracle_decode(data: bytes) -> np.ndarray:
    outs = []
    for b in parse_blocks(data):
        r = decode_block(b.state)
        assert not r.crc_error and not r.mute_error
        outs.append(r.samples)
    return np.concatenate(outs)


def sig(n, ch, scale=6000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    x = scale * np.sin(2 * np.pi * t / 97.0) + rng.normal(0, scale / 40,
                                                          (n, ch))
    return np.round(x).astype(np.int64)


def write_wav_file(path, pcm, *, rate=44100, bits=16, trailer=b""):
    bps = (bits + 7) // 8
    hdr = make_wav_header(pcm.shape[0], pcm.shape[1], rate, bits, bps)
    path.write_bytes(hdr + format_samples(pcm, bps) + trailer)


def stored_md5(data: bytes):
    for b in parse_blocks(data):
        if b.updates.md5 is not None:
            return b.updates.md5
    return None


def test_scan_wav_file_matches_read_wav(tmp_path):
    pcm = sig(777, 2, seed=1)
    p = tmp_path / "a.wav"
    write_wav_file(p, pcm, trailer=b"TAILDATA")
    blob = p.read_bytes()
    rpcm, rrate, rbits, rheader, rtrailer = read_wav(blob)
    ch, rate, bits, off, size, header, trailer, tag = scan_wav_file(
        str(p))
    assert (ch, rate, bits) == (2, rrate, rbits)
    assert header == rheader and trailer == rtrailer
    got = decode_pcm_bytes(blob[off:off + size], (bits + 7) // 8)
    np.testing.assert_array_equal(got.reshape(-1, ch), rpcm)


def test_single_window_byte_identical_to_batch(tmp_path):
    pcm = sig(5000, 2, seed=2)
    p = tmp_path / "a.wav"
    write_wav_file(p, pcm, trailer=b"tr")
    out = tmp_path / "a.wv"
    encode_wav_file(str(p), str(out), block_samples=1000,
                    window_samples=1 << 20)
    _, rate, bits, header, trailer = read_wav(p.read_bytes())
    want = encode(pcm, sample_rate=rate, bytes_per_sample=2,
                  block_samples=1000, riff_header=header,
                  riff_trailer=trailer)
    assert out.read_bytes() == want


@pytest.mark.parametrize("hybrid", [False, True])
def test_multiwindow_roundtrip_and_metadata(tmp_path, hybrid):
    pcm = sig(10000, 2, seed=3)
    p = tmp_path / "a.wav"
    write_wav_file(p, pcm)
    out = tmp_path / "a.wv"
    info = encode_wav_file(str(p), str(out), block_samples=512,
                           window_samples=2048, hybrid=hybrid,
                           bitrate=768)
    assert info["windows"] == 5 and info["samples"] == 10000
    data = out.read_bytes()
    got = oracle_decode(data)
    if hybrid:
        err = np.abs(got.astype(np.int64) - pcm)
        assert err.mean() < 64
    else:
        np.testing.assert_array_equal(got, pcm)
    blocks = parse_blocks(data)
    # block_index continuity across the window boundary + file total
    assert [b.header.block_index for b in blocks] == \
        list(range(0, 10000, 512))
    assert all(b.header.total_samples == 10000 for b in blocks)
    # RIFF header rides the first block; MD5 stamps only when lossless
    md5 = stored_md5(data)
    if hybrid:
        assert md5 is None
    else:
        assert md5 == hashlib.md5(format_samples(pcm, 2)).digest()
    assert blocks[0].updates.riff_header is not None
    assert all(b.updates.riff_header is None for b in blocks[1:])


def test_multiwindow_md5_matches_batch_stamp(tmp_path):
    # windowed MD5 accumulation == the batch encoder's one-shot digest
    pcm = sig(3000, 1, seed=4)
    p = tmp_path / "m.wav"
    write_wav_file(p, pcm)
    out = tmp_path / "m.wv"
    encode_wav_file(str(p), str(out), block_samples=256,
                    window_samples=1024)
    batch = encode(pcm, block_samples=256)
    got, want = stored_md5(out.read_bytes()), stored_md5(batch)
    assert got is not None and got == want


def test_false_stereo_and_8bit_streaming(tmp_path):
    one = sig(2000, 1, scale=50, seed=5)
    pcm = np.repeat(one, 2, axis=1)
    p = tmp_path / "f.wav"
    write_wav_file(p, pcm, bits=8)
    out = tmp_path / "f.wv"
    encode_wav_file(str(p), str(out), block_samples=512,
                    window_samples=512)
    data = out.read_bytes()
    blocks = parse_blocks(data)
    assert all(b.header.flags & consts.FALSE_STEREO for b in blocks)
    np.testing.assert_array_equal(oracle_decode(data), pcm)
    # whole-file MD5 covers the duplicated channels
    assert stored_md5(data) == \
        hashlib.md5(format_samples(pcm, 1)).digest()


def test_24bit_autoshift_streaming(tmp_path):
    pcm = sig(1500, 2, scale=300000, seed=6) << 3
    p = tmp_path / "s.wav"
    write_wav_file(p, pcm, bits=24)
    out = tmp_path / "s.wv"
    encode_wav_file(str(p), str(out), block_samples=512,
                    window_samples=512)
    np.testing.assert_array_equal(oracle_decode(out.read_bytes()), pcm)


@pytest.mark.parametrize("hybrid", [False, True])
def test_device_streaming_byte_identical_any_split(tmp_path, hybrid):
    # 4246 = 8 full blocks + a 150-sample tail: the short last block
    # lands alone in its window, where the warm-seeding scan must pad
    # exactly like the whole-file batch (pad_to) to stay byte-identical
    pcm = sig(4246, 2, seed=7)
    p = tmp_path / "d.wav"
    write_wav_file(p, pcm, trailer=b"T")
    _, rate, bits, header, trailer = read_wav(p.read_bytes())
    want = encode_device(pcm, sample_rate=rate, bytes_per_sample=2,
                         block_samples=512, riff_header=header,
                         riff_trailer=trailer, hybrid=hybrid, bitrate=640)
    for win in (1024, 2048):
        out = tmp_path / f"d{hybrid}{win}.wv"
        encode_wav_file(str(p), str(out), device=True, block_samples=512,
                        window_samples=win, hybrid=hybrid, bitrate=640)
        assert out.read_bytes() == want, f"window {win}"


def test_scan_wav_file_odd_pad_matches_read_wav(tmp_path):
    # 8-bit mono, odd sample count: data chunk is odd-sized, the RIFF
    # pad byte belongs to the trailer on both readers
    pcm = sig(333, 1, scale=40, seed=10)
    p = tmp_path / "odd.wav"
    write_wav_file(p, pcm, bits=8, trailer=b"\x00LIST1234")
    blob = p.read_bytes()
    rpcm, _, _, rheader, rtrailer = read_wav(blob)
    ch, rate, bits, off, size, header, trailer, tag = scan_wav_file(
        str(p))
    assert header == rheader and trailer == rtrailer
    np.testing.assert_array_equal(
        decode_pcm_bytes(blob[off:off + size], 1).reshape(-1, 1), rpcm)


def test_wide32_wvx_and_zeros_streaming(tmp_path):
    # >24-bit magnitudes route the wvx raw-bit sidecar; low-zero 32-bit
    # content routes int32 zeros — both whole-stream decisions must come
    # out of the windowed stats fold identically to the batch spec
    for name, pcm in (
            ("wvx", (sig(3000, 2, scale=40_000_000, seed=11) | 1)),
            ("zeros", sig(3000, 2, scale=2_000_000, seed=12) << 4)):
        p = tmp_path / f"{name}.wav"
        write_wav_file(p, pcm, bits=32)
        out = tmp_path / f"{name}.wv"
        encode_wav_file(str(p), str(out), block_samples=512,
                        window_samples=1024)
        np.testing.assert_array_equal(oracle_decode(out.read_bytes()),
                                      pcm, err_msg=name)


def test_stream_random_differential(tmp_path):
    # randomized window splits vs the batch encoder: decoded samples and
    # the stamped MD5 must agree regardless of windowing
    rng = np.random.default_rng(1234)
    for case in range(5):
        ch = int(rng.integers(1, 3))
        bits = int(rng.choice([8, 16, 24]))
        scale = {8: 50, 16: 6000, 24: 800000}[bits]
        n = int(rng.integers(900, 4000))
        bs = int(rng.choice([256, 512, 1000]))
        win = bs * int(rng.integers(1, 4))
        pcm = sig(n, ch, scale=scale, seed=100 + case)
        p = tmp_path / f"r{case}.wav"
        write_wav_file(p, pcm, bits=bits)
        out = tmp_path / f"r{case}.wv"
        encode_wav_file(str(p), str(out), block_samples=bs,
                        window_samples=win)
        data = out.read_bytes()
        _, rate, _, header, trailer = read_wav(p.read_bytes())
        batch = encode(pcm, sample_rate=rate,
                       bytes_per_sample=(bits + 7) // 8,
                       block_samples=bs, riff_header=header,
                       riff_trailer=trailer)
        msg = f"case {case}: ch={ch} bits={bits} n={n} bs={bs} win={win}"
        np.testing.assert_array_equal(
            oracle_decode(data), oracle_decode(batch), err_msg=msg)
        assert stored_md5(data) == stored_md5(batch), msg


def decode_segments(data: bytes) -> np.ndarray:
    from collections import defaultdict

    from wvpk.ref import decode_block
    seg = defaultdict(list)
    for b in parse_blocks(data):
        r = decode_block(b.state)
        assert not r.crc_error and not r.mute_error
        seg[b.header.block_index].append(r.samples)
    return np.concatenate([np.concatenate(seg[k], 1) for k in sorted(seg)])


@pytest.mark.parametrize("nch", [5, 6])
def test_multichannel_streaming_roundtrip(tmp_path, nch):
    pcm = sig(2200, nch, seed=14 + nch)
    p = tmp_path / "mc.wav"
    write_wav_file(p, pcm)
    out = tmp_path / "mc.wv"
    info = encode_wav_file(str(p), str(out), block_samples=512,
                           window_samples=1024, preset="high")
    assert info["windows"] == 3
    data = out.read_bytes()
    np.testing.assert_array_equal(decode_segments(data), pcm)
    # segment structure: INITIAL/FINAL per time window, one channel-info,
    # whole-file MD5 on the final block
    blocks = parse_blocks(data)
    n_streams = (nch + 1) // 2
    assert blocks[0].header.flags & consts.INITIAL_BLOCK
    assert blocks[n_streams - 1].header.flags & consts.FINAL_BLOCK
    assert sum(b.updates.num_channels is not None for b in blocks) == 1
    assert stored_md5(data) == hashlib.md5(format_samples(pcm, 2)).digest()
    # single-window output is byte-identical to the in-memory batch
    out2 = tmp_path / "mc1.wv"
    encode_wav_file(str(p), str(out2), block_samples=512,
                    window_samples=1 << 20, preset="high")
    _, rate, _, header, trailer = read_wav(p.read_bytes())
    want = encode(pcm, sample_rate=rate, bytes_per_sample=2,
                  block_samples=512, preset="high", riff_header=header,
                  riff_trailer=trailer)
    assert out2.read_bytes() == want


def test_multichannel_device_streaming_any_split(tmp_path):
    pcm = sig(1700, 4, seed=21)   # 3 full blocks + 164-sample tail
    p = tmp_path / "mcd.wav"
    write_wav_file(p, pcm, trailer=b"TAIL")
    _, rate, _, header, trailer = read_wav(p.read_bytes())
    want = encode_device(pcm, sample_rate=rate, bytes_per_sample=2,
                         block_samples=512, riff_header=header,
                         riff_trailer=trailer)
    for win in (512, 1024):
        out = tmp_path / f"mcd{win}.wv"
        encode_wav_file(str(p), str(out), device=True, block_samples=512,
                        window_samples=win)
        assert out.read_bytes() == want, f"window {win}"
    np.testing.assert_array_equal(decode_segments(want), pcm)


def test_streaming_device_wvx_roundtrip(tmp_path):
    # wide 32-bit content on the device path: the scans code the stored
    # high bits, the wvx sent-bits sidecar is host-packed per block —
    # and device lanes are split-invariant, so any window size is
    # byte-identical to the whole-file device encode
    pcm = sig(3000, 2, scale=40_000_000, seed=13) | 1
    p = tmp_path / "w.wav"
    write_wav_file(p, pcm, bits=32)
    whole = tmp_path / "whole.wv"
    encode_wav_file(str(p), str(whole), device=True, block_samples=512)
    want = whole.read_bytes()
    np.testing.assert_array_equal(decode_segments(want), pcm)
    for win in (512, 1024):
        out = tmp_path / f"wvx{win}.wv"
        encode_wav_file(str(p), str(out), device=True, block_samples=512,
                        window_samples=win)
        assert out.read_bytes() == want, f"window {win}"


def test_cli_streaming_encode_decode_cycle(tmp_path):
    from wvpk.cli import main
    pcm = sig(6000, 2, seed=9)
    p = tmp_path / "c.wav"
    write_wav_file(p, pcm)
    wv = tmp_path / "c.wv"
    assert main(["--encode", "--streaming", str(p), "-o", str(wv),
                 "--block-samples", "1024", "-q"]) == 0
    out = tmp_path / "c_out.wav"
    assert main([str(wv), "-o", str(out), "-q"]) == 0
    got, rate, bits, _, _ = read_wav(out.read_bytes())
    np.testing.assert_array_equal(got, pcm)


def test_device_streaming_mesh_byte_identical(tmp_path):
    """encode_wav_file(device=True, mesh=...) shards each window's scans
    over the 8-device mesh and stays byte-identical to the unsharded
    device stream (and so to encode_device for any split)."""
    from wvpk.parallel import make_mesh

    pcm = sig(2214, 2, seed=21)          # 4 blocks + short tail
    p = tmp_path / "m.wav"
    write_wav_file(p, pcm)
    want = tmp_path / "plain.wv"
    got = tmp_path / "mesh.wv"
    encode_wav_file(str(p), str(want), device=True, block_samples=512,
                    window_samples=1024)
    encode_wav_file(str(p), str(got), device=True, block_samples=512,
                    window_samples=1024, mesh=make_mesh(8))
    assert got.read_bytes() == want.read_bytes()
