"""Public encode API (wvpk/encode.py) + WAV reader + CLI encode mode.

Beyond reference parity (the reference is decode-only): every stream the
public encoder emits must decode sample-exactly (lossless) or clean
(hybrid) through the same paths the decoder tests gate.
"""

import numpy as np
import pytest

from wvpk import api, consts
from wvpk.container import parse_blocks
from wvpk.encode import PRESETS, build_spec, encode
from wvpk.io.wav import make_wav_header, read_wav
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


def test_lossless_roundtrip_identity():
    pcm = sig(5000, 2)
    data = encode(pcm, block_samples=1000)
    np.testing.assert_array_equal(oracle_decode(data), pcm)


@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_presets_roundtrip_mono_and_stereo(preset):
    for ch in (1, 2):
        pcm = sig(1200, ch, seed=ch)
        data = encode(pcm, preset=preset, block_samples=512)
        np.testing.assert_array_equal(oracle_decode(data)[:, :ch], pcm)


def test_false_stereo_autodetect():
    one = sig(900, 1, seed=3)
    pcm = np.repeat(one, 2, axis=1)
    data = encode(pcm, block_samples=512)
    blocks = parse_blocks(data)
    assert all(b.header.flags & consts.FALSE_STEREO for b in blocks)
    np.testing.assert_array_equal(oracle_decode(data), pcm)


def test_auto_shift_24bit():
    pcm = sig(800, 2, scale=300000, seed=4) << 3
    spec = build_spec(pcm, bytes_per_sample=3)
    assert spec.shift == 3
    data = encode(pcm, bytes_per_sample=3, block_samples=512)
    np.testing.assert_array_equal(oracle_decode(data), pcm)


def test_auto_zeros_32bit():
    pcm = sig(700, 2, scale=2_000_000, seed=5) << 4
    spec = build_spec(pcm, bytes_per_sample=4)
    assert spec.int32_mode == "zeros" and spec.int32_zeros == 4
    data = encode(pcm, bytes_per_sample=4, block_samples=512)
    np.testing.assert_array_equal(oracle_decode(data), pcm)


def test_multichannel_segment():
    pcm = sig(600, 6, seed=6)
    data = encode(pcm, block_samples=256)
    blocks = parse_blocks(data)
    # stream runs of 3 stereo blocks per time window
    assert blocks[0].header.flags & consts.INITIAL_BLOCK
    assert blocks[2].header.flags & consts.FINAL_BLOCK
    from collections import defaultdict
    seg = defaultdict(list)
    for b in blocks:
        r = decode_block(b.state)
        assert not r.crc_error and not r.mute_error
        seg[b.header.block_index].append(r.samples)
    out = np.concatenate([np.concatenate(seg[k], 1) for k in sorted(seg)])
    np.testing.assert_array_equal(out, pcm)


def test_multichannel_high_preset_mono_tail():
    # 5ch = 2 stereo streams (keep the high preset's cross-channel
    # terms) + mono tail (stripped); all must roundtrip
    pcm = sig(500, 5, seed=11)
    data = encode(pcm, preset="high", block_samples=256)
    from collections import defaultdict
    seg = defaultdict(list)
    for b in parse_blocks(data):
        r = decode_block(b.state)
        assert not r.crc_error and not r.mute_error
        seg[b.header.block_index].append(r.samples)
    out = np.concatenate([np.concatenate(seg[k], 1) for k in sorted(seg)])
    np.testing.assert_array_equal(out, pcm)


def test_hybrid_smaller_and_clean():
    pcm = sig(4096, 2, scale=15000, seed=7)
    lossless = encode(pcm, md5=False)
    hybrid = encode(pcm, hybrid=True, bitrate=400, md5=False)
    assert len(hybrid) < len(lossless)
    got = oracle_decode(hybrid)     # asserts crc/mute clean
    assert got.shape == pcm.shape
    assert not np.array_equal(got, pcm)  # genuinely lossy at this rate


def test_md5_stamp_verifies(tmp_path):
    pcm = sig(3000, 2, seed=8)
    p = tmp_path / "a.wv"
    p.write_bytes(encode(pcm, block_samples=1024))
    wpc = api.WavpackOpenFileInput(str(p))
    assert api.WavpackGetMode(wpc) & consts.MODE_MD5
    stored = api.WavpackGetMD5Sum(wpc)
    import hashlib

    from wvpk.io.pcm import format_samples
    assert stored == hashlib.md5(format_samples(pcm, 2)).digest()


def test_read_wav_8bit_and_header_passthrough():
    pcm = (sig(400, 2, scale=90, seed=9)).clip(-128, 127)
    raw = bytes((pcm.reshape(-1) + 128).astype(np.uint8))
    hdr = make_wav_header(len(pcm), 2, 8000, 8, 1)
    got, rate, bits, header, trailer = read_wav(hdr + raw + b"TAIL")
    assert (rate, bits) == (8000, 8)
    np.testing.assert_array_equal(got, pcm)
    assert header == hdr and trailer == b"TAIL"


def test_wide_32bit_routes_wvx():
    # full-scale-ish 32-bit content with no trailing zeros must route
    # the low bits through the wvx sidecar and stay lossless
    rng = np.random.default_rng(12)
    pcm = rng.integers(-(1 << 30), 1 << 30, (900, 2)).astype(np.int64)
    spec = build_spec(pcm, bytes_per_sample=4)
    assert spec.int32_mode == "wvx" and spec.int32_sent_bits >= 7
    data = encode(pcm, bytes_per_sample=4, block_samples=512)
    np.testing.assert_array_equal(oracle_decode(data), pcm)


def test_rejects_bad_inputs():
    pcm = sig(100, 2)
    with pytest.raises(ValueError, match="integer or float32 PCM"):
        build_spec(pcm.astype(np.float64))
    with pytest.raises(ValueError, match="block_samples"):
        build_spec(pcm, block_samples=0)
    with pytest.raises(ValueError, match="hybrid"):
        build_spec(np.full((100, 2), 1 << 29, np.int64), bytes_per_sample=4,
                   hybrid=True)


def test_nonstandard_sample_rate_preserved(tmp_path):
    p = tmp_path / "r.wv"
    p.write_bytes(encode(sig(600, 2, seed=13), sample_rate=37800,
                         block_samples=512))
    wpc = api.WavpackOpenFileInput(str(p))
    assert api.WavpackGetSampleRate(wpc) == 37800


def test_hybrid_md5_defaults_off():
    pcm = sig(800, 2, seed=14)
    blocks = parse_blocks(encode(pcm, hybrid=True, block_samples=512))
    assert all(b.updates.md5 is None for b in blocks)
    # explicit True stamps the SOURCE digest (libwavpack semantics)
    blocks = parse_blocks(encode(pcm, hybrid=True, md5=True,
                                 block_samples=512))
    assert blocks[-1].updates.md5 is not None


def test_read_wav_odd_data_chunk_pad(tmp_path):
    from wvpk.cli import main
    pcm = sig(401, 1, scale=90, seed=15).clip(-128, 127)
    raw = bytes((pcm.reshape(-1) + 128).astype(np.uint8))
    assert len(raw) & 1
    wav = tmp_path / "odd.wav"
    wav.write_bytes(make_wav_header(len(pcm), 1, 8000, 8, 1)
                    + raw + b"\x00" + b"LIST\x04\x00\x00\x00INFO")
    wv = tmp_path / "odd.wv"
    assert main(["--encode", str(wav), "-o", str(wv), "-q"]) == 0
    back = tmp_path / "back.wav"
    assert main([str(wv), "-o", str(back), "-q"]) == 0
    assert back.read_bytes() == wav.read_bytes()


def test_cli_encode_errors_clean(tmp_path):
    from wvpk.cli import main
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFF\x10\x00\x00\x00WAVEfmt \x08\x00\x00\x00"
                    b"\x01\x00\x02\x00\x44\xac\x00\x00")
    assert main(["--encode", str(bad), "-o", str(tmp_path / "x.wv")]) == 1
    ok = tmp_path / "ok.wav"
    pcm = sig(200, 2)
    ok.write_bytes(make_wav_header(len(pcm), 2, 44100, 16, 2)
                   + pcm.astype("<i2").tobytes())
    assert main(["--encode", str(ok), "-o", str(tmp_path / "y.wv"),
                 "--block-samples", "0"]) == 1
    # -o with multiple inputs is an error, not a silent ignore
    assert main(["--encode", str(ok), str(ok),
                 "-o", str(tmp_path / "z.wv")]) == 2


def test_native_encoder_byte_identical():
    """The C fast path (wvpk/native/csrc/wvpk_encode.c) must produce
    byte-identical streams to the pure-Python encoder across the whole
    PCM mode matrix (zero-runs, false stereo, deep chains, int32
    re-expansion, float, hybrid incl. bitrate/balance)."""
    import wvpk.native as nv
    from wvpk.testgen.encoder import encode_file
    from wvpk.testgen.fuzzspec import random_pcm, random_spec
    if nv.get_encode_lib() is None:
        pytest.skip("no C compiler available")
    orig = nv.encode_block_native
    hybrids = 0
    try:
        for seed in range(26):
            rng = np.random.default_rng(410000 + seed)
            spec = random_spec(rng)
            if seed >= 20:  # force hybrid coverage in the fixed pool
                from dataclasses import replace
                spec = replace(spec, hybrid=True, hybrid_bitrate=seed & 1,
                               bitrate=200 + 37 * seed, int32_mode=None,
                               float_data=False, bytes_stored=2, shift=0)
            n = int(rng.integers(spec.block_samples // 2,
                                 spec.block_samples * 2 + 1))
            pcm = random_pcm(rng, n, spec.nch_data, spec)
            nv.encode_block_native = orig
            a = encode_file(pcm, spec)
            nv.encode_block_native = lambda *args, **kw: None
            b = encode_file(pcm, spec)
            assert a == b, f"seed {seed}: {spec}"
            hybrids += int(spec.hybrid)
    finally:
        nv.encode_block_native = orig
    assert hybrids >= 6


def test_native_encoder_rare_paths():
    """Crafted stress for the C encoder's rare arms: LIMIT_ONES gamma
    escape (tiny medians + huge residuals), long zero-runs, run churn
    with h0 chains, hybrid with spiky silence. Byte-identity + CRC."""
    import wvpk.native as nv
    from wvpk.testgen.encoder import EncodeSpec, encode_file
    if nv.get_encode_lib() is None:
        pytest.skip("no C compiler available")
    orig = nv.encode_block_native
    rng = np.random.default_rng(1)

    def both(pcm, spec):
        try:
            nv.encode_block_native = orig
            a = encode_file(pcm, spec)
            nv.encode_block_native = lambda *args, **kw: None
            b = encode_file(pcm, spec)
        finally:
            nv.encode_block_native = orig
        assert a == b
        oracle_decode(a)    # asserts crc/mute clean

    both(rng.integers(-30000, 30000, (600, 2)).astype(np.int64),
         EncodeSpec(block_samples=300, terms=(2,), deltas=(0,),
                    initial_medians=((3, 3, 3), (3, 3, 3))))
    pcm = np.zeros((12000, 2), np.int64)
    pcm[11000:] = rng.integers(-500, 500, (1000, 2))
    both(pcm, EncodeSpec(block_samples=12000, joint=True))
    both(np.where(rng.random((3000, 2)) < 0.8, 0,
                  rng.integers(-4, 4, (3000, 2))).astype(np.int64),
         EncodeSpec(block_samples=1000, terms=(18, 17), deltas=(2, 2)))
    pcm = np.zeros((5000, 1), np.int64)
    pcm[::97] = 20000
    both(pcm, EncodeSpec(block_samples=1000, mono=True, terms=(17,),
                         deltas=(2,), hybrid=True, bitrate=300,
                         initial_medians=((1, 1, 1), (0, 0, 0))))


def test_cli_encode_checksum_stamp(tmp_path):
    from wvpk.cli import main
    pcm = sig(900, 2, seed=16)
    wav = tmp_path / "c.wav"
    wav.write_bytes(make_wav_header(len(pcm), 2, 44100, 16, 2)
                    + pcm.astype("<i2").tobytes())
    wv = tmp_path / "c.wv"
    assert main(["--encode", str(wav), "-o", str(wv),
                 "--checksum-bytes", "2", "-q"]) == 0
    from wvpk.container import verify_file_checksums
    ok, bad, absent = verify_file_checksums(str(wv))
    assert (ok, bad, absent) == (1, 0, 0)


def test_cli_wav_roundtrip_byte_exact(tmp_path):
    from wvpk.cli import main
    pcm = sig(2500, 2, seed=10)
    wav = tmp_path / "in.wav"
    raw = pcm.astype("<i2").tobytes()
    wav.write_bytes(make_wav_header(len(pcm), 2, 44100, 16, 2) + raw)
    wv = tmp_path / "out.wv"
    assert main(["--encode", str(wav), "-o", str(wv), "-q"]) == 0
    back = tmp_path / "back.wav"
    assert main([str(wv), "-o", str(back), "-q", "--verify-md5"]) == 0
    assert back.read_bytes() == wav.read_bytes()
