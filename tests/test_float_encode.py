"""Public float (FLOAT_DATA) encode surface.

The reference decodes float blocks to the clipped 24-bit int domain
(FloatUtils.cs:32-56) and never produces them; wvpk's public encode
accepts float32 content on a lossless grid f = i * 2**-k (see the
FLOAT_DATA grid note in wvpk/encode.py) and the decode-side float
formatter inverts it bit-exactly. These tests cover the grid
derivation, every public encode path (host, device, streaming,
multichannel), the CLI byte-exact WAV roundtrip, and the rejection
contract for content the grid cannot represent."""

import numpy as np
import pytest

from wvpk import api, consts
from wvpk.encode import (build_spec, encode, encode_device, encode_wav_file,
                         float_to_stored, merge_pcm_stats, pcm_stats)
from wvpk.io.wav import make_wav_header, read_wav


def grid_floats(n, ch, k, seed=0, span=23):
    """Random float32 on the 2**-k grid spanning `span` bits."""
    rng = np.random.default_rng(seed)
    i = rng.integers(-(1 << span) + 1, 1 << span, (n, ch))
    return (i.astype(np.float64) * 2.0 ** -k).astype(np.float32)


def decode_floats(wv):
    wpc = api.WavpackOpenFileInput(wv, flags=consts.OPEN_ALL_CHANNELS)
    assert not api.WavpackGetErrorMessage(wpc)
    assert api.WavpackGetIsFloat(wpc)
    ne = api.WavpackGetFloatNormExp(wpc)
    nch = api.WavpackGetNumChannels(wpc)
    buf = np.zeros(4096 * nch, np.int32)
    out = []
    while True:
        got = api.WavpackUnpackSamples(wpc, buf, 4096)
        if got <= 0:
            break
        out.append(api.WavpackFormatSamples(buf, got * nch, 4,
                                            float_norm_exp=ne))
    assert api.WavpackGetNumErrors(wpc) == 0
    return np.frombuffer(b"".join(out), "<f4").reshape(-1, nch)


def assert_bit_exact(dec, f):
    np.testing.assert_array_equal(dec.view(np.uint32), f.view(np.uint32))


def test_spec_derivation_grids():
    # 24-bit full-scale grid -> the conventional norm_exp 127
    f = grid_floats(300, 2, 23, seed=1)
    spec = build_spec(f)
    assert spec.float_data and spec.float_norm_exp == 127
    assert spec.float_max_exp == 127 and spec.float_shift == 0
    assert spec.bytes_stored == 4
    # coarser grid (integers scaled by 8) -> norm_exp 150 - (-3)
    fi = (np.arange(-40, 40, dtype=np.float64) * 8.0).astype(np.float32)
    spec = build_spec(fi)
    assert spec.float_norm_exp == 150 + 3
    # all zeros defaults to the full-scale grid
    spec = build_spec(np.zeros(16, np.float32))
    assert spec.float_norm_exp == 127


def test_float_to_stored_rejects_off_grid():
    with pytest.raises(ValueError, match="off the norm_exp grid"):
        float_to_stored(np.float32([0.5]), 150)  # k=0 grid, 0.5 off it


@pytest.mark.parametrize("bad,match", [
    (np.float32([1.0, np.nan]), "NaN or Inf"),
    (np.float32([np.inf]), "NaN or Inf"),
    (np.float32([-0.0, 1.0]), "-0.0"),
    (np.float32([1 / 3]), "24 bits of mantissa"),
    (np.float32([2.0 ** 30, 2.0 ** -10]), "24 bits of mantissa"),
])
def test_rejections(bad, match):
    with pytest.raises(ValueError, match=match):
        encode(bad)


def test_rejects_hybrid_and_float64():
    with pytest.raises(ValueError, match="hybrid float"):
        encode(grid_floats(64, 2, 23), hybrid=True)
    with pytest.raises(ValueError, match="float32"):
        encode(np.zeros(8, np.float64))


def test_host_roundtrip_stereo():
    f = grid_floats(9000, 2, 23, seed=2)
    assert_bit_exact(decode_floats(encode(f)), f)


def test_host_roundtrip_mono_and_false_stereo():
    fm = grid_floats(700, 1, 20, seed=3)
    assert_bit_exact(decode_floats(encode(fm)), fm)
    ffs = np.repeat(grid_floats(700, 1, 23, seed=4), 2, axis=1)
    spec = build_spec(ffs)
    assert spec.false_stereo
    assert_bit_exact(decode_floats(encode(ffs)), ffs)


def test_denormal_grid_roundtrip():
    # k = 140: values down in the denormal range still roundtrip
    f = grid_floats(500, 2, 140, seed=5)
    spec = build_spec(f)
    assert spec.float_norm_exp == 150 - 140
    assert_bit_exact(decode_floats(encode(f)), f)


def test_mixed_exponent_grid():
    f = np.stack([np.float32([0.5, 0.25, -1.5, 3.0, 0.0, 2.0 ** -20]),
                  np.float32([1.0, -0.75, 0.125, -2.0, 4.0, 0.5])], 1)
    wv = encode(f, block_samples=4)   # multi-block
    assert_bit_exact(decode_floats(wv), f)


def test_device_roundtrip():
    f = grid_floats(5000, 2, 23, seed=6)
    assert_bit_exact(decode_floats(encode_device(f, block_samples=1024)), f)


def test_multichannel_roundtrip():
    f = grid_floats(900, 4, 22, seed=7)
    assert_bit_exact(decode_floats(encode(f, block_samples=256)), f)


def test_randomized_grids():
    rng = np.random.default_rng(8)
    for case in range(6):
        k = int(rng.integers(-8, 140))
        n = int(rng.integers(50, 1500))
        ch = int(rng.integers(1, 3))
        f = grid_floats(n, ch, k, seed=100 + case,
                        span=int(rng.integers(4, 24)))
        assert_bit_exact(decode_floats(encode(f, block_samples=512)), f)


def _write_float_wav(path, f, rate=48000, trailer=b""):
    body = np.ascontiguousarray(f.astype("<f4")).tobytes()
    path.write_bytes(make_wav_header(f.shape[0], f.shape[1], rate, 32, 4,
                                     fmt_tag=3) + body + trailer)


def test_read_wav_float_tag():
    f = grid_floats(64, 2, 23, seed=9)
    blob = make_wav_header(64, 2, 44100, 32, 4, fmt_tag=3) \
        + np.ascontiguousarray(f.astype("<f4")).tobytes()
    pcm, rate, bits, header, trailer = read_wav(blob)
    assert pcm.dtype == np.float32 and bits == 32
    assert_bit_exact(pcm.reshape(-1, 2), f)


def test_cli_roundtrip_byte_exact(tmp_path):
    from wvpk.cli import main as cli_main
    f = grid_floats(12000, 2, 23, seed=10)
    src = tmp_path / "in.wav"
    _write_float_wav(src, f, trailer=b"LISTxtra")
    wv = tmp_path / "a.wv"
    out = tmp_path / "out.wav"
    assert cli_main(["--encode", str(src), "-o", str(wv), "-q"]) == 0
    assert cli_main([str(wv), "-o", str(out), "-q", "--verify-md5"]) == 0
    assert out.read_bytes() == src.read_bytes()


def test_streaming_split_roundtrips(tmp_path):
    f = grid_floats(10000, 2, 23, seed=11)
    src = tmp_path / "s.wav"
    _write_float_wav(src, f)
    want = src.read_bytes()
    from wvpk.cli import main as cli_main
    for device in (False, True):
        wv = tmp_path / f"s{device}.wv"
        out = tmp_path / f"s{device}.wav"
        encode_wav_file(str(src), str(wv), device=device,
                        window_samples=4096, block_samples=1024)
        assert cli_main([str(wv), "-o", str(out), "-q",
                         "--verify-md5"]) == 0
        assert out.read_bytes() == want


def test_float_stats_merge_matches_whole():
    f = grid_floats(3000, 2, 30, seed=12)
    whole = pcm_stats(f)
    st = None
    for lo in range(0, 3000, 700):
        st = merge_pcm_stats(st, pcm_stats(f[lo:lo + 700]))
    assert st == whole
