"""Opt-in lossy float32 encode (float_lossy=True).

Off-grid float content quantizes to the nearest representable
FLOAT_DATA grid (the reference's restore is shift+clip only,
FloatUtils.cs:32-56, so the encoder must pick a grid the int domain
captures); the stream is stamped CONFIG_LOSSY_MODE so WavpackGetMode
never reports MODE_LOSSLESS, and decode restores the quantized grid
exactly.
"""

import io

import numpy as np
import pytest

from wvpk import api, consts
from wvpk.container import parse_blocks
from wvpk.encode import encode, float_grid_info, float_to_stored
from wvpk.ref import decode_block


def _decode_floats(wv: bytes):
    blocks = parse_blocks(wv)
    outs = [decode_block(b.state) for b in blocks]
    assert not any(o.crc_error or o.mute_error for o in outs)
    stored = np.concatenate([o.samples for o in outs])
    ne = blocks[0].state.float_norm_exp
    return stored.astype(np.float64) * 2.0 ** (ne - 150), ne


def test_off_grid_rejected_without_flag():
    f = np.random.default_rng(0).normal(0, 0.3, (2000, 2)) \
        .astype(np.float32)
    with pytest.raises(ValueError, match="float_lossy"):
        encode(f)


@pytest.mark.parametrize("scale", [0.3, 123.4, 1e-6, 1e20])
def test_quantization_within_half_step(scale):
    rng = np.random.default_rng(int(abs(np.log10(scale))) + 1)
    f = (rng.normal(0, scale, (6000, 2))).astype(np.float32)
    gi = float_grid_info(f)
    assert not gi["lossless"]
    wv = encode(f, float_lossy=True)
    restored, ne = _decode_floats(wv)
    assert ne == gi["norm_exp"]
    err = np.abs(restored.reshape(f.shape) - f).max()
    assert err <= gi["grid_step"] / 2 + 1e-300
    assert err <= gi["max_error"] + 1e-300


def test_mode_reports_lossy():
    f = np.random.default_rng(1).normal(0, 0.5, (3000, 2)) \
        .astype(np.float32)
    wv = encode(f, float_lossy=True)
    wpc = api.WavpackOpenFileInput(io.BytesIO(wv))
    assert not (api.WavpackGetMode(wpc) & consts.MODE_LOSSLESS)
    assert api.WavpackGetMode(wpc) & consts.MODE_FLOAT


def test_on_grid_stays_lossless_with_flag():
    rng = np.random.default_rng(2)
    g = (np.round(rng.normal(0, 9000, (4000, 2))) / 32768.0) \
        .astype(np.float32)
    wv = encode(g, float_lossy=True)
    restored, _ = _decode_floats(wv)
    assert np.array_equal(restored.reshape(g.shape), g.astype(np.float64))
    wpc = api.WavpackOpenFileInput(io.BytesIO(wv))
    assert api.WavpackGetMode(wpc) & consts.MODE_LOSSLESS


def test_negative_zero_tolerated_lossy():
    h = np.zeros((64, 2), np.float32)
    h.view(np.uint32)[3, 0] = 0x80000000            # -0.0
    with pytest.raises(ValueError):
        encode(h)
    restored, _ = _decode_floats(encode(h, float_lossy=True))
    assert (restored == 0).all()


def test_decode_restores_quantized_grid_exactly():
    """Second encode of the decoded (on-grid) image must be lossless
    and bit-identical in the stored domain."""
    f = np.random.default_rng(3).normal(0, 0.2, (2500, 2)) \
        .astype(np.float32)
    wv = encode(f, float_lossy=True)
    restored, ne = _decode_floats(wv)
    again = restored.reshape(f.shape).astype(np.float32)
    wv2 = encode(again)                              # no flag needed
    restored2, _ = _decode_floats(wv2)
    np.testing.assert_array_equal(restored2, restored)


def test_float_to_stored_lossy_clips_24bit():
    f = np.asarray([[3e38], [-3e38], [0.1]], np.float32)
    st = float_to_stored(f, 255, lossy=True)
    assert int(np.abs(st).max()) <= 8388607


def test_device_encoder_lossy_float_matches_host_grid():
    jax = pytest.importorskip("jax")
    from wvpk.encode import encode_device
    f = np.random.default_rng(4).normal(0, 0.4, (1024, 2)) \
        .astype(np.float32)
    wv_d = encode_device(f, float_lossy=True, block_samples=512, warmup=0)
    restored_d, ne_d = _decode_floats(wv_d)
    restored_h, ne_h = _decode_floats(encode(f, float_lossy=True,
                                             block_samples=512))
    assert ne_d == ne_h
    np.testing.assert_array_equal(restored_d, restored_h)
    wpc = api.WavpackOpenFileInput(io.BytesIO(wv_d))
    assert not (api.WavpackGetMode(wpc) & consts.MODE_LOSSLESS)


def test_streaming_wav_file_lossy(tmp_path):
    from wvpk.encode import encode_wav_file
    from wvpk.io.wav import make_wav_header
    rng = np.random.default_rng(5)
    f = rng.normal(0, 0.3, (5000, 2)).astype(np.float32)
    hdr = make_wav_header(len(f), 2, 44100, 32, 4, fmt_tag=3)
    wav = tmp_path / "in.wav"
    wav.write_bytes(hdr + f.astype("<f4").tobytes())
    out = tmp_path / "out.wv"
    encode_wav_file(str(wav), str(out), float_lossy=True,
                    window_samples=2048, block_samples=512)
    restored, _ = _decode_floats(out.read_bytes())
    err = np.abs(restored.reshape(f.shape) - f).max()
    assert err <= float_grid_info(f)["grid_step"] / 2
    wpc = api.WavpackOpenFileInput(io.BytesIO(out.read_bytes()))
    assert not (api.WavpackGetMode(wpc) & consts.MODE_LOSSLESS)


def test_cli_float_lossy(tmp_path, capsys):
    from wvpk.cli import main as cli_main
    from wvpk.io.wav import make_wav_header
    rng = np.random.default_rng(6)
    f = rng.normal(0, 0.25, (3000, 2)).astype(np.float32)
    hdr = make_wav_header(len(f), 2, 44100, 32, 4, fmt_tag=3)
    wav = tmp_path / "in.wav"
    wav.write_bytes(hdr + f.astype("<f4").tobytes())
    out = tmp_path / "out.wv"
    # without the flag: clear error, exit 1
    assert cli_main(["--encode", str(wav), "-o", str(out)]) == 1
    assert "float_lossy" in capsys.readouterr().err
    # with the flag: encodes, prints the quantization note
    assert cli_main(["--encode", "--float-lossy", str(wav),
                     "-o", str(out)]) == 0
    assert "quantizing" in capsys.readouterr().out
    restored, _ = _decode_floats(out.read_bytes())
    assert np.abs(restored.reshape(f.shape) - f).max() \
        <= float_grid_info(f)["grid_step"] / 2
