"""CLI end-to-end: .wv file -> .wav on disk, plus WAV emission checks."""

import struct

import numpy as np

from wvpk.cli import decode_one, main
from wvpk.io.wav import make_wav_header
from wvpk.testgen import EncodeSpec, encode_file


def _mk(tmp_path, pcm, spec, name="t.wv"):
    p = tmp_path / name
    p.write_bytes(encode_file(pcm, spec))
    return p


def test_cli_decodes_to_wav(tmp_path, capsys):
    rng = np.random.default_rng(0)
    pcm = np.round(rng.normal(0, 3000, (1000, 2))).astype(np.int64)
    src = _mk(tmp_path, pcm, EncodeSpec(block_samples=500, joint=True))
    out = tmp_path / "t.wav"
    rc = decode_one(str(src), str(out))
    assert rc == 0
    blob = out.read_bytes()
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    # locate data chunk: header is 44 bytes for our synthesized layout
    header = make_wav_header(1000, 2, 44100, 16, 2)
    assert blob[:len(header)] == header
    samples = np.frombuffer(blob[len(header):], "<i2").reshape(-1, 2)
    np.testing.assert_array_equal(samples, pcm)


def test_cli_main_multiple(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(2):
        pcm = np.round(rng.normal(0, 500, (300, 2))).astype(np.int64)
        paths.append(str(_mk(tmp_path, pcm,
                             EncodeSpec(block_samples=300), f"f{i}.wv")))
    assert main(paths + ["-q"]) == 0


def test_cli_batch_mode(tmp_path):
    rng = np.random.default_rng(3)
    paths, pcms = [], []
    for i in range(3):
        pcm = np.round(rng.normal(0, 1500, (400, 2))).astype(np.int64)
        pcms.append(pcm)
        paths.append(str(_mk(tmp_path, pcm,
                             EncodeSpec(block_samples=200, joint=True),
                             f"b{i}.wv")))
    assert main(paths + ["--batch", "-q"]) == 0
    for path, pcm in zip(paths, pcms):
        blob = open(path[:-3] + ".wav", "rb").read()
        got = np.frombuffer(blob[44:], "<i2").reshape(-1, 2)
        np.testing.assert_array_equal(got, pcm)


def test_cli_reports_crc_errors(tmp_path):
    rng = np.random.default_rng(2)
    pcm = np.round(rng.normal(0, 3000, (600, 2))).astype(np.int64)
    data = bytearray(encode_file(pcm, EncodeSpec(block_samples=300)))
    data[150] ^= 0xFF  # corrupt first block payload
    src = tmp_path / "bad.wv"
    src.write_bytes(bytes(data))
    rc = decode_one(str(src), str(tmp_path / "bad.wav"), quiet=True)
    assert rc == 1


def test_wav_header_fields():
    h = make_wav_header(44100, 2, 44100, 16, 2)
    assert len(h) == 44
    assert h[:4] == b"RIFF"
    fmt_tag, nch, rate, byps, align, bits = struct.unpack("<HHIIHH", h[20:36])
    assert (fmt_tag, nch, rate, bits) == (1, 2, 44100, 16)
    assert byps == 44100 * 4 and align == 4
    (dsz,) = struct.unpack("<I", h[40:44])
    assert dsz == 44100 * 4


def test_cli_raw_output(tmp_path):
    import numpy as np

    from wvpk.cli import main as cli_main
    from wvpk.testgen import EncodeSpec, encode_file

    rng = np.random.default_rng(11)
    pcm = np.round(rng.normal(0, 2000, (600, 2))).astype(np.int64)
    np.clip(pcm, -32768, 32767, out=pcm)
    wv = tmp_path / "r.wv"
    wv.write_bytes(encode_file(pcm, EncodeSpec(block_samples=256,
                                               joint=True)))
    out = tmp_path / "r.raw"
    assert cli_main([str(wv), "-o", str(out), "-q", "--raw"]) == 0
    got = np.frombuffer(out.read_bytes(), "<i2").reshape(-1, 2)
    np.testing.assert_array_equal(got, pcm)
