"""MD5 integrity extension: ID_MD5_CHECKSUM storage + WavpackGetMD5Sum +
CLI --verify-md5.

The C# reference IGNORES this sub-block (MetadataUtils.cs:188-193
optional-data fallthrough) — decode behavior parity is preserved (the
digest never affects decode) — but real WavPack writers store it and
libwavpack exposes it, so wvpk surfaces it as an extension getter plus a
whole-file verification mode in the CLI."""

import hashlib

import numpy as np

from wvpk import api, consts
from wvpk.cli import decode_one
from wvpk.io.pcm import format_samples
from wvpk.testgen import EncodeSpec, encode_file
from wvpk.testgen.multichannel import encode_multichannel


def _pcm(n=1200, ch=2, seed=0, scale=3000):
    rng = np.random.default_rng(seed)
    return np.round(rng.normal(0, scale, (n, ch))).astype(np.int64)


def test_md5_getter_eager():
    pcm = _pcm()
    data = encode_file(pcm, EncodeSpec(block_samples=500, joint=True,
                                       md5=True))
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetErrorMessage(wpc) == ""
    want = hashlib.md5(format_samples(pcm, 2)).digest()
    assert api.WavpackGetMD5Sum(wpc) == want


def test_md5_mode_bit():
    data = encode_file(_pcm(seed=9), EncodeSpec(block_samples=600,
                                                md5=True))
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetMode(wpc) & consts.MODE_MD5
    plain = encode_file(_pcm(seed=9), EncodeSpec(block_samples=600))
    assert not (api.WavpackGetMode(api.WavpackOpenFileInput(plain))
                & consts.MODE_MD5)


def test_md5_getter_none_when_absent():
    data = encode_file(_pcm(), EncodeSpec(block_samples=500))
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetMD5Sum(wpc) is None


def test_md5_getter_streaming_lazy(tmp_path):
    pcm = _pcm(seed=1)
    p = tmp_path / "s.wv"
    p.write_bytes(encode_file(pcm, EncodeSpec(block_samples=300, md5=True)))
    wpc = api.WavpackOpenFileInput(str(p), streaming=True)
    assert wpc.streaming
    # the digest lives in the final (audio) block, which streaming open
    # does not parse — the getter fetches it lazily
    want = hashlib.md5(format_samples(pcm, 2)).digest()
    assert api.WavpackGetMD5Sum(wpc) == want


def test_cli_verify_md5_ok(tmp_path, capsys):
    pcm = _pcm(seed=2)
    p = tmp_path / "ok.wv"
    p.write_bytes(encode_file(pcm, EncodeSpec(block_samples=400, joint=True,
                                              md5=True)))
    rc = decode_one(str(p), str(tmp_path / "ok.wav"), verify_md5=True)
    assert rc == 0
    assert "MD5 verified" in capsys.readouterr().out


def test_cli_verify_md5_tampered(tmp_path, capsys):
    pcm = _pcm(seed=3)
    data = bytearray(encode_file(pcm, EncodeSpec(block_samples=400,
                                                 md5=True)))
    # flip one digest byte inside the ID_MD5_CHECKSUM sub-block (16-byte
    # payload -> TLV is [0x26, 0x08, digest...]); the block CRC covers
    # decoded samples, not metadata bytes, so decode itself stays clean
    idx = bytes(data).rfind(bytes([consts.ID_MD5_CHECKSUM, 8]))
    assert idx > 0
    data[idx + 2] ^= 0xFF
    p = tmp_path / "bad.wv"
    p.write_bytes(bytes(data))
    rc = decode_one(str(p), str(tmp_path / "bad.wav"), verify_md5=True)
    assert rc == 1
    assert "MD5 mismatch" in capsys.readouterr().err
    # without verification the file still decodes clean (reference parity:
    # the sub-block is decode-inert)
    assert decode_one(str(p), str(tmp_path / "bad2.wav")) == 0


def test_cli_verify_md5_missing(tmp_path, capsys):
    p = tmp_path / "none.wv"
    p.write_bytes(encode_file(_pcm(seed=4), EncodeSpec(block_samples=400)))
    rc = decode_one(str(p), str(tmp_path / "none.wav"), verify_md5=True)
    assert rc == 1
    assert "no MD5 checksum" in capsys.readouterr().err


def test_md5_multichannel_interleaved(tmp_path, capsys):
    pcm = _pcm(n=800, ch=6, seed=5, scale=2000)
    data = encode_multichannel(pcm, EncodeSpec(block_samples=400, joint=True,
                                               md5=True))
    wpc = api.WavpackOpenFileInput(data, flags=consts.OPEN_ALL_CHANNELS)
    want = hashlib.md5(format_samples(pcm, 2)).digest()
    assert api.WavpackGetMD5Sum(wpc) == want
    p = tmp_path / "mc.wv"
    p.write_bytes(data)
    assert decode_one(str(p), str(tmp_path / "mc.wav"),
                      verify_md5=True) == 0
