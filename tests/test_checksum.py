"""Block-checksum extension: ID_BLOCK_CHECKSUM emit / verify / CLI audit.

The C# reference parses the item only to set the WavPack-5 flag
(MetadataUtils.cs:184-186) and never validates it; decode behavior parity
is preserved (a checksummed file decodes identically, and a WRONG checksum
does not disturb decode). Verification is an opt-in audit, modeled on
libwavpack 5's csum*3+word fold (container/checksum.py)."""

import numpy as np
import pytest

from wvpk import api, consts
from wvpk.cli import main as cli_main
from wvpk.container import (add_block_checksum, iter_metadata,
                            read_next_header, verify_block_checksum,
                            verify_file_checksums)
from wvpk.container.checksum import compute_block_checksum
from wvpk.testgen import EncodeSpec, encode_file
from wvpk.testgen.dsd_encoder import encode_dsd_file


def _pcm(n=1100, ch=2, seed=0, scale=3000):
    rng = np.random.default_rng(seed)
    return np.round(rng.normal(0, scale, (n, ch))).astype(np.int64)


def _unpack_all(data):
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetErrorMessage(wpc) == ""
    nch = api.WavpackGetNumChannels(wpc)
    buf = np.zeros(4096 * nch, np.int32)
    out = []
    while True:
        got = api.WavpackUnpackSamples(wpc, buf, 4096)
        if got <= 0:
            break
        out.append(buf[:got * nch].copy())
    return np.concatenate(out), api.WavpackGetNumErrors(wpc)


def test_fold_matches_scalar_reference():
    # the vectorized power-of-3 fold vs the definitional sequential loop
    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 3, 17, 400):
        raw = bytes(rng.integers(0, 256, 2 * n, dtype=np.uint8))
        csum = 0xFFFFFFFF
        for i in range(n):
            word = raw[2 * i] | (raw[2 * i + 1] << 8)
            csum = (csum * 3 + word) & 0xFFFFFFFF
        assert compute_block_checksum(raw, 0, 2 * n) == csum


@pytest.mark.parametrize("width", [2, 4])
def test_roundtrip_and_decode_parity(width):
    pcm = _pcm()
    plain = encode_file(pcm, EncodeSpec(block_samples=400, joint=True))
    summed = encode_file(pcm, EncodeSpec(block_samples=400, joint=True,
                                         block_checksum=width))
    ok, bad, absent = verify_file_checksums(summed)
    assert (ok, bad, absent) == (3, 0, 0)
    assert verify_file_checksums(plain) == (0, 0, 3)
    # decode semantics are unchanged by the extra item (incl. through the
    # native C block parser the open path uses)
    a, ea = _unpack_all(plain)
    b, eb = _unpack_all(summed)
    assert ea == eb == 0
    np.testing.assert_array_equal(a, b)


def test_corruption_detected_and_decode_undisturbed():
    pcm = _pcm(seed=3)
    data = bytearray(encode_file(pcm, EncodeSpec(block_samples=500,
                                                 block_checksum=4)))
    hdr = read_next_header(bytes(data), 0)
    # flip one bit in the middle of the first block's metadata region
    data[hdr.stream_position + 60] ^= 0x10
    ok, bad, absent = verify_file_checksums(bytes(data))
    assert bad >= 1
    # ... and a WRONG stored checksum must not disturb decode: corrupt the
    # checksum payload itself (last 4 bytes of the final block)
    clean = bytearray(encode_file(pcm, EncodeSpec(block_samples=500,
                                                  block_checksum=4)))
    clean[-1] ^= 0xFF
    assert verify_file_checksums(bytes(clean))[1] >= 1
    got, errs = _unpack_all(bytes(clean))
    assert errs == 0
    np.testing.assert_array_equal(got.reshape(-1, 2), pcm)


def test_checksum_item_is_last_and_cksize_consistent():
    blk = encode_file(_pcm(n=300, seed=5),
                      EncodeSpec(block_samples=300, block_checksum=2))
    hdr = read_next_header(blk, 0)
    items = iter_metadata(blk, hdr)  # raises on any ckSize mismatch
    assert items[-1].id == consts.ID_BLOCK_CHECKSUM
    assert len(items[-1].data) == 2
    assert verify_block_checksum(blk, hdr, items) is True
    # absence reports None, not False
    plain = encode_file(_pcm(n=300, seed=5), EncodeSpec(block_samples=300))
    assert verify_block_checksum(plain) is None


def test_add_block_checksum_on_dsd_blocks():
    rng = np.random.default_rng(11)
    dsd = rng.integers(0, 256, (2048, 2), dtype=np.int64)
    for mode in (1, 3):
        data = encode_dsd_file(dsd, mode=mode, block_samples=1024,
                               block_checksum=2 if mode == 1 else 4)
        ok, bad, absent = verify_file_checksums(data)
        assert (bad, absent) == (0, 0) and ok >= 2
        got, errs = _unpack_all(data)
        assert errs == 0
        np.testing.assert_array_equal(got.reshape(-1, 2), dsd)


def test_five_flag_set_by_checksum_item():
    # reference parity: the item's only decode-visible effect is `five`
    data = encode_file(_pcm(n=256, seed=8),
                       EncodeSpec(block_samples=256, block_checksum=4))
    wpc = api.WavpackOpenFileInput(data)
    assert api.WavpackGetIsFive(wpc)


def test_multichannel_checksums_stamped_last(tmp_path):
    # segment-flag rewrite + channel-info injection happen after
    # encode_block, so multichannel must stamp checksums last
    from wvpk.testgen.multichannel import encode_multichannel
    pcm = _pcm(n=700, ch=6, seed=13, scale=2000)
    data = encode_multichannel(pcm, EncodeSpec(block_samples=256,
                                               block_checksum=4))
    ok, bad, absent = verify_file_checksums(data)
    assert bad == 0 and absent == 0 and ok >= 9  # 3 segments x 3 blocks
    # path-based (mmap) audit agrees with the in-memory one
    p = tmp_path / "mc.wv"
    p.write_bytes(data)
    assert verify_file_checksums(str(p)) == (ok, bad, absent)


def test_api_verify_block_checksums(tmp_path):
    data = encode_file(_pcm(seed=21), EncodeSpec(block_samples=550,
                                                 block_checksum=2))
    assert api.WavpackVerifyBlockChecksums(data) == (2, 0, 0)
    p = tmp_path / "a.wv"
    p.write_bytes(data)
    assert api.WavpackVerifyBlockChecksums(str(p)) == (2, 0, 0)
    assert api.WavpackVerifyBlockChecksums(p) == (2, 0, 0)  # PathLike
    with open(p, "rb") as f:  # file-like
        assert api.WavpackVerifyBlockChecksums(f) == (2, 0, 0)


def test_cli_verify_checksums(tmp_path, capsys):
    good = tmp_path / "good.wv"
    good.write_bytes(encode_file(_pcm(seed=2),
                                 EncodeSpec(block_samples=600,
                                            block_checksum=4)))
    assert cli_main(["--verify-checksums", str(good)]) == 0
    assert "2 block checksums ok, 0 bad" in capsys.readouterr().out

    raw = bytearray(good.read_bytes())
    raw[40] ^= 0x01
    badf = tmp_path / "bad.wv"
    badf.write_bytes(bytes(raw))
    assert cli_main(["--verify-checksums", str(badf)]) == 1
    assert "1 bad" in capsys.readouterr().err
