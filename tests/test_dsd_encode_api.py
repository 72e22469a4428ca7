"""Public DSD encode surface (wvpk.encode.encode_dsd + DSF container).

Beyond reference parity (the C# reference decodes DSD, never produces
it): raw/fast/high DSD encode promoted from the test-vector tier to the
public API with MD5 stamping, alt-container header/trailer storage and
a DSF file CLI roundtrip that is byte-exact end to end."""

import numpy as np
import pytest

from wvpk import api, consts
from wvpk.encode import encode_dsd
from wvpk.io.dsf import (DsfRewriter, make_dsf, parse_dsf_header, read_dsf,
                         reverse_bits)


def decode_dsd(wv):
    wpc = api.WavpackOpenFileInput(wv)
    assert not api.WavpackGetErrorMessage(wpc)
    assert api.WavpackGetMode(wpc) & consts.MODE_DSD
    nch = api.WavpackGetNumChannels(wpc)
    buf = np.zeros(4096 * nch, np.int32)
    out = []
    while True:
        got = api.WavpackUnpackSamples(wpc, buf, 4096)
        if got <= 0:
            break
        out.append(api.WavpackFormatSamples(buf, got * nch, 1, dsd=True))
    assert api.WavpackGetNumErrors(wpc) == 0
    return np.frombuffer(b"".join(out), np.uint8).reshape(-1, nch), wpc


@pytest.mark.parametrize("mode", [0, 1, 3])
def test_roundtrip_stereo(mode):
    rng = np.random.default_rng(mode)
    data = rng.integers(0, 256, (9000, 2)).astype(np.uint8)
    dec, wpc = decode_dsd(encode_dsd(data, mode, block_samples=4096))
    np.testing.assert_array_equal(dec, data)
    # MD5 stamped over the native byte image
    import hashlib
    assert api.WavpackGetMD5Sum(wpc) == hashlib.md5(data.tobytes()).digest()


@pytest.mark.parametrize("mode", [0, 1, 3])
def test_roundtrip_mono(mode):
    rng = np.random.default_rng(10 + mode)
    data = rng.integers(0, 256, (3000, 1)).astype(np.uint8)
    dec, _ = decode_dsd(encode_dsd(data, mode, block_samples=1024))
    np.testing.assert_array_equal(dec, data)


def test_dsd_rate_mapping():
    data = np.zeros((100, 2), np.uint8)
    wpc = decode_dsd(encode_dsd(data, 0, dsd_rate=2822400))[1]
    # native samples = byte-samples * 8 bits (WavPackUtils.cs:346-350)
    assert api.WavpackGetNumSamples(wpc, native=True) == 800
    with pytest.raises(ValueError, match="does not factor"):
        encode_dsd(data, 0, dsd_rate=2822401)


def test_rejections():
    with pytest.raises(ValueError, match="mode"):
        encode_dsd(np.zeros((10, 2), np.uint8), 2)
    with pytest.raises(ValueError, match="mono/stereo"):
        encode_dsd(np.zeros((10, 3), np.uint8))
    with pytest.raises(ValueError, match="0..255"):
        encode_dsd(np.full((10, 1), 300, np.int64))
    with pytest.raises(ValueError, match="empty"):
        encode_dsd(np.zeros((0, 2), np.uint8))


def test_block_checksum_stamped():
    from wvpk.container.checksum import verify_file_checksums as \
        verify_block_checksums
    data = np.random.default_rng(4).integers(0, 256, (2000, 2)) \
        .astype(np.uint8)
    wv = encode_dsd(data, 1, block_samples=512, block_checksum=2)
    ok, bad, absent = verify_block_checksums(wv)
    assert ok > 0 and bad == 0 and absent == 0
    np.testing.assert_array_equal(decode_dsd(wv)[0], data)


def test_dsf_io_roundtrip():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, (5000 + 13, 2)).astype(np.uint8)
    blob = make_dsf(data, 2822400, trailer=b"ID3trailer")
    rdata, rate, header, trailer = read_dsf(blob)
    np.testing.assert_array_equal(rdata, data)
    assert rate == 2822400 and trailer == b"ID3trailer"
    ch, hrate, bits, count, bsz = parse_dsf_header(header)
    assert (ch, hrate, bits, count, bsz) == (2, 2822400, 1,
                                             data.shape[0] * 8, 4096)


def test_reverse_bits_involution():
    v = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(reverse_bits(reverse_bits(v)), v)
    assert reverse_bits(np.uint8([0b10000000]))[0] == 1


def test_dsf_rewriter_matches_make_dsf():
    rng = np.random.default_rng(6)
    data = rng.integers(0, 256, (9000 + 77, 2)).astype(np.uint8)
    import io
    f = io.BytesIO()
    w = DsfRewriter(f, 2, 4096)
    for lo in range(0, len(data), 700):      # uneven chunks
        w.append(data[lo:lo + 700])
    w.finish()
    whole = make_dsf(data, 2822400)
    _, _, header, _ = read_dsf(whole)
    assert header + f.getvalue() == whole


@pytest.mark.parametrize("mode,chs,rate", [(0, 2, 2822400),
                                           (1, 2, 2822400),
                                           (3, 1, 5644800)])
def test_cli_dsf_roundtrip_byte_exact(tmp_path, mode, chs, rate):
    from wvpk.cli import main as cli_main
    rng = np.random.default_rng(20 + mode)
    data = rng.integers(0, 256, (6000 + 13, chs)).astype(np.uint8)
    dsf = make_dsf(data, rate, trailer=b"tagdata")
    src = tmp_path / "a.dsf"
    src.write_bytes(dsf)
    wv = tmp_path / "a.wv"
    out = tmp_path / "out.dsf"
    assert cli_main(["--encode", str(src), "-o", str(wv), "-q",
                     "--dsd-mode", str(mode)]) == 0
    assert cli_main([str(wv), "-o", str(out), "-q", "--verify-md5"]) == 0
    assert out.read_bytes() == dsf
