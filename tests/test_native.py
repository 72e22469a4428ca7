"""Native C host tier vs the pure-Python fallback."""

import numpy as np
import pytest

from wvpk.container.header import HEADER_SIZE, BlockHeader, read_next_header
from wvpk.native import get_lib, pack_streams_native, scan_headers_native
from wvpk.testgen import EncodeSpec, encode_file


def python_scan(data):
    out = []
    pos = 0
    while True:
        hdr = read_next_header(data, pos)
        if hdr is None:
            return out
        out.append(hdr)
        pos = hdr.stream_position + hdr.ck_size + 8


@pytest.fixture(scope="module")
def wv_data():
    pcm = np.round(np.random.default_rng(0).normal(0, 2000, (1500, 2))
                   ).astype(np.int64)
    return encode_file(pcm, EncodeSpec(block_samples=300, joint=True))


def test_native_lib_builds():
    assert get_lib() is not None, "cc toolchain present; native must build"


def test_scan_matches_python(wv_data):
    fields = scan_headers_native(b"JUNK" * 20 + wv_data)
    want = python_scan(b"JUNK" * 20 + wv_data)
    assert fields is not None and len(fields) == len(want) == 5
    for f, w in zip(fields, want):
        assert (int(f[0]), int(f[1]), int(f[2]), int(f[3]), int(f[4]),
                int(f[5]), int(f[6]), int(f[7])) == (
            w.ck_size, w.version, w.total_samples, w.block_index,
            w.block_samples, w.flags, w.crc, w.stream_position)


def test_scan_resync_garbage():
    assert len(scan_headers_native(bytes(5000))) == 0


def test_pack_streams_matches(wv_data):
    payloads = [b"abc", b"", bytes(range(256)), wv_data[:1000]]
    stride = ((max(len(p) for p in payloads) + 3) // 4 + 8) * 4
    out = pack_streams_native(payloads, stride)
    assert out is not None and out.shape == (4, stride)
    for i, p in enumerate(payloads):
        assert out[i, :len(p)].tobytes() == p
        assert (out[i, len(p):] == 0xFF).all()


def test_parse_block_native_differential():
    """Native metadata walk vs the Python decode_block_state, field for
    field, across randomized mode-matrix specs."""
    import numpy as np

    from wvpk.container.blockstate import decode_block_state
    from wvpk.container.header import scan_headers as py_scan
    from wvpk.container.metadata import iter_metadata
    from wvpk.native import parse_block_native
    from wvpk.container.blockstate import state_from_native
    from wvpk.testgen.fuzzspec import random_pcm, random_spec

    native_hits = 0
    fallbacks = 0
    for seed in range(16):
        rng = np.random.default_rng(4200 + seed)
        spec = random_spec(rng)
        n = int(rng.integers(spec.block_samples // 2,
                             spec.block_samples * 2 + 1))
        pcm = random_pcm(rng, n, spec.nch_data, spec)
        data = encode_file(pcm, spec)
        for hdr in py_scan(data):
            arr = parse_block_native(data, hdr.stream_position)
            if arr is None:
                fallbacks += 1
                continue
            native_hits += 1
            got, gup = state_from_native(hdr, arr, data)
            want, wup = decode_block_state(hdr, iter_metadata(data, hdr))
            assert got.num_terms == want.num_terms, (seed, spec)
            assert got.terms == want.terms
            assert got.deltas == want.deltas
            assert got.weights_a == want.weights_a
            assert got.weights_b == want.weights_b
            np.testing.assert_array_equal(got.samples_a, want.samples_a)
            np.testing.assert_array_equal(got.samples_b, want.samples_b)
            assert got.medians == want.medians
            assert got.slow_level == want.slow_level
            assert got.bitrate_acc == want.bitrate_acc
            assert got.bitrate_delta == want.bitrate_delta
            for f in ("float_flags", "float_shift", "float_max_exp",
                      "float_norm_exp", "float_min_shifted_zeros",
                      "float_max_shifted_ones", "int32_sent_bits",
                      "int32_zeros", "int32_ones", "int32_dups",
                      "int32_max_width", "crc_mvx", "wvx_start_bit",
                      "wvbits", "wvcbits", "wvxbits"):
                assert getattr(got, f) == getattr(want, f), (seed, f)
            assert gup.five == wup.five
    # the walk must actually engage on update-free blocks (first/last
    # blocks carry config/RIFF updates and legitimately fall back)
    assert native_hits >= 8
