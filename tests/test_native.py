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


# ---------------------------------------------------------------------------
# native DSD stream coders (modes 1/3) vs the pure-Python differential
# oracle (testgen/dsd_encoder.py; inverses of DsdUtils.cs:244-304,391-493)
# ---------------------------------------------------------------------------

def _signal(rng, n, kind):
    if kind == "random":
        return rng.integers(0, 256, n).astype(np.int64)
    if kind == "tone":
        base = (128 + 110 * np.sin(np.arange(n) / 13.0)).astype(np.int64)
        return np.clip(base + rng.integers(-9, 10, n), 0, 255)
    return np.full(n, 0x55, np.int64)        # DSD silence idiom


@pytest.mark.parametrize("mono", [True, False])
@pytest.mark.parametrize("bits", [1, 2, 3, 5])
@pytest.mark.parametrize("kind", ["random", "tone", "silence"])
def test_dsd_fast_native_matches_python(mono, bits, kind):
    from wvpk.native import dsd_encode_fast_native
    from wvpk.testgen.dsd_encoder import (_build_fast_tables,
                                          _encode_fast_stream_py)
    rng = np.random.default_rng(bits * 7 + (0 if mono else 1))
    bins = 1 << bits
    nch = 1 if mono else 2
    data = _signal(rng, 1200 * nch, kind)
    probs = _build_fast_tables(data, bins, mono)
    summed = np.cumsum(probs.astype(np.int64), axis=1)
    nat = dsd_encode_fast_native(data, probs, summed, bins, mono)
    assert nat is not None, "cc present; native DSD fast coder must build"
    assert nat == _encode_fast_stream_py(data.tolist(), probs, summed,
                                         bins, mono)


@pytest.mark.parametrize("mono", [True, False])
@pytest.mark.parametrize("kind", ["random", "tone", "silence"])
def test_dsd_high_native_matches_python(mono, kind):
    from wvpk.container.blockstate import _init_ptable
    from wvpk.native import dsd_encode_high_native
    from wvpk.testgen.dsd_encoder import PRECISION, _encode_high_stream_py
    rng = np.random.default_rng(11 if mono else 12)
    nch = 1 if mono else 2
    data = _signal(rng, 1024 * nch, kind)
    ptable = _init_ptable(10, 20)
    filters_init = np.zeros((2, 8), np.int64)
    filters_init[:, :5] = 0x80 << (PRECISION - 8)
    nat = dsd_encode_high_native(data, filters_init[:nch], ptable, nch)
    assert nat is not None, "cc present; native DSD high coder must build"
    assert nat == _encode_high_stream_py(data, filters_init, ptable, mono)


def test_dsd_histogram_vectorized_matches_scalar_chain():
    from wvpk.testgen.dsd_encoder import _build_fast_tables
    rng = np.random.default_rng(3)
    for mono in (True, False):
        for bits in (1, 3, 5):
            bins = 1 << bits
            data = rng.integers(0, 256, 4000).astype(np.int64)
            probs_scalar = np.zeros((bins, 256), np.int64)
            p0 = p1 = 0
            for code in data.tolist():
                probs_scalar[p0, code] += 1
                if mono:
                    p0 = code & (bins - 1)
                else:
                    p0, p1 = p1, code & (bins - 1)
            # _build_fast_tables scales after histogramming; redo only
            # the histogram comparison through its internals
            lag = 1 if mono else 2
            bin_idx = np.zeros(data.size, np.int64)
            bin_idx[lag:] = data[:-lag] & (bins - 1)
            probs_vec = np.zeros((bins, 256), np.int64)
            np.add.at(probs_vec, (bin_idx, data), 1)
            np.testing.assert_array_equal(probs_vec, probs_scalar)


def test_dsd_closed_form_crc_matches_oracle_stamp(monkeypatch):
    """The closed-form CRC stamp must equal the decode-and-stamp path
    (WVPK_DSD_ORACLE_STAMP) for every mode."""
    import os
    from wvpk.testgen.dsd_encoder import encode_dsd_file
    rng = np.random.default_rng(5)
    d = rng.integers(0, 256, (2048, 2)).astype(np.int64)
    for mode in (0, 1, 3):
        monkeypatch.delenv("WVPK_DSD_ORACLE_STAMP", raising=False)
        fast = encode_dsd_file(d, mode, history_bits=2)
        monkeypatch.setenv("WVPK_DSD_ORACLE_STAMP", "1")
        slow = encode_dsd_file(d, mode, history_bits=2)
        assert fast == slow, f"mode {mode} stamp divergence"
