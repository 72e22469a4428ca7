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
