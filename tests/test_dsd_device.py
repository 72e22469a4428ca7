"""Device DSD kernels vs oracle (modes 0/1/3, mono/stereo, corrupt)."""

import numpy as np
import pytest

from wvpk.container import parse_blocks
from wvpk.engine import decode_bytes
from wvpk.ref import decode_block
from wvpk.testgen import encode_dsd_file


def dsd_bytes(n, ch, seed):
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, size=(n, ch))
    runs = r.choice([0x55, 0xAA, 0x33, 0x0F], size=(n, ch))
    pick = r.random((n, ch)) < 0.7
    return np.where(pick, runs, base).astype(np.int64)


def compare(data: bytes):
    blocks, dev = decode_bytes(data)
    for blk, d in zip(blocks, dev):
        want = decode_block(blk.state)
        np.testing.assert_array_equal(d.samples, want.samples)
        assert d.mute_error == want.mute_error
        if not want.mute_error:
            assert d.crc == want.crc


@pytest.mark.parametrize("mode", [0, 1, 3])
@pytest.mark.parametrize("mono", [False, True])
def test_dsd_device_modes(mode, mono):
    ch = 1 if mono else 2
    kw = {"history_bits": 2} if mode == 1 else {}
    compare(encode_dsd_file(dsd_bytes(500, ch, mode * 2 + mono), mode,
                            mono=mono, **kw))


def test_dsd_device_multiblock_mixed():
    a = encode_dsd_file(dsd_bytes(600, 2, 10), 1, mono=False,
                        block_samples=200, history_bits=1)
    b = encode_dsd_file(dsd_bytes(300, 2, 11), 3, mono=False)
    compare(a + b)


def test_dsd_device_corrupt_mutes():
    data = bytearray(encode_dsd_file(dsd_bytes(400, 2, 12), 1, mono=False,
                                     history_bits=2))
    data[-40] ^= 0xFF
    compare(bytes(data))


def test_dsd_device_raw_corrupt():
    data = bytearray(encode_dsd_file(dsd_bytes(300, 2, 13), 0, mono=False))
    data[-10] ^= 0x01
    compare(bytes(data))
