"""DSD roundtrip: bytes -> encode (mode 0/1/3) -> oracle decode -> bytes."""

import numpy as np
import pytest

from wvpk.container import parse_blocks
from wvpk.ref import decode_block
from wvpk.testgen import encode_dsd_file


def rt(data, mode, mono, **kw):
    wv = encode_dsd_file(data, mode, mono=mono, **kw)
    outs = []
    for b in parse_blocks(wv):
        res = decode_block(b.state)
        assert not res.mute_error, "DSD mute (crc or coder mismatch)"
        outs.append(res.samples)
    out = np.concatenate(outs)
    if data.ndim == 1:
        data = data[:, None]
    np.testing.assert_array_equal(out, data.astype(np.int32))


def dsd_bytes(n, ch, seed):
    # biased bit patterns like real DSD (not uniform)
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, size=(n, ch))
    runs = r.choice([0x55, 0xAA, 0x33, 0x0F], size=(n, ch))
    pick = r.random((n, ch)) < 0.7
    return np.where(pick, runs, base).astype(np.int64)


@pytest.mark.parametrize("mono", [False, True])
def test_dsd_raw(mono):
    ch = 1 if mono else 2
    rt(dsd_bytes(600, ch, 1), 0, mono)


@pytest.mark.parametrize("mono", [False, True])
@pytest.mark.parametrize("history_bits", [0, 1, 3])
def test_dsd_fast(mono, history_bits):
    ch = 1 if mono else 2
    rt(dsd_bytes(400, ch, 2 + history_bits), 1, mono,
       history_bits=history_bits)


@pytest.mark.parametrize("mono", [False, True])
def test_dsd_high(mono):
    ch = 1 if mono else 2
    rt(dsd_bytes(300, ch, 5), 3, mono)


def test_dsd_multi_block():
    rt(dsd_bytes(900, 2, 6), 1, False, block_samples=300)


def test_dsd_raw_multi_block():
    rt(dsd_bytes(800, 2, 7), 0, False, block_samples=256)


def test_dsd_multiplier_byte_wraps_mod32():
    """A corrupt multiplier-exponent byte > 31 wraps mod 32 like the C#
    uint shift (DsdUtils.cs:34: 1U << data[0]) instead of erroring; the
    payload decode is unaffected."""
    from wvpk.container import parse_blocks
    from wvpk.engine import decode_states
    from wvpk.ref import decode_block
    data = bytearray(encode_dsd_file(dsd_bytes(256, 2, 50), 1, mono=False,
                                     history_bits=1))
    idx = bytes(data).find(bytes([0x03, 0x01]))  # exponent 3, mode 1
    assert idx > 0
    data[idx] = 37  # 37 & 31 = 5
    st = parse_blocks(bytes(data))[0].state
    assert st.dsd.multiplier == 32
    dev = decode_states([st])[0]
    np.testing.assert_array_equal(dev.samples, decode_block(st).samples)
    assert not dev.crc_error
