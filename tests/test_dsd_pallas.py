"""Pallas DSD high-mode kernel (interpret mode on CPU) vs the XLA kernel."""

import numpy as np

from wvpk.container import parse_blocks
from wvpk.engine.dsd_pipeline import _pad_bytes, _profile
from wvpk.ops.dsd import dsd_high_decode
from wvpk.ops.dsd_pallas import dsd_high_decode_pallas
from wvpk.testgen import encode_dsd_file


def check(nsamp, mono, seed, lanes=3):
    rng = np.random.default_rng(seed)
    ch = 1 if mono else 2
    states = []
    for _ in range(lanes):
        d = rng.integers(0, 256, (nsamp, ch))
        data = encode_dsd_file(d.astype(np.int64), 3, mono=mono)
        states += [b.state for b in parse_blocks(data)
                   if b.state.header.block_samples]
    sts = [st for st in states if _profile(st).mode == 3]
    prof = _profile(sts[0])
    data = _pad_bytes([st.dsd.data for st in sts], prof.nbytes_cap)
    nbytes = np.asarray([len(st.dsd.data) for st in sts], np.int64)
    ptable = np.stack([st.dsd.ptable for st in sts]).astype(np.int32)
    filters = np.stack([st.dsd.filters for st in sts]).astype(np.int32)
    value0 = np.asarray([st.dsd.value for st in sts], np.uint32)
    nsamples = np.asarray([st.header.block_samples for st in sts], np.int32)

    want_out, want_crc = dsd_high_decode(
        data, nbytes, ptable, filters, value0.astype(np.int64),
        nsamples, mono=mono, nsteps=prof.nsteps)
    got_out, got_crc = dsd_high_decode_pallas(
        data, nbytes, ptable, filters,
        value0.view(np.int32) if value0.dtype == np.uint32 else value0,
        nsamples, mono=mono, nsteps=prof.nsteps, interpret=True)
    np.testing.assert_array_equal(np.asarray(want_out), np.asarray(got_out))
    np.testing.assert_array_equal(np.asarray(want_crc), np.asarray(got_crc))
    # hard gate: CRCs must also match the headers (clean corpus)
    hdr = np.asarray([st.header.crc for st in sts], np.int32)
    np.testing.assert_array_equal(np.asarray(got_crc), hdr)


def test_high_stereo():
    check(700, mono=False, seed=1)


def test_high_mono():
    check(500, mono=True, seed=2)


def test_high_chunk_boundary():
    # block larger than the kernel's 256-step chunk
    check(300, mono=False, seed=3, lanes=2)
