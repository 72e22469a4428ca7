"""Pallas DSD kernels (interpret mode on CPU) vs the XLA kernels."""

import numpy as np

from wvpk.container import parse_blocks
from wvpk.engine.dsd_pipeline import _pad_bytes, _profile
from wvpk.ops.dsd import dsd_fast_decode, dsd_high_decode
from wvpk.ops.dsd_pallas import dsd_fast_decode_pallas, dsd_high_decode_pallas
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


def check_fast(nsamp, mono, seed, history_bits, lanes=3, smooth=False):
    rng = np.random.default_rng(seed)
    ch = 1 if mono else 2
    states = []
    for _ in range(lanes):
        if smooth:
            # low-entropy bytes: big probability skew, exercises the
            # interval-reset (mult == 0) path more often
            d = (rng.integers(0, 4, (nsamp, ch)) * 0x55) & 0xFF
        else:
            d = rng.integers(0, 256, (nsamp, ch))
        data = encode_dsd_file(d.astype(np.int64), 1, mono=mono,
                               history_bits=history_bits)
        states += [b.state for b in parse_blocks(data)
                   if b.state.header.block_samples]
    sts = [st for st in states if _profile(st).mode == 1]
    prof = _profile(sts[0])
    B = prof.bins
    data = _pad_bytes([st.dsd.data for st in sts], prof.nbytes_cap)
    nbytes = np.asarray([len(st.dsd.data) for st in sts], np.int64)
    summed = np.stack([st.dsd.summed_probabilities.astype(np.int32)
                       .reshape(-1) for st in sts])
    probs = np.stack([st.dsd.probabilities.astype(np.int32).reshape(-1)
                      for st in sts])
    vlook = np.stack([st.dsd.value_lookup.astype(np.int32) for st in sts])
    lookup = np.zeros((len(sts), prof.lookup_cap), np.int32)
    for k, st in enumerate(sts):
        lookup[k, :st.dsd.lookup_buffer.size] = st.dsd.lookup_buffer
    value0 = np.asarray([st.dsd.value for st in sts], np.uint32)
    nsamples = np.asarray([st.header.block_samples for st in sts], np.int32)
    nvals = nsamples * (1 if mono else 2)

    want_out, want_err, want_crc = dsd_fast_decode(
        data, nbytes, summed, probs, vlook, lookup, value0.astype(np.int64),
        np.full(len(sts), B, np.int64), nvals, mono=mono,
        nsteps=prof.nsteps)
    got_out, got_err, got_crc = dsd_fast_decode_pallas(
        data, nbytes, summed, value0.view(np.int32), nvals, bins=B,
        mono=mono, nsteps=prof.nsteps, interpret=True)
    assert not np.asarray(want_err).any()
    assert not np.asarray(got_err).any()
    # mask padding steps (XLA freezes at 0 as well, but be explicit)
    mask = np.arange(prof.nsteps)[:, None] < nvals[None, :]
    np.testing.assert_array_equal(np.asarray(want_out) * mask,
                                  np.asarray(got_out) * mask)
    np.testing.assert_array_equal(np.asarray(want_crc), np.asarray(got_crc))
    hdr = np.asarray([st.header.crc for st in sts], np.int32)
    np.testing.assert_array_equal(np.asarray(got_crc), hdr)


def test_fast_stereo_bins2():
    check_fast(700, mono=False, seed=4, history_bits=1)


def test_fast_mono_bins1():
    check_fast(500, mono=True, seed=5, history_bits=0)


def test_fast_bins8_smooth():
    check_fast(400, mono=False, seed=6, history_bits=3, smooth=True)


def test_fast_bins32():
    # history_bits=5 is the reference cap (DsdUtils.cs:167); bins=32 takes
    # the kernel's narrow lane_tile=128 branch (8192-row summed table),
    # exercised nowhere else
    check_fast(300, mono=False, seed=7, history_bits=5, lanes=2)
