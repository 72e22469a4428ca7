"""Pallas decorrelation kernel (interpret mode on CPU) vs the XLA kernel.

The XLA scan kernel (ops/decorr.py) is the int64-exact reference already
validated against the scalar oracle; the Pallas kernel must match it
bit-for-bit, including int32 wraparound in the emulated 64-bit predictor.
"""

import numpy as np
import pytest

from wvpk.ops.decorr import decorr_decode
from wvpk.ops.decorr_pallas import decorr_decode_pallas

ALL_TERMS = [1, 2, 3, 4, 5, 6, 7, 8, 17, 18, -1, -2, -3]
MONO_TERMS = [1, 2, 3, 4, 5, 6, 7, 8, 17, 18]


def rand_state(rng, L, mono, max_terms=16, big=False):
    terms = np.zeros((L, 16), np.int32)
    deltas = np.zeros((L, 16), np.int32)
    num_terms = rng.integers(0, max_terms + 1, L).astype(np.int32)
    pool = MONO_TERMS if mono else ALL_TERMS
    for i in range(L):
        terms[i, :num_terms[i]] = rng.choice(pool, num_terms[i])
        deltas[i, :num_terms[i]] = rng.integers(0, 8, num_terms[i])
    scale = 2**28 if big else 2**10
    wa = rng.integers(-scale, scale, (L, 16)).astype(np.int32)
    wb = rng.integers(-scale, scale, (L, 16)).astype(np.int32)
    hscale = 2**30 if big else 2**15
    ha = rng.integers(-hscale, hscale, (L, 16, 8)).astype(np.int64)
    hb = rng.integers(-hscale, hscale, (L, 16, 8)).astype(np.int64)
    return terms, deltas, wa, wb, ha, hb, num_terms


def check(T, L, mono, seed, big=False, max_terms=16):
    rng = np.random.default_rng(seed)
    C = 1 if mono else 2
    rscale = 2**29 if big else 2**14
    res = rng.integers(-rscale, rscale, (T, L, C)).astype(np.int32)
    terms, deltas, wa, wb, ha, hb, num_terms = rand_state(
        rng, L, mono, max_terms=max_terms, big=big)
    want = np.asarray(decorr_decode(res, terms, deltas, wa, wb, ha, hb,
                                    num_terms, mono=mono))
    got = np.asarray(decorr_decode_pallas(
        res, terms, deltas, wa, wb, ha, hb, num_terms, mono=mono,
        num_terms_max=int(num_terms.max()), interpret=True))
    np.testing.assert_array_equal(want, got)


def test_stereo_all_terms():
    check(T=96, L=9, mono=False, seed=1)


def test_mono_all_terms():
    check(T=96, L=7, mono=True, seed=2)


def test_stereo_wraparound():
    # int32 overflow in predictor products and outputs must match C# wrap
    check(T=64, L=8, mono=False, seed=3, big=True)


def test_chunk_boundary_state_carry():
    # T crosses the kernel's sample-chunk boundary (state persists in VMEM)
    check(T=1030, L=3, mono=False, seed=4)


def test_few_terms_bucket():
    # num_terms_max <= 2 exercises the smallest unrolled variant
    check(T=80, L=6, mono=False, seed=5, max_terms=2)


def test_zero_terms_lane():
    rng = np.random.default_rng(6)
    res = rng.integers(-100, 100, (32, 2, 2)).astype(np.int32)
    z16 = np.zeros((2, 16), np.int32)
    z168 = np.zeros((2, 16, 8), np.int64)
    nt = np.zeros(2, np.int32)
    got = np.asarray(decorr_decode_pallas(
        res, z16, z16, z16, z16, z168, z168, nt, mono=False,
        num_terms_max=0, interpret=True))
    np.testing.assert_array_equal(res, got)


@pytest.mark.parametrize("term", ALL_TERMS)
def test_single_term_stereo(term):
    rng = np.random.default_rng(100 + term)
    L, T = 4, 48
    res = rng.integers(-2**14, 2**14, (T, L, 2)).astype(np.int32)
    terms = np.full((L, 16), 0, np.int32)
    terms[:, 0] = term
    deltas = np.full((L, 16), 2, np.int32)
    wa = rng.integers(-1024, 1024, (L, 16)).astype(np.int32)
    wb = rng.integers(-1024, 1024, (L, 16)).astype(np.int32)
    ha = rng.integers(-2**15, 2**15, (L, 16, 8)).astype(np.int64)
    hb = rng.integers(-2**15, 2**15, (L, 16, 8)).astype(np.int64)
    nt = np.ones(L, np.int32)
    want = np.asarray(decorr_decode(res, terms, deltas, wa, wb, ha, hb, nt,
                                    mono=False))
    got = np.asarray(decorr_decode_pallas(
        res, terms, deltas, wa, wb, ha, hb, nt, mono=False,
        num_terms_max=1, interpret=True))
    np.testing.assert_array_equal(want, got)


def check_static(T, L, mono, seed, chain, big=False):
    """Specialized (static_terms) kernel vs the XLA reference on a
    uniform-chain bucket."""
    rng = np.random.default_rng(seed)
    C = 1 if mono else 2
    rscale = 2**29 if big else 2**14
    res = rng.integers(-rscale, rscale, (T, L, C)).astype(np.int32)
    n = len(chain)
    terms = np.zeros((L, 16), np.int32)
    terms[:, :n] = chain
    deltas = np.zeros((L, 16), np.int32)
    deltas[:, :n] = rng.integers(0, 8, (L, n))
    scale = 2**28 if big else 2**10
    wa = rng.integers(-scale, scale, (L, 16)).astype(np.int32)
    wb = rng.integers(-scale, scale, (L, 16)).astype(np.int32)
    hscale = 2**30 if big else 2**15
    ha = rng.integers(-hscale, hscale, (L, 16, 8)).astype(np.int64)
    hb = rng.integers(-hscale, hscale, (L, 16, 8)).astype(np.int64)
    nt = np.full(L, n, np.int32)
    want = np.asarray(decorr_decode(res, terms, deltas, wa, wb, ha, hb,
                                    nt, mono=mono))
    got = np.asarray(decorr_decode_pallas(
        res, terms, deltas, wa, wb, ha, hb, nt, mono=mono,
        num_terms_max=n, interpret=True, static_terms=tuple(chain)))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("term", ALL_TERMS)
def test_static_single_term_stereo(term):
    check_static(T=48, L=4, mono=False, seed=200 + term, chain=[term])


def test_static_headline_chain():
    check_static(T=96, L=5, mono=False, seed=300, chain=[18, 17, 2])


def test_static_deep10_chain():
    # the mc51 "high" preset shape: 10-term chain incl. a cross term
    check_static(T=96, L=5, mono=False, seed=301,
                 chain=[-1, 18, 18, 17, 17, 3, 2, 5, 1, 2])


def test_static_mono_chain():
    check_static(T=96, L=4, mono=True, seed=302, chain=[17, 17, 2, 1])


def test_static_wraparound():
    check_static(T=64, L=4, mono=False, seed=303,
                 chain=[18, -2, 17, 5], big=True)


def test_static_chunk_boundary():
    check_static(T=1030, L=3, mono=False, seed=304, chain=[18, 17, 2])


def check_fold(T, L, mono, seed, joint_frac=0.5, tight_mute=False,
               chain=None, broke_frac=0.0, huge_limit=False):
    """Folded decorr+joint/mute/CRC vs the XLA decorr + joint_mute_crc
    pair (the golden post implementation)."""
    from wvpk.ops.post import joint_mute_crc
    rng = np.random.default_rng(seed)
    C = 1 if mono else 2
    res = rng.integers(-2**14, 2**14, (T, L, C)).astype(np.int32)
    if chain is None:
        terms, deltas, wa, wb, ha, hb, nt = rand_state(rng, L, mono)
        stt = None
        ntm = int(nt.max())
    else:
        n = len(chain)
        terms = np.zeros((L, 16), np.int32); terms[:, :n] = chain
        deltas = np.zeros((L, 16), np.int32); deltas[:, :n] = 2
        wa = rng.integers(-1024, 1024, (L, 16)).astype(np.int32)
        wb = rng.integers(-1024, 1024, (L, 16)).astype(np.int32)
        ha = rng.integers(-2**15, 2**15, (L, 16, 8)).astype(np.int64)
        hb = rng.integers(-2**15, 2**15, (L, 16, 8)).astype(np.int64)
        nt = np.full(L, n, np.int32)
        stt = tuple(chain)
        ntm = n
    nsamples = rng.integers(max(1, T // 2), T + 1, L).astype(np.int32)
    joint = (rng.random(L) < joint_frac) if not mono \
        else np.zeros(L, bool)
    if huge_limit:
        ml = np.full(L, (1 << 32) + 2, np.int64)
    elif tight_mute:
        ml = rng.integers(4, 2000, L).astype(np.int64)
    else:
        ml = np.full(L, 1 << 24, np.int64)
    broke = rng.random(L) < broke_frac
    dec = np.asarray(decorr_decode(res, terms, deltas, wa, wb, ha, hb,
                                   nt, mono=mono))
    w_out, w_crc, w_mute = (np.asarray(x) for x in joint_mute_crc(
        dec, nsamples, joint, ml, broke, mono=mono))
    from wvpk.ops.decorr_select import decorr_post_any
    from wvpk import config
    config.set_options(decorr_kernel="pallas")
    try:
        g_out, g_crc, g_mute = (np.asarray(x) for x in decorr_post_any(
            res, terms, deltas, wa, wb, ha, hb, nt, nsamples, joint, ml,
            broke, mono=mono, num_terms_max=ntm, static_terms=stt))
    finally:
        config.set_options(decorr_kernel="auto")
    np.testing.assert_array_equal(w_out, g_out)
    np.testing.assert_array_equal(w_crc, g_crc)
    np.testing.assert_array_equal(w_mute, g_mute)


def test_fold_post_stereo_joint_mix():
    check_fold(T=96, L=8, mono=False, seed=400)


def test_fold_post_mute_fires():
    check_fold(T=96, L=8, mono=False, seed=401, tight_mute=True)


def test_fold_post_mono():
    check_fold(T=96, L=6, mono=True, seed=402, tight_mute=True)


def test_fold_post_broke_and_huge_limit():
    check_fold(T=64, L=6, mono=False, seed=403, broke_frac=0.5,
               huge_limit=True)


def test_fold_post_static_chain():
    check_fold(T=96, L=5, mono=False, seed=404, chain=[18, 17, 2],
               tight_mute=True)


def test_fold_post_chunk_boundary():
    check_fold(T=1030, L=3, mono=False, seed=405, tight_mute=True)


def test_chain_segments_match_golden():
    """Mixed-chain lane partition: per-segment specialized kernels +
    generic tail inside one decorr_post_any call must equal the XLA
    decorr + joint_mute_crc pair lane-for-lane."""
    from wvpk import config
    from wvpk.ops.decorr_select import decorr_post_any
    from wvpk.ops.post import joint_mute_crc

    rng = np.random.default_rng(500)
    T, C = 96, 2
    chains = [(18, 17, 2), (18, 18, 2, 17, 3), (17, 17, 2, 18, 18, 4, 6, 2)]
    counts = [7, 5, 6]
    segs, pos = [], 0
    terms_rows, nt_rows = [], []
    for chain, k in zip(chains, counts):
        row = np.zeros(16, np.int32)
        row[:len(chain)] = chain
        terms_rows += [row] * k
        nt_rows += [len(chain)] * k
        segs.append((chain, pos, pos + k, len(chain)))
        pos += k
    # ragged generic tail (mixed chains incl. a zero-term lane)
    tail = [(2,), (), (18, -1)]
    for chain in tail:
        row = np.zeros(16, np.int32)
        row[:len(chain)] = chain
        terms_rows.append(row)
        nt_rows.append(len(chain))
    segs.append((None, pos, pos + len(tail), 2))
    L = pos + len(tail)
    terms = np.stack(terms_rows)
    nt = np.asarray(nt_rows, np.int32)
    deltas = np.where(terms != 0, 2, 0).astype(np.int32)
    res = rng.integers(-2**14, 2**14, (T, L, C)).astype(np.int32)
    wa = rng.integers(-1024, 1024, (L, 16)).astype(np.int32)
    wb = rng.integers(-1024, 1024, (L, 16)).astype(np.int32)
    ha = rng.integers(-2**15, 2**15, (L, 16, 8)).astype(np.int64)
    hb = rng.integers(-2**15, 2**15, (L, 16, 8)).astype(np.int64)
    nsamples = rng.integers(T // 2, T + 1, L).astype(np.int32)
    joint = rng.random(L) < 0.5
    ml = rng.integers(4, 4000, L).astype(np.int64)
    broke = rng.random(L) < 0.2

    dec = np.asarray(decorr_decode(res, terms, deltas, wa, wb, ha, hb,
                                   nt, mono=False))
    w_out, w_crc, w_mute = (np.asarray(x) for x in joint_mute_crc(
        dec, nsamples, joint, ml, broke, mono=False))
    config.set_options(decorr_kernel="pallas")
    try:
        g_out, g_crc, g_mute = (np.asarray(x) for x in decorr_post_any(
            res, terms, deltas, wa, wb, ha, hb, nt, nsamples, joint, ml,
            broke, mono=False, num_terms_max=int(nt.max()),
            chain_segments=tuple(segs)))
    finally:
        config.set_options(decorr_kernel="auto")
    np.testing.assert_array_equal(w_out, g_out)
    np.testing.assert_array_equal(w_crc, g_crc)
    np.testing.assert_array_equal(w_mute, g_mute)


def _seg_case(T, mono, seed, chains, counts, tail):
    from wvpk import config
    from wvpk.ops.decorr_select import decorr_post_any
    from wvpk.ops.post import joint_mute_crc

    rng = np.random.default_rng(seed)
    C = 1 if mono else 2
    segs, pos, terms_rows, nt_rows = [], 0, [], []
    for chain, k in zip(chains, counts):
        row = np.zeros(16, np.int32)
        row[:len(chain)] = chain
        terms_rows += [row] * k
        nt_rows += [len(chain)] * k
        segs.append((chain, pos, pos + k, len(chain)))
        pos += k
    for chain in tail:
        row = np.zeros(16, np.int32)
        row[:len(chain)] = chain
        terms_rows.append(row)
        nt_rows.append(len(chain))
    if tail:
        segs.append((None, pos, pos + len(tail),
                     max(max((len(c) for c in tail)), 1)))
    L = pos + len(tail)
    terms = np.stack(terms_rows)
    nt = np.asarray(nt_rows, np.int32)
    deltas = np.where(terms != 0, 2, 0).astype(np.int32)
    res = rng.integers(-2**14, 2**14, (T, L, C)).astype(np.int32)
    wa = rng.integers(-1024, 1024, (L, 16)).astype(np.int32)
    wb = rng.integers(-1024, 1024, (L, 16)).astype(np.int32)
    ha = rng.integers(-2**15, 2**15, (L, 16, 8)).astype(np.int64)
    hb = rng.integers(-2**15, 2**15, (L, 16, 8)).astype(np.int64)
    nsamples = rng.integers(T // 2, T + 1, L).astype(np.int32)
    joint = (rng.random(L) < 0.5) if not mono else np.zeros(L, bool)
    ml = rng.integers(4, 4000, L).astype(np.int64)
    broke = rng.random(L) < 0.2
    dec = np.asarray(decorr_decode(res, terms, deltas, wa, wb, ha, hb,
                                   nt, mono=mono))
    w = [np.asarray(x) for x in joint_mute_crc(
        dec, nsamples, joint, ml, broke, mono=mono)]
    config.set_options(decorr_kernel="pallas")
    try:
        g = [np.asarray(x) for x in decorr_post_any(
            res, terms, deltas, wa, wb, ha, hb, nt, nsamples, joint, ml,
            broke, mono=mono, num_terms_max=int(nt.max()),
            chain_segments=tuple(segs))]
    finally:
        config.set_options(decorr_kernel="auto")
    for want, got in zip(w, g):
        np.testing.assert_array_equal(want, got)


def test_chain_segments_mono():
    _seg_case(T=96, mono=True, seed=510,
              chains=[(18, 17, 2), (17, 17, 2, 18, 18, 4)],
              counts=[6, 5], tail=[(2,), ()])


def test_chain_segments_chunk_boundary_no_tail():
    _seg_case(T=1030, mono=False, seed=511,
              chains=[(18, 18, 2), (18, 17)], counts=[4, 3], tail=[])
