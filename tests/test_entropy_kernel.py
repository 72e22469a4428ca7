"""Device entropy kernel vs oracle get_words, lane-parallel."""

import numpy as np
import pytest

from wvpk import consts
from wvpk.container import parse_blocks
from wvpk.ref.oracle import OracleBitstream, WordsState, get_words
from wvpk.testgen import EncodeSpec, encode_file


def oracle_residuals(st):
    flags = st.flags
    n = st.header.block_samples
    mono = bool(flags & consts.MONO_DATA)
    nw = n if mono else 2 * n
    buf = [0] * nw
    bs = OracleBitstream(st.wvbits or b"")
    w = WordsState.from_block(st)
    got = get_words(n, flags, w, bs, buf)
    return np.asarray(buf, np.int64).astype(np.int32), got


def stage_and_run(states, mono, hybrid=False, hybrid_bitrate=False,
                  hybrid_balance=False):
    from wvpk.ops.bitio import pack_streams
    from wvpk.ops.entropy import entropy_decode
    chans = 1 if mono else 2
    L = len(states)
    words_np, _ = pack_streams([st.wvbits or b"" for st in states])
    nwords_lane = np.asarray([st.header.block_samples * chans for st in states],
                             np.int32)
    med = np.asarray([st.medians for st in states], np.int64)
    slow = np.asarray([st.slow_level for st in states], np.int64)
    acc = np.asarray([st.bitrate_acc for st in states], np.int64)
    delta = np.asarray([st.bitrate_delta for st in states], np.int64)
    nsteps = int(nwords_lane.max())
    outs, broke, ndec = entropy_decode(
        words_np, nwords_lane, med, slow, acc, delta,
        mono=mono, hybrid=hybrid, hybrid_bitrate=hybrid_bitrate,
        hybrid_balance=hybrid_balance, nsteps=nsteps)
    # (T, L, C) -> per-lane interleaved word order (L, T*C)
    o = np.asarray(outs)
    res = o.transpose(1, 0, 2).reshape(o.shape[1], -1)
    return res, np.asarray(broke), np.asarray(ndec)


def check_states(states, mono, **kw):
    res, broke, ndec = stage_and_run(states, mono, **kw)
    chans = 1 if mono else 2
    for i, st in enumerate(states):
        want, got = oracle_residuals(st)
        nw = st.header.block_samples * chans
        assert not broke[i]
        assert ndec[i] == nw
        np.testing.assert_array_equal(res[i, :nw], want, err_msg=f"lane {i}")


def gen_states(spec, pcm_list):
    states = []
    for pcm in pcm_list:
        data = encode_file(pcm, spec)
        states += [b.state for b in parse_blocks(data)]
    return states


def test_entropy_stereo_lossless():
    rng = np.random.default_rng(0)
    pcms = [np.round(rng.normal(0, s, (500, 2))).astype(np.int64)
            for s in (30, 3000, 100000)]
    spec = EncodeSpec(block_samples=250, joint=True)
    check_states(gen_states(spec, pcms), mono=False)


def test_entropy_mono():
    rng = np.random.default_rng(1)
    pcms = [np.round(rng.normal(0, 2000, (400, 1))).astype(np.int64)]
    spec = EncodeSpec(block_samples=200, mono=True, terms=(18, 2))
    check_states(gen_states(spec, pcms), mono=True)


def test_entropy_zero_runs():
    pcm = np.zeros((600, 2), np.int64)
    pcm[200:230] = np.random.default_rng(2).integers(-50, 50, (30, 2))
    spec = EncodeSpec(block_samples=300, joint=True,
                      initial_medians=((0, 0, 0), (0, 0, 0)))
    check_states(gen_states(spec, [pcm]), mono=False)


def test_entropy_hybrid():
    rng = np.random.default_rng(3)
    pcm = np.round(rng.normal(0, 5000, (400, 2))).astype(np.int64)
    spec = EncodeSpec(block_samples=200, joint=True, hybrid=True, bitrate=700)
    check_states(gen_states(spec, [pcm]), mono=False, hybrid=True)


def test_entropy_hybrid_bitrate():
    rng = np.random.default_rng(4)
    pcm = np.round(rng.normal(0, 3000, (400, 2))).astype(np.int64)
    spec = EncodeSpec(block_samples=200, joint=True, hybrid=True,
                      hybrid_bitrate=True, bitrate=300, bitrate_delta=1)
    check_states(gen_states(spec, [pcm]), mono=False, hybrid=True,
                 hybrid_bitrate=True)


def test_entropy_mixed_sizes():
    rng = np.random.default_rng(5)
    pcms = [np.round(rng.normal(0, 1000, (n, 2))).astype(np.int64)
            for n in (100, 257, 512)]
    spec = EncodeSpec(block_samples=512, joint=False)
    check_states(gen_states(spec, pcms), mono=False)


def test_entropy_hybrid_balance():
    # channel-imbalanced signal so the balance redistribution
    # (WordsUtils.cs:228-243) actually moves bits between channels
    rng = np.random.default_rng(6)
    pcm = np.stack([np.round(rng.normal(0, 12000, 400)),
                    np.round(rng.normal(0, 90, 400))], axis=1).astype(np.int64)
    spec = EncodeSpec(block_samples=200, joint=False, hybrid=True,
                      hybrid_bitrate=True, hybrid_balance=True,
                      bitrate=350, bitrate_delta=1)
    check_states(gen_states(spec, [pcm]), mono=False, hybrid=True,
                 hybrid_bitrate=True, hybrid_balance=True)


@pytest.mark.parametrize("bitrate", [60, 900])
def test_entropy_hybrid_balance_extremes(bitrate):
    # tiny bitrate drives the balance branch into its clamp arms
    # (bitrate_1 = 2*bitrate_0 / bitrate_0 = 0); large bitrate keeps the
    # middle arm hot
    rng = np.random.default_rng(7 + bitrate)
    pcm = np.stack([np.round(rng.normal(0, 20000, 300)),
                    np.zeros(300)], axis=1).astype(np.int64)
    spec = EncodeSpec(block_samples=300, joint=True, hybrid=True,
                      hybrid_bitrate=True, hybrid_balance=True,
                      bitrate=bitrate, bitrate_delta=2)
    check_states(gen_states(spec, [pcm]), mono=False, hybrid=True,
                 hybrid_bitrate=True, hybrid_balance=True)
