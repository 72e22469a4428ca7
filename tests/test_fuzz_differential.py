"""Randomized differential fuzz: random mode-matrix specs and signals,
encoder -> oracle decode vs device decode must agree exactly.

Seeds are fixed (reproducible); WVPK_FUZZ_CASES scales the sweep up for
long runs.
"""

import os
from dataclasses import asdict

import numpy as np
import pytest

from wvpk import config
from wvpk.container import parse_blocks
from wvpk.engine import decode_states
from wvpk.ref import decode_block
from wvpk.testgen import EncodeSpec, encode_file

N_CASES = int(os.environ.get("WVPK_FUZZ_CASES", "24"))

TERM_POOL = [1, 2, 3, 4, 5, 6, 7, 8, 17, 18]
NEG_TERMS = [-1, -2, -3]


def random_spec(rng: np.random.Generator) -> EncodeSpec:
    mono = bool(rng.random() < 0.25)
    false_stereo = not mono and bool(rng.random() < 0.15)
    nterms = int(rng.integers(1, 9))
    terms = list(rng.choice(TERM_POOL, size=nterms))
    if not mono and not false_stereo and rng.random() < 0.3:
        terms[0] = int(rng.choice(NEG_TERMS))
    deltas = [int(rng.integers(0, 6)) for _ in terms]
    bytes_stored = int(rng.choice([1, 2, 2, 3, 4]))
    hybrid = bool(rng.random() < 0.3)
    spec = EncodeSpec(
        block_samples=int(rng.choice([117, 256, 300, 512, 1000])),
        mono=mono,
        false_stereo=false_stereo,
        joint=bool(rng.random() < 0.6) and not mono and not false_stereo,
        terms=tuple(int(t) for t in terms),
        deltas=tuple(deltas),
        bytes_stored=bytes_stored,
        shift=int(rng.integers(0, 4)) if not hybrid and bytes_stored > 1
        and rng.random() < 0.3 else 0,
        hybrid=hybrid,
        hybrid_bitrate=hybrid and bool(rng.random() < 0.4),
        bitrate=int(rng.integers(200, 1200)),
        bitrate_delta=int(rng.integers(0, 3)) if hybrid else 0,
    )
    return spec


def random_pcm(rng: np.random.Generator, n: int, ch: int, bytes_stored: int,
               shift: int) -> np.ndarray:
    kind = rng.integers(0, 4)
    lim = 1 << (bytes_stored * 8 - 1)
    scale = min(lim // 4, 1 << int(rng.integers(3, 22)))
    if kind == 0:
        x = rng.normal(0, scale, (n, ch))
    elif kind == 1:
        t = np.arange(n)[:, None]
        x = scale * np.sin(2 * np.pi * t / float(rng.integers(5, 200)))
        x = x + rng.normal(0, scale / 50, (n, ch))
    elif kind == 2:  # sparse/silence heavy
        x = rng.normal(0, scale, (n, ch))
        mask = rng.random((n, 1)) < 0.7
        x = np.where(mask, 0, x)
    else:  # steps / clipping
        x = np.repeat(rng.integers(-scale, scale, (max(n // 16, 1), ch)),
                      16, axis=0)[:n]
    pcm = np.clip(np.round(x), -lim + 1, lim - 1).astype(np.int64)
    if shift:
        pcm = (pcm >> shift) << shift
    return pcm


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_case(seed):
    rng = np.random.default_rng(1000 + seed)
    spec = random_spec(rng)
    n = int(rng.integers(spec.block_samples // 2,
                         spec.block_samples * 3 + 1))
    pcm = random_pcm(rng, n, spec.nch_data, spec.bytes_stored, spec.shift)
    data = encode_file(pcm, spec)
    if rng.random() < 0.25:  # corrupt sometimes
        data = bytearray(data)
        data[int(rng.integers(64, len(data)))] ^= int(rng.integers(1, 256))
        data = bytes(data)
    blocks = parse_blocks(data)
    dev = decode_states([b.state for b in blocks])
    for blk, d in zip(blocks, dev):
        want = decode_block(blk.state)
        np.testing.assert_array_equal(
            d.samples, want.samples,
            err_msg=f"seed {seed} spec {spec} block {blk.header.block_index}")
        assert d.mute_error == want.mute_error, (seed, spec)
        assert d.crc_error == want.crc_error, (seed, spec)
        if not spec.hybrid and not want.mute_error and not want.crc_error:
            # lossless identity against the source (corrupt blocks are
            # CRC-flagged and legitimately differ)
            lo = blk.header.block_index
            hi = min(blk.header.end_index, n)
            src = pcm[lo:hi]
            if spec.false_stereo:
                src = np.repeat(src, 2, axis=1)
            np.testing.assert_array_equal(d.samples[:hi - lo], src)


@pytest.mark.parametrize("seed", range(min(N_CASES, 12)))
def test_fuzz_case_dsd(seed):
    from wvpk.testgen import encode_dsd_file
    rng = np.random.default_rng(9000 + seed)
    mode = int(rng.choice([0, 1, 1, 3]))
    mono = bool(rng.random() < 0.3)
    ch = 1 if mono else 2
    n = int(rng.integers(100, 1500))
    kind = rng.integers(0, 3)
    if kind == 0:
        d = rng.integers(0, 256, (n, ch))
    elif kind == 1:  # strongly patterned (silence-ish DSD)
        d = np.full((n, ch), 0x55)
        hits = rng.random((n, ch)) < 0.1
        d = np.where(hits, rng.integers(0, 256, (n, ch)), d)
    else:
        d = np.cumsum(rng.integers(-2, 3, (n, ch)), axis=0) % 256
    data = encode_dsd_file(d.astype(np.int64), mode, mono=mono,
                           history_bits=int(rng.integers(0, 4)),
                           block_samples=int(rng.choice([n, 256])))
    if rng.random() < 0.3:
        data = bytearray(data)
        data[int(rng.integers(40, len(data)))] ^= int(rng.integers(1, 256))
        data = bytes(data)
    blocks = parse_blocks(data)
    dev = decode_states([b.state for b in blocks])
    for blk, d_res in zip(blocks, dev):
        want = decode_block(blk.state)
        np.testing.assert_array_equal(d_res.samples, want.samples,
                                      err_msg=f"dsd seed {seed} mode {mode}")
        assert d_res.mute_error == want.mute_error


@pytest.mark.parametrize("seed", range(min(N_CASES, 8)))
def test_fuzz_case_pallas(seed):
    """Same differential check with the Pallas kernel forced (interpret)."""
    rng = np.random.default_rng(5000 + seed)
    spec = random_spec(rng)
    # pallas path covers lossless only
    object.__setattr__(spec, "hybrid", False) if False else None
    spec = EncodeSpec(**{**asdict(spec), "hybrid": False,
                         "hybrid_bitrate": False, "bitrate_delta": 0})
    n = int(rng.integers(spec.block_samples // 2, spec.block_samples * 2 + 1))
    pcm = random_pcm(rng, n, spec.nch_data, spec.bytes_stored, spec.shift)
    data = encode_file(pcm, spec)
    blocks = parse_blocks(data)
    config.set_options(entropy_kernel="pallas")
    try:
        dev = decode_states([b.state for b in blocks])
    finally:
        config.set_options(entropy_kernel="auto")
    for blk, d in zip(blocks, dev):
        want = decode_block(blk.state)
        np.testing.assert_array_equal(d.samples, want.samples,
                                      err_msg=f"seed {seed} spec {spec}")
