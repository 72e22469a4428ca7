"""Differential tests: Pallas encode kernels (interpret mode) vs the
exact XLA scan kernels (ops/encode_kernels.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wvpk.ops.encode_kernels import (decorr_invert_warm,  # noqa: E402
                                     entropy_encode_words)
from wvpk.ops.encode_pallas import (_udiv, decorr_invert_pallas,  # noqa: E402
                                    entropy_encode_pallas)

CHAINS = [
    ((18, 17, 2), False),          # default preset, stereo
    ((18, 18, 2, 17, 3), False),
    ((1, 17, -2, 8), False),       # ring + cross-channel
    ((-1, 18, 2), False),
    ((-3, 5, 17), False),
    ((18, 17, 3, 2, 5, 7, 18, 1, 4, 6), False),   # 10-term deep chain
    ((18, 17, 2), True),           # mono
    ((2, 18, 1, 17, 8), True),
]


def _rand_pcm(rng, T, C, mag=1 << 14):
    s = mag * np.sin(2 * np.pi * np.arange(T) / 71.0)
    base = np.stack([s * (0.5 + 0.5 * c) for c in range(C)], 1)
    return np.round(base + rng.normal(0, mag / 30, (T, C))).astype(np.int32)


@pytest.mark.parametrize("chain,mono", CHAINS)
@pytest.mark.parametrize("warm", [False, True])
def test_invert_differential(chain, mono, warm):
    rng = np.random.default_rng(hash((chain, mono, warm)) % (1 << 31))
    C = 1 if mono else 2
    T, L = 96, 5
    targ = np.stack([_rand_pcm(rng, T, C, mag=1 << (10 + i))
                     for i in range(L)], axis=1)          # (T, L, C)
    npz = len(chain)
    terms = np.zeros((L, 16), np.int32)
    deltas = np.zeros((L, 16), np.int32)
    terms[:, :npz] = chain
    deltas[:, :npz] = 2
    nt = np.full(L, npz, np.int32)
    if warm:
        w0a = rng.integers(-900, 900, (L, 16)).astype(np.int64)
        w0b = rng.integers(-900, 900, (L, 16)).astype(np.int64)
        h0a = rng.integers(-(1 << 14), 1 << 14, (L, 16, 8)).astype(np.int64)
        h0b = rng.integers(-(1 << 14), 1 << 14, (L, 16, 8)).astype(np.int64)
    else:
        w0a = w0b = np.zeros((L, 16), np.int64)
        h0a = h0b = np.zeros((L, 16, 8), np.int64)

    want, (wa_x, wb_x, ha_x, hb_x) = decorr_invert_warm(
        jnp.asarray(targ), jnp.asarray(terms), jnp.asarray(deltas),
        jnp.asarray(nt), jnp.asarray(w0a), jnp.asarray(w0b),
        jnp.asarray(h0a), jnp.asarray(h0b), mono=mono, with_state=True)
    got, (wa_p, wb_p, ha_p, hb_p) = decorr_invert_pallas(
        jnp.asarray(targ), jnp.asarray(deltas), jnp.asarray(w0a),
        jnp.asarray(w0b), jnp.asarray(h0a), jnp.asarray(h0b), mono=mono,
        static_terms=chain, interpret=True, with_state=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(wa_p)[:, :npz],
                                  np.asarray(wa_x)[:, :npz])
    np.testing.assert_array_equal(np.asarray(ha_p)[:, :npz],
                                  np.asarray(ha_x)[:, :npz])
    if not mono:
        np.testing.assert_array_equal(np.asarray(wb_p)[:, :npz],
                                      np.asarray(wb_x)[:, :npz])
        np.testing.assert_array_equal(np.asarray(hb_p)[:, :npz],
                                      np.asarray(hb_x)[:, :npz])


def _words_case(rng, W, L, kind):
    """Residual words exercising the automaton's arms."""
    if kind == "normal":
        r = rng.normal(0, 600, (W, L))
    elif kind == "runs":
        r = rng.normal(0, 3, (W, L)).round()
        r[rng.random((W, L)) < 0.7] = 0
        r[: W // 4] = 0                       # leading run
    elif kind == "escapes":
        r = rng.normal(0, 50, (W, L))
        big = rng.random((W, L)) < 0.05
        r = np.where(big, rng.integers(1 << 20, 1 << 26, (W, L)), r)
    elif kind == "huge":
        r = rng.integers(-(1 << 26), 1 << 26, (W, L))
    return np.asarray(r, np.int64).astype(np.int32)


@pytest.mark.parametrize("mono", [False, True])
@pytest.mark.parametrize("kind", ["normal", "runs", "escapes", "huge"])
def test_entropy_words_differential(mono, kind):
    rng = np.random.default_rng(hash((mono, kind)) % (1 << 31))
    W, L = 160, 4
    res = _words_case(rng, W, L, kind)
    med0 = np.zeros((L, 2, 3), np.int64)
    for i in range(L):
        for c in range(1 if mono else 2):
            base = [0, 3, 9, 1 << 18][i % 4]
            med0[i, c] = sorted(rng.integers(base, base * 4 + 4, 3))
    # log16-quantize like the block metadata does (values survive a
    # round trip; here plain small ints already do)
    nvals = np.asarray([W, W - 1, W // 2, 3], np.int32)[:L]

    want = entropy_encode_words(jnp.asarray(res), jnp.asarray(med0),
                                jnp.asarray(nvals), mono=mono)
    got = entropy_encode_pallas(jnp.asarray(res), jnp.asarray(med0),
                                jnp.asarray(nvals), mono=mono,
                                interpret=True)
    names = ["segA_lo", "segA_hi", "segA_len", "segB_bits", "segB_len",
             "pvalid", "poc", "pbits", "pnb"]
    for name, w, g in zip(names, want, got):
        np.testing.assert_array_equal(
            np.asarray(g).astype(np.uint64),
            np.asarray(w).astype(np.uint64), err_msg=f"{kind}/{name}")


@pytest.mark.parametrize("chain,mono", [
    ((18, 17, 2), False),
    ((18, 18, 2, 17, 3), False),
    ((1, 17, -2, 8), False),
    ((18, 17, 2), True),
])
@pytest.mark.parametrize("bitrate,balance", [(False, False),
                                             (True, False), (True, True)])
def test_hybrid_scan_differential(chain, mono, bitrate, balance):
    """The Pallas fused hybrid scan matches the XLA scan on every
    output (segments, pending word, reconstruction)."""
    from wvpk.ops.encode_kernels import hybrid_encode_scan
    from wvpk.ops.encode_pallas import hybrid_encode_pallas

    if mono and balance:
        pytest.skip("balance is stereo-only")
    rng = np.random.default_rng(hash((chain, mono, bitrate, balance))
                                % (1 << 31))
    C = 1 if mono else 2
    T, L = 80, 4
    targ = np.stack([_rand_pcm(rng, T, C, mag=1 << (9 + 2 * i))
                     for i in range(L)], axis=1)
    targ[:12, 0] = 0                        # run-gate gamma(0) arm
    npz = len(chain)
    terms = np.zeros((L, 16), np.int32)
    deltas = np.zeros((L, 16), np.int32)
    terms[:, :npz] = chain
    deltas[:, :npz] = 2
    nt = np.full(L, npz, np.int32)
    med0 = np.zeros((L, 2, 3), np.int64)
    for i in range(L):
        for c in range(2):
            med0[i, c] = sorted(rng.integers(1, 600, 3))
    slow0 = rng.integers(0, 3000, (L, 2)).astype(np.int64)
    acc0 = (rng.integers(1, 40, (L, 2)) << 16).astype(np.int64)
    delta0 = rng.integers(1, 3, (L, 2)).astype(np.int64)
    nvals = np.asarray([T * C, T * C - 1, T * C // 2, 5], np.int32)[:L]
    z16 = np.zeros((L, 16), np.int64)
    z168 = np.zeros((L, 16, 8), np.int64)

    want = hybrid_encode_scan(
        jnp.asarray(targ), jnp.asarray(terms), jnp.asarray(deltas),
        jnp.asarray(nt), jnp.asarray(med0), jnp.asarray(slow0),
        jnp.asarray(acc0), jnp.asarray(delta0), jnp.asarray(nvals),
        jnp.asarray(z16), jnp.asarray(z16), jnp.asarray(z168),
        jnp.asarray(z168), mono=mono, hybrid_bitrate=bitrate,
        hybrid_balance=balance)
    got = hybrid_encode_pallas(
        jnp.asarray(targ), jnp.asarray(deltas), jnp.asarray(med0),
        jnp.asarray(slow0), jnp.asarray(acc0), jnp.asarray(delta0),
        jnp.asarray(nvals), jnp.asarray(z16), jnp.asarray(z16),
        jnp.asarray(z168), jnp.asarray(z168), mono=mono,
        static_terms=chain, hybrid_bitrate=bitrate,
        hybrid_balance=balance, interpret=True)
    names = ["segA_lo", "segA_hi", "segA_len", "segB_bits", "segB_len",
             "pvalid", "poc", "pbits", "pnb", "recon"]
    for name, w, g in zip(names, want, got):
        np.testing.assert_array_equal(
            np.asarray(g).astype(np.int64),
            np.asarray(w).astype(np.int64), err_msg=name)


def test_device_encode_hybrid_pallas_bytes_identical():
    """Full hybrid device encode with encode_kernel='pallas' produces
    byte-identical blocks to the XLA fused scan."""
    from wvpk.config import set_options
    from wvpk.encode import build_spec
    from wvpk.engine.device_encoder import encode_blocks_device

    rng = np.random.default_rng(31)
    t = np.arange(3 * 220)
    s = 6000 * np.sin(2 * np.pi * t / 47.0)
    pcm = np.round(np.stack([s, s * 0.7], 1)
                   + rng.normal(0, 250, (t.size, 2))).astype(np.int64)
    spec = build_spec(pcm, block_samples=220, hybrid=True, bitrate=384)
    try:
        set_options(encode_kernel="xla")
        want = encode_blocks_device(pcm, spec)
        set_options(encode_kernel="pallas")
        got = encode_blocks_device(pcm, spec)
    finally:
        set_options(encode_kernel="auto")
    assert got == want


def test_udiv_exact():
    """The f32 two-stage division must be exactly floor(n/d) across the
    encoder's operating range, including adversarial near-boundary
    pairs."""
    rng = np.random.default_rng(0)
    ns = [0, 1, 2, 3, 255, 256, (1 << 20) - 1, 1 << 20, (1 << 27) - 1,
          1 << 27, (1 << 28) - 1]
    ds = [1, 2, 3, 5, 7, 255, 256, 65535, (1 << 20) + 1, (1 << 27) - 1]
    pairs = [(n, d) for n in ns for d in ds]
    # random pairs + exact-multiple neighborhoods (q*d - 1, q*d, q*d + 1)
    for _ in range(4000):
        d = int(rng.integers(1, 1 << 27))
        q = int(rng.integers(0, (1 << 28) // d + 1))
        for nn in (q * d - 1, q * d, q * d + 1):
            if 0 <= nn < (1 << 28):
                pairs.append((nn, d))
    n = jnp.asarray([p[0] for p in pairs], jnp.int32).reshape(1, -1)
    d = jnp.asarray([p[1] for p in pairs], jnp.int32).reshape(1, -1)
    got = np.asarray(_udiv(n, d))[0]
    want = np.asarray([p[0] // p[1] for p in pairs])
    np.testing.assert_array_equal(got, want)


def test_device_encode_pallas_bytes_identical():
    """encode_blocks_device with encode_kernel='pallas' (interpret)
    produces byte-identical blocks to the XLA kernels."""
    from wvpk.config import set_options
    from wvpk.encode import build_spec
    from wvpk.engine.device_encoder import encode_blocks_device

    rng = np.random.default_rng(21)
    t = np.arange(3 * 240)
    s = 5000 * np.sin(2 * np.pi * t / 53.0)
    pcm = np.round(np.stack([s, s * 0.6], 1)
                   + rng.normal(0, 120, (t.size, 2))).astype(np.int64)
    pcm[300:420] = 0                         # zero-run arm
    spec = build_spec(pcm, block_samples=240)
    try:
        set_options(encode_kernel="xla")
        want = encode_blocks_device(pcm, spec)
        set_options(encode_kernel="pallas")
        got = encode_blocks_device(pcm, spec)
    finally:
        set_options(encode_kernel="auto")
    assert got == want


def test_sharded_encode_pallas_bytes_identical():
    """The Pallas encode kernels compose with the mesh shard_map path:
    sharded pallas == unsharded xla, byte for byte."""
    from wvpk.config import set_options
    from wvpk.encode import build_spec
    from wvpk.engine.device_encoder import encode_blocks_device
    from wvpk.parallel import make_mesh

    rng = np.random.default_rng(9)
    t = np.arange(5 * 128)                  # 5 % 8 != 0: padded lanes
    s = 3000 * np.sin(2 * np.pi * t / 41.0)
    pcm = np.round(np.stack([s, s * 0.8], 1)
                   + rng.normal(0, 60, (t.size, 2))).astype(np.int64)
    spec = build_spec(pcm, block_samples=128)
    mesh = make_mesh(8)
    try:
        set_options(encode_kernel="xla")
        want = encode_blocks_device(pcm, spec)
        set_options(encode_kernel="pallas")
        got = encode_blocks_device(pcm, spec, mesh=mesh)
    finally:
        set_options(encode_kernel="auto")
    assert got == want
