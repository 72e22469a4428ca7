"""Device-encode throughput on the real chip (slope methodology).

Measures the two encode scans (decorr_invert + entropy_encode_words)
device-side with inputs staged in HBM and only scalar-sized fetches in
the timed region; the tunnel's ~27 ms per-dispatch/fetch latency is
removed by taking the slope between two lane counts (NOTES.md
"corrected methodology"). Host packing is timed separately (it overlaps
device work in a real pipeline).

Usage: python tools/encode_device_profile.py [n_lanes] [block_samples]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def stage(L, T):
    import jax

    from wvpk.encode import build_spec
    from wvpk.testgen.encoder import (EncPass, _make_words_state,
                                      _auto_medians, _quantize_entropy,
                                      _stored_domain)

    rng = np.random.default_rng(0)
    t = np.arange(T * L)
    sig = 8000 * np.sin(2 * np.pi * 440 * t / 44100) \
        + rng.normal(0, 300, t.size)
    pcm = np.clip(np.round(np.stack([sig, sig * 0.7], 1)),
                  -32768, 32767).astype(np.int64)
    spec = build_spec(pcm, block_samples=T)
    stored = _stored_domain(pcm, spec)
    targ = np.zeros((T, L, 2), np.int32)
    med0 = np.zeros((L, 2, 3), np.int64)
    for i in range(L):
        blk = stored[i * T:(i + 1) * T].astype(np.int64)
        sd = (blk[:, 0] - blk[:, 1]).astype(np.int32).astype(np.int64)
        targ[:, i, 0] = sd
        targ[:, i, 1] = (blk[:, 1] + (sd >> 1)).astype(np.int32)
        w = _make_words_state(spec, _auto_medians(blk))
        _quantize_entropy(w, False)
        med0[i, 0] = w.c[0].median
        med0[i, 1] = w.c[1].median
    terms16 = np.zeros((L, 16), np.int32)
    deltas16 = np.zeros((L, 16), np.int32)
    terms16[:, :len(spec.terms)] = spec.terms
    deltas16[:, :len(spec.terms)] = spec.deltas
    nt = np.full(L, len(spec.terms), np.int32)
    nvals = np.full(L, 2 * T, np.int32)
    dev = [jax.device_put(x) for x in
           (targ, terms16, deltas16, nt, med0, nvals)]
    jax.block_until_ready(dev)
    return dev


def run(L, T, backend, repeats=3):
    import jax.numpy as jnp

    from wvpk.config import set_options
    from wvpk.ops.encode_select import invert_any, words_any

    targ, terms16, deltas16, nt, med0, nvals = stage(L, T)
    z16 = jnp.zeros((L, 16), jnp.int64)
    z168 = jnp.zeros((L, 16, 8), jnp.int64)
    set_options(encode_kernel=backend)

    def full():
        res = invert_any(targ, terms16, deltas16, nt, z16, z16, z168,
                         z168, mono=False,
                         static_terms=(18, 18, 2, 17, 3))
        words = res.transpose(0, 2, 1).reshape(2 * T, L)
        segs = words_any(words, med0, nvals, mono=False)
        # scalar-sized sync (np.asarray is the only real sync on axon)
        return int(np.asarray(segs[2][-1]).sum())

    full()                      # compile
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        full()
        best = min(best, time.perf_counter() - t0)
    set_options(encode_kernel="auto")
    return best


def run_rounds(L, T, backend, rounds, repeats=3):
    """Launch `rounds` back-to-back encode-scan chains before ONE
    blocking fetch: the slope between two rounds counts at FIXED L
    removes the ~28 ms dispatch/fetch constant exactly — needed for the
    Pallas kernels, whose whole 512x4096 compute sits under that noise
    (the lane-count slope measured 28.1 -> 28.6 ms, pure noise)."""
    import jax.numpy as jnp

    from wvpk.config import set_options
    from wvpk.ops.encode_select import invert_any, words_any

    targ, terms16, deltas16, nt, med0, nvals = stage(L, T)
    z16 = jnp.zeros((L, 16), jnp.int64)
    z168 = jnp.zeros((L, 16, 8), jnp.int64)
    set_options(encode_kernel=backend)

    def full(k):
        hs = []
        for _ in range(k):
            res = invert_any(targ, terms16, deltas16, nt, z16, z16, z168,
                             z168, mono=False,
                             static_terms=(18, 18, 2, 17, 3))
            words = res.transpose(0, 2, 1).reshape(2 * T, L)
            segs = words_any(words, med0, nvals, mono=False)
            hs.append(segs[2][-1])
        return np.asarray(jnp.concatenate(hs)).sum()

    full(rounds)                # compile
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        full(rounds)
        best = min(best, time.perf_counter() - t0)
    set_options(encode_kernel="auto")
    return best


def run_fori(L, T, backend, rounds, repeats=3):
    """Like run_rounds, but the rounds loop runs INSIDE one jitted
    fori_loop (optimization_barrier pins each round): a timed call is
    one dispatch + pure device compute. Python-level round launches
    each pay a 6-12 ms host dispatch through the tunnel, which at
    ~4-10 ms/round of real compute dominates the slope and jitters the
    reported rate (measured 339-713 Mvalues/s run to run; the in-jit
    form is stable at ~1.1-1.2 Gvalues/s)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from wvpk.config import set_options
    from wvpk.ops.encode_select import invert_any, words_any

    targ, terms16, deltas16, nt, med0, nvals = stage(L, T)
    z16 = jnp.zeros((L, 16), jnp.int64)
    z168 = jnp.zeros((L, 16, 8), jnp.int64)
    set_options(encode_kernel=backend)

    def one_round(targ_r):
        res = invert_any(targ_r, terms16, deltas16, nt, z16, z16, z168,
                         z168, mono=False,
                         static_terms=(18, 18, 2, 17, 3))
        words = res.transpose(0, 2, 1).reshape(2 * T, L)
        segs = words_any(words, med0, nvals, mono=False)
        return segs[2][-1]

    @functools.partial(jax.jit, static_argnames="rounds")
    def run_j(targ_r, rounds):
        def body(_i, acc):
            t_b, a_b = lax.optimization_barrier((targ_r, acc))
            return a_b ^ one_round(t_b)
        return lax.fori_loop(0, rounds, body,
                             jnp.zeros_like(jax.eval_shape(one_round,
                                                           targ_r)))

    np.asarray(run_j(targ, rounds))   # compile
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(run_j(targ, rounds))
        best = min(best, time.perf_counter() - t0)
    set_options(encode_kernel="auto")
    return best


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    for backend in ("pallas", "xla"):
        t_small = run(L // 4, T, backend)
        t_big = run(L, T, backend)
        slope = (t_big - t_small) / (L - L // 4) / T  # s per frame
        ms = 1.0 / slope / 1e6
        print(f"[{backend}] L={L} T={T}: t_small={t_small*1e3:.1f} ms "
              f"t_big={t_big*1e3:.1f} ms slope={slope*1e9:.2f} ns/frame "
              f"-> {ms:.1f} Mframes/s ({ms*2:.1f} Mvalues/s) device encode")

    # rounds-count slope at fixed L (exact fixed-cost removal)
    r_lo, r_hi = 2, 10
    for backend in ("pallas", "xla"):
        if backend == "xla" and T * L > 1 << 21:
            continue            # minutes per round; the L-sweep suffices
        t_lo = run_rounds(L, T, backend, r_lo)
        t_hi = run_rounds(L, T, backend, r_hi)
        per = (t_hi - t_lo) / (r_hi - r_lo)
        ms = L * T / per / 1e6
        print(f"[{backend}] rounds slope: t{r_lo}={t_lo*1e3:.1f} ms "
              f"t{r_hi}={t_hi*1e3:.1f} ms per-round={per*1e3:.2f} ms "
              f"-> {ms:.1f} Mframes/s ({ms*2:.1f} Mvalues/s)")

    # in-jit rounds slope (one dispatch per timed call; the honest
    # device-compute rate — the Python-rounds slope above additionally
    # pays a jittery 6-12 ms host dispatch per round)
    for backend in ("pallas", "xla"):
        if backend == "xla" and T * L > 1 << 21:
            continue
        t_lo = run_fori(L, T, backend, r_lo)
        t_hi = run_fori(L, T, backend, r_hi)
        per = (t_hi - t_lo) / (r_hi - r_lo)
        ms = L * T / per / 1e6
        print(f"[{backend}] in-jit rounds slope: t{r_lo}={t_lo*1e3:.1f} ms "
              f"t{r_hi}={t_hi*1e3:.1f} ms per-round={per*1e3:.2f} ms "
              f"-> {ms:.1f} Mframes/s ({ms*2:.1f} Mvalues/s)")

    # host packing cost for scale (not on the device critical path)
    from wvpk.engine.device_encoder import _final_flush, pack_segments
    from wvpk.ops.encode_kernels import decorr_invert, entropy_encode_words
    targ, terms16, deltas16, nt, med0, nvals = stage(L // 4, T)
    res = decorr_invert(targ, terms16, deltas16, nt, mono=False)
    words = res.transpose(0, 2, 1).reshape(2 * T, L // 4)
    segs = [np.asarray(x) for x in
            entropy_encode_words(words, med0, nvals, mono=False)]
    t0 = time.perf_counter()
    pack_segments(*segs[:5], _final_flush(*segs[5:]))
    dt = time.perf_counter() - t0
    print(f"host packing: {dt*1e3:.1f} ms for {L//4}x{T} frames "
          f"({(L//4)*T/dt/1e6:.1f} Mframes/s)")


if __name__ == "__main__":
    main()
