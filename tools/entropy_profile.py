"""Profile the production Pallas entropy kernel on the real TPU.

Times entropy_decode_pallas on the cached bench corpus at full and half
nsteps; the slope gives the true per-fori-iteration cost (fixed dispatch,
DMA, and epilogue cancel). Also reproduces the headline Msamples/s.

Run: python tools/entropy_profile.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sync(x):
    return np.asarray(x)


def timed(fn, reps=4):
    fn()  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax.numpy as jnp

    from bench import make_corpus
    from wvpk.container import parse_blocks
    from wvpk.engine.staging import group_blocks
    from wvpk.ops.entropy_pallas import entropy_decode_pallas

    files, _n = make_corpus(48, 4.0, 4096)
    states = []
    for data in files:
        states += [b.state for b in parse_blocks(data)]
    buckets = group_blocks(states)
    b = max(buckets, key=lambda x: len(x.states))
    prof = b.profile
    print(f"bucket: {len(b.states)} lanes, nsteps={prof.nsteps}, "
          f"mono={prof.mono}, words {b.words.shape} {b.words.dtype}")

    words = jnp.asarray(b.words).astype(jnp.uint32)
    med = jnp.asarray(b.med)
    nw = jnp.asarray(b.nwords_lane)

    def run(nsteps):
        res, broke, ndec = entropy_decode_pallas(
            words, nw, med, mono=prof.mono, nsteps=nsteps)
        sync(ndec)

    L = len(b.states)
    C = 1 if prof.mono else 2
    t_full = timed(lambda: run(prof.nsteps))
    t_half = timed(lambda: run(prof.nsteps // 2))
    T_full = prof.nsteps // C
    T_half = T_full // 2
    # iterations = T per lane-tile; tiles run sequentially in the grid
    from wvpk.ops.entropy_pallas import _lane_tile
    Wp = ((b.words.shape[1] + 7) // 8) * 8
    tile = _lane_tile(Wp)
    ntiles = (L + tile - 1) // tile
    slope = (t_full - t_half) / ((T_full - T_half) * ntiles)
    values = int(np.sum(np.asarray(b.nwords_lane)))
    print(f"lane_tile={tile} ntiles={ntiles} T={T_full}")
    print(f"t_full={t_full*1e3:.1f}ms t_half={t_half*1e3:.1f}ms")
    print(f"per-iteration slope: {slope*1e6:.3f} us "
          f"(decodes {C} values x {tile} lanes)")
    print(f"throughput (values): {values / t_full / 1e6:.2f} Mvalues/s; "
          f"frames: {values / C / t_full / 1e6:.2f} Msamples/s")


if __name__ == "__main__":
    main()
