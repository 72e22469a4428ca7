"""Time the Pallas decorr kernel vs XLA scan on the bench bucket (TPU)."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def timed(fn, reps=4):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from bench import make_corpus
    from wvpk.container import parse_blocks
    from wvpk.engine.staging import group_blocks
    from wvpk.ops.decorr import decorr_decode
    from wvpk.ops.decorr_pallas import decorr_decode_pallas

    files, _n = make_corpus(48, 4.0, 4096)
    states = []
    for data in files:
        states += [b.state for b in parse_blocks(data)]
    b = max(group_blocks(states), key=lambda x: len(x.states))
    prof = b.profile
    frames = int(np.sum(b.nwords_lane)) // (1 if prof.mono else 2)
    T = prof.nsteps // (1 if prof.mono else 2)
    L = len(b.states)
    rng = np.random.default_rng(0)
    res = jax.device_put(
        rng.integers(-2**14, 2**14, (T, L, 2)).astype(np.int32))
    dev = {k: jax.device_put(getattr(b, k)) for k in (
        "terms", "deltas16", "wa", "wb", "hist_a", "hist_b", "num_terms")}
    np.asarray(jnp.sum(res))
    ntm = int(b.num_terms.max())
    print(f"{L} lanes, T={T}, num_terms_max={ntm}, {frames/1e6:.2f} Mframes")

    @jax.jit
    def pallas():
        return jnp.sum(decorr_decode_pallas(
            res, dev["terms"], dev["deltas16"], dev["wa"], dev["wb"],
            dev["hist_a"], dev["hist_b"], dev["num_terms"], mono=prof.mono,
            num_terms_max=ntm))

    @jax.jit
    def xla():
        return jnp.sum(decorr_decode(
            res, dev["terms"], dev["deltas16"], dev["wa"], dev["wb"],
            dev["hist_a"], dev["hist_b"], dev["num_terms"], mono=prof.mono))

    # correctness on hardware first
    got = np.asarray(pallas())
    want = np.asarray(xla())
    print(f"checksum match: {got == want} ({got} vs {want})")

    t_p = timed(pallas)
    print(f"pallas: {t_p*1e3:7.1f} ms  {frames/t_p/1e6:7.2f} Mframes/s")
    t_x = timed(xla)
    print(f"xla:    {t_x*1e3:7.1f} ms  {frames/t_x/1e6:7.2f} Mframes/s")
    print(f"speedup: {t_x/t_p:.1f}x")


if __name__ == "__main__":
    main()
