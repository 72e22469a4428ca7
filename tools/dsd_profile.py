"""Slope-based DSD kernel throughput on the real TPU (compute-only)."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def timed(fn, reps=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def build(mode, L, n, history_bits=2):
    import pickle, os, hashlib
    tag = f"dsdprof_{mode}_{L}_{n}" + (
        f"_hb{history_bits}" if history_bits != 2 else "")
    cache = os.path.expanduser("~/.cache/wvpk-bench")
    path = os.path.join(cache, tag + ".pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    from wvpk.container import parse_blocks
    from wvpk.testgen import encode_dsd_file
    rng = np.random.default_rng(0)
    states = []
    for i in range(L):
        d = rng.integers(0, 256, (n, 2))
        data = encode_dsd_file(d.astype(np.int64), mode,
                               history_bits=history_bits)
        states += [b.state for b in parse_blocks(data)
                   if b.state.header.block_samples]
    os.makedirs(cache, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(states, f)
    return states


def main():
    from wvpk.engine.dsd_pipeline import _pad_bytes, _profile
    from wvpk.ops.dsd import dsd_fast_decode, dsd_high_decode

    for mode in (1, 3):
        L, n = int(__import__('os').environ.get('DSDL', 64)), 4096
        states = build(mode, L, n)
        states = [st for st in states if _profile(st).mode == mode]
        sts = states
        prof = _profile(sts[0])
        chans = 2
        nsamples = np.asarray([st.header.block_samples for st in sts], np.int32)
        nvals = nsamples * chans
        data = jax.device_put(_pad_bytes([st.dsd.data for st in sts],
                                         prof.nbytes_cap))
        nbytes = jax.device_put(np.asarray(
            [len(st.dsd.data) for st in sts], np.int64))
        total = int(nvals.sum())
        if mode == 1:
            B = prof.bins
            summed = np.zeros((len(sts), B * 256), np.int32)
            probs = np.zeros((len(sts), B * 256), np.int32)
            vlook = np.zeros((len(sts), B), np.int32)
            lookup = np.zeros((len(sts), prof.lookup_cap), np.int32)
            value0 = np.zeros(len(sts), np.int64)
            for k, st in enumerate(sts):
                d = st.dsd
                summed[k] = d.summed_probabilities.astype(np.int32).reshape(-1)
                probs[k] = d.probabilities.astype(np.int32).reshape(-1)
                vlook[k] = d.value_lookup
                lookup[k, :d.lookup_buffer.size] = d.lookup_buffer
                value0[k] = d.value
            args = [jax.device_put(x) for x in
                    (summed, probs, vlook, lookup, value0,
                     np.full(len(sts), B, np.int64), nvals)]

            def run(nsteps):
                o, e, c = dsd_fast_decode(data, nbytes, *args, mono=False,
                                          nsteps=nsteps)
                return jnp.sum(c)
        else:
            ptable = jax.device_put(np.stack(
                [st.dsd.ptable for st in sts]).astype(np.int32))
            filters = jax.device_put(np.stack(
                [st.dsd.filters for st in sts]).astype(np.int32))
            value0 = jax.device_put(np.asarray(
                [st.dsd.value for st in sts], np.int64))
            ns = jax.device_put(nsamples)

            def run(nsteps):
                o, c = dsd_high_decode(data, nbytes, ptable, filters, value0,
                                       ns, mono=False, nsteps=nsteps)
                return jnp.sum(c)

        full = prof.nsteps
        t_f = timed(lambda: run(full))
        t_h = timed(lambda: run(full // 2))
        slope = (t_f - t_h) / (full - full // 2)
        print(f"mode {mode}: L={len(sts)} nsteps={full} t={t_f*1e3:.0f}ms "
              f"slope={slope*1e6:.2f} us/step "
              f"-> {total / t_f / 1e6:.2f} Mbytevals/s "
              f"(DSD64 stereo realtime = {total / t_f / 705600:.0f}x)")


if __name__ == "__main__":
    main()
