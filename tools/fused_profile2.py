"""Stage profile syncing ONLY tiny scalars (compute-isolated; the tunnel
moves MBs at ~10MB/s so any big D2H poisons timings)."""
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
    from wvpk.engine.fused import fused_decode
    from wvpk.engine.staging import group_blocks
    from wvpk.ops.decorr import decorr_decode
    from wvpk.ops.entropy_pallas import entropy_decode_pallas
    from wvpk.ops.pack import pack_samples

    files, _n = make_corpus(48, 4.0, 4096)
    states = []
    for data in files:
        states += [b.state for b in parse_blocks(data)]
    buckets = group_blocks(states)
    b = max(buckets, key=lambda x: len(x.states))
    prof = b.profile
    total_vals = int(np.sum(b.nwords_lane))
    frames = total_vals // (1 if prof.mono else 2)
    print(f"{len(b.states)} lanes, {frames/1e6:.2f} Mframes")

    t0 = time.perf_counter()
    dev = {k: jax.device_put(getattr(b, k)) for k in (
        "words", "nwords_lane", "nsamples", "med", "slow", "acc", "delta",
        "terms", "deltas16", "wa", "wb", "hist_a", "hist_b", "num_terms",
        "joint", "mute_limit", "shift", "bytes_stored", "float_shift_eff",
        "int32_zod")}
    s = sum(jnp.sum(v.astype(jnp.int32) if v.dtype == bool else v) for v in dev.values())
    np.asarray(s)
    h2d = time.perf_counter() - t0
    print(f"H2D all inputs: {h2d*1e3:.0f} ms ({b.words.nbytes/h2d/1e6:.1f} MB/s)")
    words_u32 = jax.block_until_ready(jnp.asarray(dev["words"]).astype(jnp.uint32))

    @jax.jit
    def ent():
        res, broke, ndec = entropy_decode_pallas(
            words_u32, dev["nwords_lane"], dev["med"], mono=prof.mono,
            nsteps=prof.nsteps)
        return jnp.sum(res), res

    t = timed(lambda: ent()[0])
    print(f"entropy: {t*1e3:6.1f} ms  {frames/t/1e6:7.2f} Mframes/s")
    res = ent()[1]

    @jax.jit
    def dec():
        d = decorr_decode(res, dev["terms"], dev["deltas16"], dev["wa"],
                          dev["wb"], dev["hist_a"], dev["hist_b"],
                          dev["num_terms"], mono=prof.mono)
        return jnp.sum(d)

    t = timed(dec)
    print(f"decorr:  {t*1e3:6.1f} ms  {frames/t/1e6:7.2f} Mframes/s")

    @jax.jit
    def fused():
        out, crc, mute = fused_decode(
            words_u32, dev["nwords_lane"], dev["nsamples"], dev["med"],
            dev["slow"], dev["acc"], dev["delta"], dev["terms"],
            dev["deltas16"], dev["wa"], dev["wb"], dev["hist_a"],
            dev["hist_b"], dev["num_terms"], dev["joint"], dev["mute_limit"],
            dev["shift"], dev["bytes_stored"], dev["float_shift_eff"],
            dev["int32_zod"], mono=prof.mono, hybrid=prof.hybrid,
            hybrid_bitrate=prof.hybrid_bitrate,
            hybrid_balance=prof.hybrid_balance, is_float=prof.is_float,
            int32_expand=False, nsteps=prof.nsteps)
        packed = pack_samples(out, bps=2)
        return jnp.sum(crc) + jnp.sum(packed.astype(jnp.int32))

    t = timed(fused)
    print(f"fused+pack (compute only): {t*1e3:6.1f} ms  "
          f"{frames/t/1e6:7.2f} Mframes/s ({frames/t/44100:.0f}x realtime)")


if __name__ == "__main__":
    main()
