"""Measure fused total vs entropy+decorr now that decorr is Pallas."""
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
    from wvpk.ops.entropy_pallas import entropy_decode_pallas
    from wvpk.ops.decorr_select import decorr_decode_any
    from wvpk.ops.post import joint_mute_crc, fixup
    from wvpk.ops.pack import pack_samples

    files, _n = make_corpus(48, 4.0, 4096)
    states = []
    for data in files:
        states += [b.state for b in parse_blocks(data)]
    b = max(group_blocks(states), key=lambda x: len(x.states))
    prof = b.profile
    frames = int(np.sum(b.nwords_lane)) // 2
    names = ("words", "nwords_lane", "nsamples", "med", "slow", "acc",
             "delta", "terms", "deltas16", "wa", "wb", "hist_a", "hist_b",
             "num_terms", "joint", "mute_limit", "shift", "bytes_stored",
             "float_shift_eff", "int32_zod")
    dev = {k: jax.device_put(getattr(b, k)) for k in names}
    for v in dev.values():
        np.asarray(v)
    ntm = int(b.num_terms.max())

    @jax.jit
    def fused():
        out, crc, mute = fused_decode(
            *(dev[k] for k in names), mono=prof.mono, hybrid=prof.hybrid,
            hybrid_bitrate=prof.hybrid_bitrate,
            hybrid_balance=prof.hybrid_balance, is_float=prof.is_float,
            int32_expand=False, nsteps=prof.nsteps, num_terms_max=ntm)
        packed = pack_samples(out, bps=2)
        return jnp.sum(crc) + jnp.sum(packed.astype(jnp.int32))

    t = timed(fused)
    print(f"fused+pack: {t*1e3:6.1f} ms  {frames/t/1e6:6.2f} Mframes/s "
          f"({frames/t/44100:.0f}x)")

    words_u32 = jax.block_until_ready(
        jnp.asarray(dev["words"]).astype(jnp.uint32))

    @jax.jit
    def entdec():
        res, broke, _ = entropy_decode_pallas(
            words_u32, dev["nwords_lane"], dev["med"], mono=prof.mono,
            nsteps=prof.nsteps)
        d = decorr_decode_any(res, dev["terms"], dev["deltas16"], dev["wa"],
                              dev["wb"], dev["hist_a"], dev["hist_b"],
                              dev["num_terms"], mono=prof.mono,
                              num_terms_max=ntm)
        return jnp.sum(d)

    t2 = timed(entdec)
    print(f"entropy+decorr: {t2*1e3:6.1f} ms  -> post+pack = {1e3*(t-t2):.1f} ms")

    # post alone on materialized decorr output
    res, broke, _ = entropy_decode_pallas(
        words_u32, dev["nwords_lane"], dev["med"], mono=prof.mono,
        nsteps=prof.nsteps)
    d = decorr_decode_any(res, dev["terms"], dev["deltas16"], dev["wa"],
                          dev["wb"], dev["hist_a"], dev["hist_b"],
                          dev["num_terms"], mono=prof.mono, num_terms_max=ntm)
    np.asarray(jnp.sum(d))

    @jax.jit
    def post_only():
        out, crc, mute = joint_mute_crc(d, dev["nsamples"], dev["joint"],
                                        dev["mute_limit"], broke,
                                        mono=prof.mono)
        out = fixup(out, dev["shift"], dev["bytes_stored"],
                    dev["float_shift_eff"], dev["int32_zod"],
                    is_float=False, int32_expand=False, hybrid=False)
        return jnp.sum(crc) + jnp.sum(pack_samples(out, bps=2).astype(jnp.int32))

    t3 = timed(post_only)
    print(f"post+pack alone: {t3*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
