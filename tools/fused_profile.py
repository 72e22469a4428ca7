"""Stage-by-stage profile of the fused decode path with DEVICE-RESIDENT
inputs, separating H2D upload cost (tunnel-bound in dev) from compute.

Run: python tools/fused_profile.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, reps=4):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from bench import make_corpus
    from wvpk.container import parse_blocks
    from wvpk.engine.fused import fused_decode
    from wvpk.engine.staging import group_blocks
    from wvpk.ops.decorr import decorr_decode
    from wvpk.ops.entropy_pallas import entropy_decode_pallas
    from wvpk.ops.pack import pack_samples
    from wvpk.ops.post import fixup, joint_mute_crc

    files, _n = make_corpus(48, 4.0, 4096)
    states = []
    for data in files:
        states += [b.state for b in parse_blocks(data)]
    buckets = group_blocks(states)
    b = max(buckets, key=lambda x: len(x.states))
    prof = b.profile
    total_vals = int(np.sum(b.nwords_lane))
    total_frames = total_vals // (1 if prof.mono else 2)
    print(f"bucket: {len(b.states)} lanes, words {b.words.nbytes/1e6:.1f} MB,"
          f" {total_frames/1e6:.2f} Mframes")

    # H2D: upload everything once
    t0 = time.perf_counter()
    dev = {k: jax.device_put(getattr(b, k)) for k in (
        "words", "nwords_lane", "nsamples", "med", "slow", "acc", "delta",
        "terms", "deltas16", "wa", "wb", "hist_a", "hist_b", "num_terms",
        "joint", "mute_limit", "shift", "bytes_stored", "float_shift_eff",
        "int32_zod")}
    for v in dev.values():
        np.asarray(v)
    h2d = time.perf_counter() - t0
    print(f"H2D upload (once): {h2d*1e3:.0f} ms "
          f"({b.words.nbytes / h2d / 1e6:.1f} MB/s)")

    words_u32 = jnp.asarray(dev["words"]).astype(jnp.uint32)
    np.asarray(words_u32)

    # stage: entropy
    t_ent = timed(lambda: entropy_decode_pallas(
        words_u32, dev["nwords_lane"], dev["med"], mono=prof.mono,
        nsteps=prof.nsteps))
    print(f"entropy: {t_ent*1e3:6.1f} ms  "
          f"{total_frames/t_ent/1e6:7.2f} Mframes/s")

    res, broke, _ = entropy_decode_pallas(
        words_u32, dev["nwords_lane"], dev["med"], mono=prof.mono,
        nsteps=prof.nsteps)
    res = jax.block_until_ready(res)

    # stage: decorr
    t_dec = timed(lambda: decorr_decode(
        res, dev["terms"], dev["deltas16"], dev["wa"], dev["wb"],
        dev["hist_a"], dev["hist_b"], dev["num_terms"], mono=prof.mono))
    print(f"decorr:  {t_dec*1e3:6.1f} ms  "
          f"{total_frames/t_dec/1e6:7.2f} Mframes/s")

    dec = decorr_decode(res, dev["terms"], dev["deltas16"], dev["wa"],
                        dev["wb"], dev["hist_a"], dev["hist_b"],
                        dev["num_terms"], mono=prof.mono)

    # stage: joint/CRC/mute + fixup + pack
    def post():
        out, crc, mute = joint_mute_crc(dec, dev["nsamples"], dev["joint"],
                                        dev["mute_limit"], broke,
                                        mono=prof.mono)
        out = fixup(out, dev["shift"], dev["bytes_stored"],
                    dev["float_shift_eff"], dev["int32_zod"],
                    is_float=prof.is_float, int32_expand=False, hybrid=False)
        return pack_samples(out, bps=2)

    t_post = timed(post)
    print(f"post:    {t_post*1e3:6.1f} ms  "
          f"{total_frames/t_post/1e6:7.2f} Mframes/s")

    # fused, device-resident
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
        return pack_samples(out, bps=2), crc, mute

    t_fused = timed(fused)
    print(f"fused:   {t_fused*1e3:6.1f} ms  "
          f"{total_frames/t_fused/1e6:7.2f} Mframes/s "
          f"({total_frames/t_fused/44100:.0f}x realtime)")

    # fused with numpy inputs (current bench behavior: re-uploads words)
    def fused_np():
        out, crc, mute = fused_decode(
            b.words, b.nwords_lane, b.nsamples, b.med, b.slow, b.acc,
            b.delta, b.terms, b.deltas16, b.wa, b.wb, b.hist_a, b.hist_b,
            b.num_terms, b.joint, b.mute_limit, b.shift, b.bytes_stored,
            b.float_shift_eff, b.int32_zod, mono=prof.mono,
            hybrid=prof.hybrid, hybrid_bitrate=prof.hybrid_bitrate,
            hybrid_balance=prof.hybrid_balance, is_float=prof.is_float,
            int32_expand=False, nsteps=prof.nsteps)
        return pack_samples(out, bps=2), crc, mute

    t_np = timed(fused_np)
    print(f"fused(numpy inputs, re-upload): {t_np*1e3:6.1f} ms  "
          f"{total_frames/t_np/1e6:7.2f} Mframes/s")


if __name__ == "__main__":
    main()
