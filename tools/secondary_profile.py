"""Stage shares for the secondary bench configs (mc51 24-bit, hybrid,
float): per-stage times with scalar-only syncs on the real chip.
Usage: python tools/secondary_profile.py [mc51|hybrid|float ...]"""
import os, sys, time
from functools import partial
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/wvpk-jax-cache"))
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


def slope(fn, k_lo=1, k_hi=5, reps=3):
    """Per-call cost free of the fixed fetch RTT: enqueue k calls, fetch
    ONE stacked scalar; slope between k_lo and k_hi isolates
    (dispatch + compute) per call — the cost a batched decode round
    actually pays."""
    def run(k):
        outs = [fn() for _ in range(k)]
        return np.asarray(jnp.stack(outs))
    run(1)
    t = {}
    for k in (k_lo, k_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(k)
            best = min(best, time.perf_counter() - t0)
        t[k] = best
    return (t[k_hi] - t[k_lo]) / (k_hi - k_lo)


def profile_bucket(b, tag):
    from wvpk.engine.fused import fused_decode
    from wvpk.ops.entropy_select import entropy_decode_any
    from wvpk.ops.decorr_select import decorr_decode_any
    from wvpk.ops.post import joint_mute_crc, fixup

    prof = b.profile
    names = ("words", "nwords_lane", "nsamples", "med", "slow", "acc",
             "delta", "terms", "deltas16", "wa", "wb", "hist_a", "hist_b",
             "num_terms", "joint", "mute_limit", "shift", "bytes_stored",
             "float_shift_eff", "int32_zod")
    dev = {k: jax.device_put(getattr(b, k)) for k in names}
    for v in dev.values():
        np.asarray(v)
    frames = int(np.sum(b.nsamples))
    ntm = int(b.num_terms.max())
    kw = dict(mono=prof.mono, hybrid=prof.hybrid,
              hybrid_bitrate=prof.hybrid_bitrate,
              hybrid_balance=prof.hybrid_balance, nsteps=prof.nsteps)

    @jax.jit
    def full():
        out, crc, mute = fused_decode(
            *(dev[k] for k in names), **kw, is_float=prof.is_float,
            int32_expand=prof.is_int32 and not prof.has_wvx,
            num_terms_max=ntm, static_terms=b.static_terms,
            chain_segments=b.chain_segments)
        return jnp.sum(out) + jnp.sum(crc)

    @jax.jit
    def ent():
        r, broke, nd = entropy_decode_any(
            dev["words"], dev["nwords_lane"], dev["med"], dev["slow"],
            dev["acc"], dev["delta"], **kw)
        return jnp.sum(r) + jnp.sum(nd)

    @jax.jit
    def ent_dec():
        r, broke, nd = entropy_decode_any(
            dev["words"], dev["nwords_lane"], dev["med"], dev["slow"],
            dev["acc"], dev["delta"], **kw)
        d = decorr_decode_any(r, dev["terms"], dev["deltas16"], dev["wa"],
                              dev["wb"], dev["hist_a"], dev["hist_b"],
                              dev["num_terms"], mono=prof.mono,
                              num_terms_max=ntm)
        return jnp.sum(d)

    t_full = slope(full)
    t_ent = slope(ent)
    t_ed = slope(ent_dec)
    L = b.words.shape[0]
    print(f"{tag}: L={L} nsteps={prof.nsteps} ntm={ntm} frames={frames/1e6:.2f}M | "
          f"full {t_full*1e3:.1f} ms ({frames/t_full/1e6:.1f} Ms/s, "
          f"{t_full/frames*1e9:.2f} ns/frame) | "
          f"entropy {t_ent*1e3:.1f} ms ({t_ent/frames*1e9:.2f} ns/f) | "
          f"+decorr {t_ed*1e3:.1f} ms "
          f"(decorr ~{(t_ed-t_ent)*1e3:.1f} ms, post ~{(t_full-t_ed)*1e3:.1f} ms)",
          flush=True)


def main():
    from bench import _cache_blob, _make_mc51, _make_hybrid, _make_float
    from wvpk.container import parse_blocks
    from wvpk.engine.staging import group_blocks

    which = sys.argv[1:] or ["mc51", "hybrid", "float"]
    builders = {"mc51": ("mc51_v6", _make_mc51),
                "hybrid": ("hybrid_v6", _make_hybrid),
                "float": ("float_v4", _make_float)}
    for w in which:
        tag, builder = builders[w]
        files, _n = _cache_blob(tag, builder)
        states = []
        for data in files:
            states += [b.state for b in parse_blocks(data)]
        for b in group_blocks(states):
            profile_bucket(b, f"{w}[{len(b.states)} lanes]")


if __name__ == "__main__":
    main()
