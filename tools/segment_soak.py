"""Chain-segment soak: batch many distinct-chain files into ONE
decode_states call so mixed-chain buckets form and the per-class decorr
segments run on the CURRENT backend (real kernels on TPU), then gate
every block against the scalar oracle.

The regular fuzz sweeps decode one file per call, so their buckets are
chain-uniform and segments never fire; this soak is the randomized
pressure for the segmented path (decorr_segment_min is dropped to 2 so
even small classes specialize, and class counts/ragged tails vary).

Usage: python tools/segment_soak.py [seed_base] [n_rounds]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/wvpk-jax-cache"))

TERM_POOL = [1, 2, 3, 4, 5, 6, 7, 8, 17, 18, -1, -2, -3]


def random_chain(rng, mono):
    n = int(rng.integers(1, 11))
    pool = [t for t in TERM_POOL if t > 0] if mono else TERM_POOL
    return tuple(int(t) for t in rng.choice(pool, n))


def run_pool(seed_base: int, n_rounds: int) -> tuple[int, int]:
    from wvpk import config
    from wvpk.container import parse_blocks
    from wvpk.engine import decode_states
    from wvpk.engine.staging import group_blocks
    from wvpk.ref import decode_block
    from wvpk.testgen import EncodeSpec, encode_file

    config.set_options(decorr_segment_min=2)
    fails = blocks = segmented_buckets = 0
    # fixed per-pool chain pool: every distinct chain compiles its own
    # specialized kernel variant, so sampling chains from a small pool
    # keeps TPU compile time bounded while the DATA stays fresh per round
    pool_rng = np.random.default_rng(seed_base)
    chain_pool = {m: [random_chain(pool_rng, m) for _ in range(6)]
                  for m in (False, True)}
    try:
        for r in range(n_rounds):
            rng = np.random.default_rng(seed_base + 1 + r)
            mono = bool(rng.random() < 0.25)
            bs = int(rng.choice([256, 300, 512]))
            n_files = int(rng.integers(3, 9))
            states, wants = [], []
            for _ in range(n_files):
                chain = chain_pool[mono][int(rng.integers(0, 6))]
                nblk = int(rng.integers(2, 8))
                n = bs * nblk - int(rng.integers(0, bs // 2))
                pcm = np.round(rng.normal(
                    0, rng.uniform(200, 6000),
                    (n, 1 if mono else 2))).astype(np.int64)
                np.clip(pcm, -32768, 32767, out=pcm)
                spec = EncodeSpec(
                    block_samples=bs, mono=mono,
                    joint=bool(rng.random() < 0.5) and not mono,
                    terms=chain,
                    deltas=tuple(int(d) for d in
                                 rng.integers(1, 4, len(chain))))
                data = encode_file(pcm, spec)
                states += [b.state for b in parse_blocks(data)]
            # interleave so staging must reorder
            order = rng.permutation(len(states))
            states = [states[i] for i in order]
            for b in group_blocks(states):
                if b.chain_segments is not None:
                    segmented_buckets += 1
            dev = decode_states(states)
            for st, d in zip(states, dev):
                want = decode_block(st)
                blocks += 1
                if not (np.array_equal(d.samples, want.samples)
                        and d.mute_error == want.mute_error
                        and d.crc_error == want.crc_error):
                    fails += 1
                    print(f"MISMATCH round {r} block {st.header.block_index}")
            if (r + 1) % 5 == 0:
                print(f"... {r + 1}/{n_rounds} rounds, {blocks} blocks, "
                      f"{segmented_buckets} segmented buckets, "
                      f"{fails} fails", flush=True)
    finally:
        config.set_options(decorr_segment_min=64)
    return fails, blocks


def main():
    seed_base = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    fails, blocks = run_pool(seed_base, n_rounds)
    print(f"segment soak pool {seed_base}: {blocks} blocks, {fails} fails")
    assert fails == 0


if __name__ == "__main__":
    main()
