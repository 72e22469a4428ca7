"""Hardware differential sweep: decode_states on the real TPU vs the
scalar oracle, over randomized mode-matrix specs (PCM + DSD).

Run with the TPU visible (default env): `python tools/hw_sweep.py [n]`.
The CI suite runs the same logic CPU-side (tests/test_fuzz_differential);
this script validates the exact hardware path the bench ships.
"""

import sys

import numpy as np

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def main(n_cases: int = 30, n_dsd: int = 8) -> int:
    from test_fuzz_differential import random_pcm, random_spec

    from wvpk.container import parse_blocks
    from wvpk.engine import decode_states
    from wvpk.ref import decode_block
    from wvpk.testgen import encode_dsd_file, encode_file

    fails = blocks_checked = 0
    for seed in range(n_cases):
        rng = np.random.default_rng(7000 + seed)
        spec = random_spec(rng)
        n = int(rng.integers(spec.block_samples // 2,
                             spec.block_samples * 2 + 1))
        pcm = random_pcm(rng, n, spec.nch_data, spec.bytes_stored, spec.shift)
        data = encode_file(pcm, spec)
        if rng.random() < 0.2:
            data = bytearray(data)
            data[int(rng.integers(64, len(data)))] ^= int(rng.integers(1, 256))
            data = bytes(data)
        blocks = parse_blocks(data)
        dev = decode_states([b.state for b in blocks])
        for blk, d in zip(blocks, dev):
            want = decode_block(blk.state)
            blocks_checked += 1
            if not (np.array_equal(d.samples, want.samples)
                    and d.mute_error == want.mute_error
                    and d.crc_error == want.crc_error):
                fails += 1
                print(f"MISMATCH seed {seed}: {spec}")
    for seed in range(n_dsd):
        rng = np.random.default_rng(8000 + seed)
        mode = int(rng.choice([0, 1, 3]))
        mono = bool(rng.random() < 0.3)
        ch = 1 if mono else 2
        d = rng.integers(0, 256, (int(rng.integers(200, 800)), ch))
        data = encode_dsd_file(d.astype(np.int64), mode, mono=mono,
                               history_bits=2)
        blocks = parse_blocks(data)
        dev = decode_states([b.state for b in blocks])
        for blk, dd in zip(blocks, dev):
            want = decode_block(blk.state)
            blocks_checked += 1
            if not np.array_equal(dd.samples, want.samples):
                fails += 1
                print(f"DSD MISMATCH seed {seed} mode {mode}")
    print(f"hardware differential sweep: {blocks_checked} blocks, "
          f"{fails} mismatches")
    return 1 if fails else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sys.exit(main(n))
