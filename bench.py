"""Benchmark: batch .wv decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: decoded Msamples/sec/chip on BASELINE config 2 (batch of stereo
lossless 16-bit/44.1kHz files). vs_baseline is the realtime factor divided
by the 100x north-star target (BASELINE.json; the reference publishes no
numbers, so the derived floor 4.41 Msamples/s/chip = 1.0).
"""

import json
import os
import sys
import time

import numpy as np


def make_corpus(n_files: int, seconds: float, block_samples: int,
                seed: int = 0):
    """Synthesize stereo 16-bit 44.1kHz musical-ish PCM and encode to .wv."""
    from wvpk.testgen import EncodeSpec, encode_file

    rng = np.random.default_rng(seed)
    n = int(44100 * seconds)
    t = np.arange(n)
    files = []
    for i in range(n_files):
        f0 = 220 * (1 + (i % 7))
        sig = (6000 * np.sin(2 * np.pi * f0 * t / 44100)
               + 2500 * np.sin(2 * np.pi * 2.01 * f0 * t / 44100)
               + rng.normal(0, 400, n))
        pcm = np.stack([np.round(sig), np.round(sig * 0.8 +
                                                rng.normal(0, 200, n))],
                       axis=1).astype(np.int64)
        np.clip(pcm, -32768, 32767, out=pcm)
        spec = EncodeSpec(block_samples=block_samples, joint=True,
                          terms=(18, 17, 2), deltas=(2, 2, 2))
        files.append(encode_file(pcm, spec))
    return files, n


def main():
    n_files = int(os.environ.get("WVPK_BENCH_FILES", "12"))
    seconds = float(os.environ.get("WVPK_BENCH_SECONDS", "4.0"))
    block_samples = int(os.environ.get("WVPK_BENCH_BLOCK", "4096"))

    from wvpk.container import parse_blocks
    from wvpk.engine import decode_states

    files, n = make_corpus(n_files, seconds, block_samples)
    states = []
    for data in files:
        states += [b.state for b in parse_blocks(data)]
    total_samples = sum(st.header.block_samples for st in states)

    # warmup (compile)
    decode_states(states[:len(states)])
    # timed runs
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        results = decode_states(states)
        t1 = time.perf_counter()
        best = min(best, t1 - t0)
    assert not any(r.crc_error for r in results), "bench corpus must decode clean"

    msamples = total_samples / best / 1e6
    realtime = (total_samples / 44100) / best
    vs_baseline = msamples / 4.41  # 100x-realtime floor, BASELINE.md
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(msamples, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
