"""Microbenches for the Pallas entropy-kernel cost model (run on the TPU).

Measures per-iteration costs as the SLOPE between two iteration counts
(cancels the axon tunnel's fixed ~27ms dispatch latency). Bodies use
xor/shift/add mixes that cannot constant-fold.

Run: python tools/kernel_microbench.py            (TPU via the axon tunnel)
One process, sequential runs only — the tunnel is single-client.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
IT_LO, IT_HI = 8192, 65536


def best_time(fn, *args, reps=4):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync (axon: asarray syncs)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def slope_us(make_run, x):
    t_lo = best_time(make_run(IT_LO), *x)
    t_hi = best_time(make_run(IT_HI), *x)
    return (t_hi - t_lo) / (IT_HI - IT_LO) * 1e6


def mix(v, t):
    """One non-foldable elementwise step (2 ops)."""
    return (v ^ t) + (v >> 1)


def bench_ops(nrows, shape, nmix):
    """Carry of `nrows` rows of `shape`; `nmix` mix steps (2 ops each) per
    row per iteration."""
    R = nrows * shape[0]
    x = jnp.ones((R, shape[1]), I32)

    def make_run(iters):
        def kernel(x_ref, o_ref):
            rows = [x_ref[k * shape[0]:(k + 1) * shape[0], :]
                    for k in range(nrows)]

            def body(t, carry):
                carry = list(carry)
                for k in range(nrows):
                    v = carry[k]
                    for _ in range(nmix):
                        v = mix(v, t)
                    carry[k] = v
                return tuple(carry)

            fin = jax.lax.fori_loop(0, iters, body, tuple(rows))
            for k in range(nrows):
                o_ref[k * shape[0]:(k + 1) * shape[0], :] = fin[k]

        @jax.jit
        def run(x):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kernel,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((R, shape[1]), I32),
                )(x)
        return run

    return slope_us(make_run, (x,))


def bench_sweep(w, lanes, rows=1):
    """Select-reduce word fetch over a (w, lanes) table per iteration;
    `rows` stacked fetches share one iteration (state shaped (rows, lanes))."""
    words = jnp.ones((w, lanes), I32)
    idx = jnp.zeros((rows, lanes), I32)

    def make_run(iters):
        def kernel(words_ref, idx_ref, o_ref):
            wtab = words_ref[...]
            iota_w = jax.lax.broadcasted_iota(I32, (w, 1), 0)

            def body(t, carry):
                acc = []
                for r in range(rows):
                    c = carry[r:r + 1, :]
                    m = iota_w == ((c + t) & (w - 1))
                    got = jnp.sum(jnp.where(m, wtab, I32(0)), axis=0,
                                  keepdims=True, dtype=I32)
                    acc.append(c + got)
                return jnp.concatenate(acc, axis=0) if rows > 1 else acc[0]

            o_ref[...] = jax.lax.fori_loop(0, iters, body, idx_ref[...])

        @jax.jit
        def run(words, idx):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kernel,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((rows, lanes), I32),
                )(words, idx)
        return run

    return slope_us(make_run, (words, idx))


def bench_when(lanes, nwhen, taken):
    """Per iteration, `nwhen` (scalar-reduce + pl.when) pairs; `taken`
    controls whether the branch body executes."""
    x = jnp.full((1, lanes), 1 if taken else -1, I32)

    def make_run(iters):
        def kernel(x_ref, o_ref, tmp):
            def body(t, carry):
                for _ in range(nwhen):
                    any_ = jnp.max(jnp.where(carry > 0, I32(1), I32(0)))

                    @pl.when(any_ > 0)
                    def _w():
                        tmp[...] = mix(carry, t)

                    carry = jnp.where(carry > 0, tmp[...] & 1, carry)
                return carry

            o_ref[...] = jax.lax.fori_loop(0, iters, body, x_ref[...])

        @jax.jit
        def run(x):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kernel,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((1, lanes), I32)],
                    out_shape=jax.ShapeDtypeStruct((1, lanes), I32),
                )(x)
        return run

    return slope_us(make_run, (x,))


def main():
    print("devices:", jax.devices())

    print("\n-- elementwise issue: 25 rows x 8 mix (=400 ops) by shape --")
    for shape in [(1, 128), (1, 256), (1, 512), (8, 128), (8, 256), (8, 512)]:
        us = bench_ops(25, shape, nmix=8)
        lanes = shape[0] * shape[1]
        print(f"  25x{shape} ({lanes:5d} lanes): {us:8.3f} us/iter"
              f"  -> {us / lanes * 1e3:7.3f} ns/lane")

    print("\n-- elementwise issue: op-count scaling at (1, 256) --")
    for nmix in [0, 2, 8, 32]:
        us = bench_ops(25, (1, 256), nmix)
        print(f"  25 rows x {nmix:2d} mix ({50 * nmix:4d} ops): "
              f"{us:8.3f} us/iter")

    print("\n-- select-reduce sweep (word fetch) --")
    for w, lanes, rows in [(2048, 256, 1), (2048, 512, 1), (1024, 512, 1),
                           (2048, 256, 2), (2048, 128, 8)]:
        us = bench_sweep(w, lanes, rows)
        print(f"  W={w} lanes={lanes} rows={rows}: {us:8.3f} us/iter"
              f"  -> {us / (lanes * rows) * 1e3:7.3f} ns/lane-fetch")

    print("\n-- pl.when + scalar reduce --")
    for nwhen, taken in [(1, True), (1, False), (4, True), (4, False)]:
        us = bench_when(256, nwhen, taken)
        print(f"  {nwhen} when/iter taken={taken}: {us:8.3f} us/iter")


def _main_all():
    main()


def bench_dynstore(lanes, mode):
    """Per iteration: one (1, lanes) store into a (256, lanes) VMEM out at a
    dynamic row. mode: 'dyn' = row t&255, 'aligned8' = row (t*8)&255 every
    iteration, 'none' = no store, 'tmp_rt' = tmp scratch write+read."""
    x = jnp.ones((1, lanes), I32)

    def make_run(iters):
        def kernel(x_ref, o_ref, tmp):
            def body(t, carry):
                carry = mix(carry, t)
                if mode == "dyn":
                    o_ref[pl.ds(t & 255, 1), :] = carry
                elif mode == "aligned8":
                    o_ref[pl.ds((t * 8) & 255, 1), :] = carry
                elif mode == "tmp_rt":
                    for r in range(6):
                        tmp[r:r + 1, :] = carry + r
                    for r in range(6):
                        carry = carry ^ tmp[r:r + 1, :]
                return carry

            fin = jax.lax.fori_loop(0, iters, body, x_ref[...])
            o_ref[0:1, :] = fin

        @jax.jit
        def run(x):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kernel,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((10, lanes), I32)],
                    out_shape=jax.ShapeDtypeStruct((256, lanes), I32),
                )(x)
        return run

    return slope_us(make_run, (x,))


def main2():
    print("\n-- dynamic-row VMEM store / tmp scratch round trip --")
    for mode in ["none", "dyn", "aligned8", "tmp_rt"]:
        for lanes in [256, 512]:
            us = bench_dynstore(lanes, mode)
            print(f"  {mode:9s} lanes={lanes}: {us:8.3f} us/iter")


if __name__ == "__main__":
    main2()
