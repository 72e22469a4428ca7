"""Pallas DSD kernels (modes 1 + 3) on the real TPU: CRC-gated + timed."""
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


def main():
    from tools.dsd_profile import build
    from wvpk.engine.dsd_pipeline import _pad_bytes, _profile
    from wvpk.ops.dsd_pallas import dsd_high_decode_pallas

    L, n = 512, 4096
    states = [st for st in build(3, L, n) if _profile(st).mode == 3]
    prof = _profile(states[0])
    data = _pad_bytes([st.dsd.data for st in states], prof.nbytes_cap)
    nbytes = np.asarray([len(st.dsd.data) for st in states], np.int64)
    ptable = np.stack([st.dsd.ptable for st in states]).astype(np.int32)
    filters = np.stack([st.dsd.filters for st in states]).astype(np.int32)
    value0 = np.asarray([st.dsd.value for st in states],
                        np.uint32).view(np.int32)
    nsamples = np.asarray([st.header.block_samples for st in states],
                          np.int32)
    hdr = np.asarray([st.header.crc for st in states], np.int32)
    args = [jax.device_put(x) for x in
            (data, nbytes, ptable, filters, value0, nsamples)]
    for a in args:
        np.asarray(a)
    total = int(nsamples.sum()) * 2

    def run():
        out, crc = dsd_high_decode_pallas(*args, mono=False,
                                          nsteps=prof.nsteps)
        return crc

    crc = np.asarray(run())
    ok = (crc == hdr).all()
    print(f"L={len(states)} nsteps={prof.nsteps} CRC gate: "
          f"{'PASS' if ok else 'FAIL'} ({(crc == hdr).sum()}/{len(crc)})")
    assert ok
    t = timed(run)
    print(f"pallas high: {t*1e3:.0f} ms -> {total/t/1e6:.2f} Mbytevals/s "
          f"({total/t/705600:.0f}x DSD64-stereo realtime)")


def main_fast():
    from tools.dsd_profile import build
    from wvpk.engine.dsd_pipeline import _pad_bytes, _profile
    from wvpk.ops.dsd_pallas import dsd_fast_decode_pallas

    L, n = 512, 4096
    states = [st for st in build(1, L, n) if _profile(st).mode == 1]
    prof = _profile(states[0])
    B = prof.bins
    data = _pad_bytes([st.dsd.data for st in states], prof.nbytes_cap)
    nbytes = np.asarray([len(st.dsd.data) for st in states], np.int64)
    summed = np.stack([st.dsd.summed_probabilities.astype(np.int32)
                       .reshape(-1) for st in states])
    value0 = np.asarray([st.dsd.value for st in states],
                        np.uint32).view(np.int32)
    nsamples = np.asarray([st.header.block_samples for st in states],
                          np.int32)
    nvals = (nsamples * 2).astype(np.int32)
    hdr = np.asarray([st.header.crc for st in states], np.int32)
    args = [jax.device_put(x) for x in (data, nbytes, summed, value0, nvals)]
    for a in args:
        np.asarray(a)
    total = int(nvals.sum())

    def run():
        out, err, crc = dsd_fast_decode_pallas(
            *args, bins=B, mono=False, nsteps=prof.nsteps)
        return crc

    crc = np.asarray(run())
    ok = (crc == hdr).all()
    print(f"fast: L={len(states)} bins={B} nsteps={prof.nsteps} CRC gate: "
          f"{'PASS' if ok else 'FAIL'} ({(crc == hdr).sum()}/{len(crc)})")
    assert ok
    t = timed(run)
    print(f"pallas fast: {t*1e3:.0f} ms -> {total/t/1e6:.2f} Mbytevals/s "
          f"({total/t/705600:.0f}x DSD64-stereo realtime)")


if __name__ == "__main__":
    if "fast" in sys.argv:
        main_fast()
    elif "high" in sys.argv:
        main()
    else:
        main_fast()
        main()
