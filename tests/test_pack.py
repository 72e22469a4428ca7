"""Device byte packing vs the host formatter (reference semantics)."""

import numpy as np
import pytest

from wvpk.io.pcm import format_samples
from wvpk.ops.pack import pack_samples


@pytest.mark.parametrize("bps", [1, 2, 3, 4])
@pytest.mark.parametrize("dsd", [False, True])
def test_pack_matches_host(bps, dsd):
    if dsd and bps != 1:
        pytest.skip("dsd applies to 1 byte/sample only")
    rng = np.random.default_rng(bps)
    T, L, C = 64, 3, 2
    lo, hi = (0, 256) if dsd else (-(1 << (bps * 8 - 1)), 1 << (bps * 8 - 1))
    samples = rng.integers(lo, hi, size=(T, L, C)).astype(np.int32)
    packed = np.asarray(pack_samples(samples, bps=bps, dsd=dsd))
    for lane in range(L):
        want = format_samples(samples[:, lane, :], bps, dsd=dsd)
        got = packed[lane].astype("<u4").tobytes()[:len(want)]
        assert got == want, f"lane {lane} bps {bps}"
