"""PCM byte formatting (reference WavpackFormatSamples,
WavPackUtils.cs:288-341): int32 samples -> little-endian bytes at 1-4
bytes/sample; 8-bit gets the +128 unsigned offset unless DSD."""

from __future__ import annotations

import numpy as np


def format_samples(samples: np.ndarray, bps: int, dsd: bool = False) -> bytes:
    """samples: (n, ch) or flat int32 array in interleaved order."""
    flat = np.ascontiguousarray(samples, dtype=np.int32).reshape(-1)
    if bps == 1:
        if dsd:
            return flat.astype(np.uint8).tobytes()
        return ((flat + 128) & 0xFF).astype(np.uint8).tobytes()
    if bps == 2:
        return flat.astype("<i2", casting="unsafe").tobytes()
    if bps == 3:
        b = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
        return np.ascontiguousarray(b[:, :3]).tobytes()
    if bps == 4:
        return flat.astype("<i4").tobytes()
    raise ValueError(f"bad bytes/sample {bps}")
