"""Device PCM byte packing (WavpackFormatSamples fused on device).

int32 samples -> little-endian PCM byte stream packed into uint32 words,
per lane: bps 1 (with +128 offset unless DSD), 2, 3, and 4 bytes/sample
(reference WavPackUtils.cs:288-341). Keeping the pack on device completes
the fused decode graph and shrinks device->host transfers to the actual
PCM payload width.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

U32 = jnp.uint32


@partial(jax.jit, static_argnames=("bps", "dsd"))
def pack_samples(samples, *, bps: int, dsd: bool = False):
    """samples: (T, L, C) int32 -> (L, W) uint32 packed little-endian bytes.

    The per-lane byte stream is the interleaved (sample, channel) order;
    T*C*bps must be padded by the caller to a multiple of 4 via T.
    """
    T, L, C = samples.shape
    vals = samples.transpose(1, 0, 2).reshape(L, T * C).astype(jnp.int64)
    n = T * C
    if bps == 1:
        v = vals if dsd else vals + 128
        b = (v & 0xFF).astype(U32).reshape(L, n // 4, 4)
        out = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
               | (b[..., 3] << 24))
    elif bps == 2:
        v = (vals & 0xFFFF).astype(U32).reshape(L, n // 2, 2)
        out = v[..., 0] | (v[..., 1] << 16)
    elif bps == 4:
        out = (vals & 0xFFFFFFFF).astype(U32)
    elif bps == 3:
        assert n % 4 == 0, "3-byte pack needs a multiple of 4 values"
        v = (vals & 0xFFFFFF).astype(U32).reshape(L, n // 4, 4)
        w0 = v[..., 0] | (v[..., 1] << 24)
        w1 = (v[..., 1] >> 8) | (v[..., 2] << 16)
        w2 = (v[..., 2] >> 16) | (v[..., 3] << 8)
        out = jnp.stack([w0, w1, w2], axis=2)
    else:
        raise ValueError(f"bad bytes/sample {bps}")
    return out.reshape(L, -1)
