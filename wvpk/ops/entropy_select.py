"""Entropy kernel dispatch: Pallas VMEM kernel vs XLA scan kernel.

The Pallas kernel (entropy_pallas.py) covers lossless AND hybrid profiles
natively on TPU (split-limb bitrate accumulators, in-kernel exp2s/mylog2
tables, unrolled error-limit binary search) and is the default there; the
XLA scan kernel (entropy.py) serves non-TPU backends and the int64-exact
fallback (`DecodeOptions.entropy_kernel="xla"`). Selection is per bucket
profile.
"""

from __future__ import annotations

import jax

from ..config import get_options
from .entropy import entropy_decode
from .entropy_pallas import entropy_decode_pallas


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def entropy_decode_any(words, nwords_lane, med, slow, acc, delta, *,
                       mono: bool, hybrid: bool, hybrid_bitrate: bool,
                       hybrid_balance: bool, nsteps: int):
    """Returns (residuals (T, L, C) int32, broke (L,) bool, ndec (L,))."""
    mode = get_options().entropy_kernel
    use_pallas = mode == "pallas" or (mode == "auto" and _on_tpu())
    if use_pallas:
        import jax.numpy as jnp

        return entropy_decode_pallas(
            jnp.asarray(words).astype(jnp.uint32), nwords_lane, med,
            slow, acc, delta, mono=mono, hybrid=hybrid,
            hybrid_bitrate=hybrid_bitrate, hybrid_balance=hybrid_balance,
            nsteps=nsteps, interpret=not _on_tpu())
    return entropy_decode(words, nwords_lane, med, slow, acc, delta,
                          mono=mono, hybrid=hybrid,
                          hybrid_bitrate=hybrid_bitrate,
                          hybrid_balance=hybrid_balance, nsteps=nsteps)


def entropy_decode_wvc_any(words, nwords_lane, med, slow, acc, delta, *,
                           mono: bool, hybrid_bitrate: bool,
                           hybrid_balance: bool, nsteps: int):
    """Hybrid-lossless variant: the main entropy scan also emits each
    word's error-limit-narrowed interval for the correction scan.
    Returns (residuals, maxcode, base, broke, ndec), all (T, L, C) /
    (L,). Same Pallas-on-TPU / XLA-elsewhere dispatch as
    entropy_decode_any."""
    mode = get_options().entropy_kernel
    use_pallas = mode == "pallas" or (mode == "auto" and _on_tpu())
    if use_pallas:
        import jax.numpy as jnp

        return entropy_decode_pallas(
            jnp.asarray(words).astype(jnp.uint32), nwords_lane, med,
            slow, acc, delta, mono=mono, hybrid=True,
            hybrid_bitrate=hybrid_bitrate, hybrid_balance=hybrid_balance,
            nsteps=nsteps, interpret=not _on_tpu(), wvc=True)
    return entropy_decode(words, nwords_lane, med, slow, acc, delta,
                          mono=mono, hybrid=True,
                          hybrid_bitrate=hybrid_bitrate,
                          hybrid_balance=hybrid_balance, nsteps=nsteps,
                          wvc=True)
