"""Decorrelation kernel dispatch: Pallas kernel vs XLA scan kernel.

The Pallas kernel (decorr_pallas.py) unrolls the pass chain and keeps all
state resident; it is ~20x the XLA scan-over-passes throughput on TPU.
The XLA kernel (decorr.py) remains the exact int64 reference path and the
default off-TPU. `num_terms_max` must be a host int (the bucket's max term
count) for the Pallas path; pass None to force the XLA path.
"""

from __future__ import annotations

import jax

from ..config import get_options
from .decorr import decorr_decode
from .decorr_pallas import decorr_decode_pallas


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def decorr_decode_any(residuals, terms, deltas, w0_a, w0_b, hist0_a,
                      hist0_b, num_terms, *, mono: bool,
                      num_terms_max: int | None,
                      static_terms: tuple | None = None):
    """Returns (T, L, C) int32 decorrelated outputs.

    static_terms: the bucket's uniform term chain (or None) — forwarded
    to the Pallas kernel for a per-class specialized unroll; invalid
    tuples (empty, or cross-channel terms on a mono bucket) fall back to
    the generic kernel."""
    mode = get_options().decorr_kernel
    use_pallas = (num_terms_max is not None
                  and (mode == "pallas" or (mode == "auto" and _on_tpu())))
    if static_terms is not None and (
            len(static_terms) == 0
            or (mono and any(t < 0 for t in static_terms))):
        static_terms = None
    if use_pallas:
        return decorr_decode_pallas(
            residuals, terms, deltas, w0_a, w0_b, hist0_a, hist0_b,
            num_terms, mono=mono, num_terms_max=num_terms_max,
            interpret=not _on_tpu(), static_terms=static_terms)
    return decorr_decode(residuals, terms, deltas, w0_a, w0_b, hist0_a,
                         hist0_b, num_terms, mono=mono)
