"""Device-encode kernel dispatch: Pallas kernels vs XLA scan kernels.

Same scheme as decorr_select/entropy_select: "auto" runs the Pallas
kernels (encode_pallas.py) on TPU and the exact XLA scans
(encode_kernels.py) elsewhere; "xla"/"pallas" force a side (Pallas off-
TPU runs in interpret mode — tests). The Pallas invert requires the
homogeneous static term chain the device encoder always has; callers
without one fall back to the XLA kernel.
"""

from __future__ import annotations

import jax

from ..config import get_options


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _use_pallas() -> bool:
    mode = get_options().encode_kernel
    return mode == "pallas" or (mode == "auto" and _on_tpu())


def invert_any(targets, terms, deltas, num_terms, w0a, w0b, h0a, h0b, *,
               mono: bool, static_terms: tuple | None = None,
               with_state: bool = False):
    """Decorrelation inversion (targets -> residuals), optionally with
    the final decorr state. Contract of
    encode_kernels.decorr_invert_warm."""
    if (_use_pallas() and static_terms is not None and len(static_terms)
            and not (mono and any(t < 0 for t in static_terms))):
        from .encode_pallas import decorr_invert_pallas
        return decorr_invert_pallas(
            targets, deltas, w0a, w0b, h0a, h0b, mono=mono,
            static_terms=tuple(static_terms), interpret=not _on_tpu(),
            with_state=with_state)
    from .encode_kernels import decorr_invert_warm
    return decorr_invert_warm(targets, terms, deltas, num_terms, w0a,
                              w0b, h0a, h0b, mono=mono,
                              with_state=with_state)


def hybrid_scan_any(targets, terms, deltas, num_terms, med0, slow0,
                    acc0, delta0, nvals, w0a, w0b, h0a, h0b, *,
                    mono: bool, hybrid_bitrate: bool,
                    hybrid_balance: bool,
                    static_terms: tuple | None = None):
    """Fused hybrid (lossy) encode scan. Contract of
    encode_kernels.hybrid_encode_scan (5 segment arrays + pending word
    + recon)."""
    if (_use_pallas() and static_terms is not None and len(static_terms)
            and not (mono and any(t < 0 for t in static_terms))):
        from .encode_pallas import hybrid_encode_pallas
        return hybrid_encode_pallas(
            targets, deltas, med0, slow0, acc0, delta0, nvals, w0a, w0b,
            h0a, h0b, mono=mono, static_terms=tuple(static_terms),
            hybrid_bitrate=hybrid_bitrate, hybrid_balance=hybrid_balance,
            interpret=not _on_tpu())
    from .encode_kernels import hybrid_encode_scan
    return hybrid_encode_scan(
        targets, terms, deltas, num_terms, med0, slow0, acc0, delta0,
        nvals, w0a, w0b, h0a, h0b, mono=mono,
        hybrid_bitrate=hybrid_bitrate, hybrid_balance=hybrid_balance)


def words_any(res_words, med0, nvals, *, mono: bool):
    """Entropy word encoding (residual words -> bit segments). Contract
    of encode_kernels.entropy_encode_words."""
    if _use_pallas():
        from .encode_pallas import entropy_encode_pallas
        return entropy_encode_pallas(res_words, med0, nvals, mono=mono,
                                     interpret=not _on_tpu())
    from .encode_kernels import entropy_encode_words
    return entropy_encode_words(res_words, med0, nvals, mono=mono)
