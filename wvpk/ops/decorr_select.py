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


def should_specialize() -> bool:
    """Whether callers should thread a bucket's static term chain into
    the (jit-static) kernel parameters. True only when the Pallas decorr
    path will actually run: off-TPU the XLA kernel ignores the chain, so
    keying jits on it would only multiply XLA:CPU compiles (every
    distinct fuzz chain became its own heavyweight CPU compile — enough
    to hit an in-process XLA:CPU compiler crash in the full suite)."""
    if not get_options().decorr_specialize:
        return False
    mode = get_options().decorr_kernel
    return mode == "pallas" or (mode == "auto" and _on_tpu())


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


def decorr_post_any(residuals, terms, deltas, w0_a, w0_b, hist0_a,
                    hist0_b, num_terms, nsamples, joint, mute_limit,
                    broke, *, mono: bool, num_terms_max: int | None,
                    static_terms: tuple | None = None,
                    chain_segments: tuple | None = None):
    """Decorrelation + joint-stereo undo + mute check + CRC in one step.

    On the Pallas path the post stage is FOLDED into the decorr sample
    scan (a dozen extra (1, tile) ops per step, nearly free in the
    latency-bound chain) instead of the separate associative-scan CRC
    pass over the whole (T, L) buffer; off-TPU it is the XLA pair.
    Returns (out, crc, mute) with joint_mute_crc's exact contract.

    chain_segments: staging's static ((chain|None, start, stop, ntm),
    ...) lane partition of a MIXED-chain bucket (lanes pre-sorted so
    each class is contiguous). Each uniform run gets the per-class
    specialized decorr unroll; the tail runs the generic kernel — all
    inside this one traced program, so a diversified corpus keeps both
    the merged entropy scan's lane fill and decorr specialization.
    Ignored when static_terms already covers the bucket or off-Pallas."""
    import jax.numpy as jnp

    from .post import joint_mute_crc

    mode = get_options().decorr_kernel
    use_pallas = (num_terms_max is not None
                  and (mode == "pallas" or (mode == "auto" and _on_tpu())))
    if static_terms is not None and (
            len(static_terms) == 0
            or (mono and any(t < 0 for t in static_terms))):
        static_terms = None
    if use_pallas:
        def one(res, tr, dl, wa, wb, ha, hb, nt, ns_, jt, ml, br, stt,
                ntm):
            out, crc, fb = decorr_decode_pallas(
                res, tr, dl, wa, wb, ha, hb, nt, mono=mono,
                num_terms_max=ntm, interpret=not _on_tpu(),
                static_terms=stt, fold_post_args=(ns_, jt, ml))
            ns32 = jnp.asarray(ns_).astype(jnp.int32)
            mute = jnp.asarray(br) | (fb < ns32)
            tidx = jnp.arange(out.shape[0], dtype=jnp.int32)[:, None]
            valid = tidx < ns32[None, :]
            out = jnp.where((valid & ~mute[None, :])[:, :, None], out, 0)
            return out, crc, mute

        if static_terms is None and chain_segments is not None:
            outs, crcs, mutes = [], [], []
            for chain, s, e, ntm_seg in chain_segments:
                o, c, m = one(
                    residuals[:, s:e], terms[s:e], deltas[s:e],
                    w0_a[s:e], w0_b[s:e], hist0_a[s:e], hist0_b[s:e],
                    num_terms[s:e], nsamples[s:e], joint[s:e],
                    mute_limit[s:e], broke[s:e], chain, ntm_seg)
                outs.append(o)
                crcs.append(c)
                mutes.append(m)
            return (jnp.concatenate(outs, axis=1),
                    jnp.concatenate(crcs), jnp.concatenate(mutes))
        return one(residuals, terms, deltas, w0_a, w0_b, hist0_a,
                   hist0_b, num_terms, nsamples, joint, mute_limit,
                   broke, static_terms, num_terms_max)
    dec = decorr_decode(residuals, terms, deltas, w0_a, w0_b, hist0_a,
                        hist0_b, num_terms, mono=mono)
    return joint_mute_crc(dec, nsamples, joint, mute_limit, broke,
                          mono=mono)
