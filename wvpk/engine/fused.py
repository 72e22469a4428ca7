"""Single-jit fused decode: entropy -> decorr -> joint/CRC/mute -> fixup.

One compiled XLA program per bucket profile; this is the function the
multi-chip path shards over the lane (block) axis and what bench/entry
compile-check.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.decorr_select import decorr_decode_any
from ..ops.entropy_select import entropy_decode_any
from ..ops.post import fixup, joint_mute_crc


@partial(jax.jit, static_argnames=(
    "mono", "hybrid", "hybrid_bitrate", "hybrid_balance",
    "is_float", "int32_expand", "nsteps", "num_terms_max"))
def fused_decode(words, nwords_lane, nsamples, med, slow, acc, delta,
                 terms, deltas16, wa, wb, hist_a, hist_b, num_terms,
                 joint, mute_limit, shift, bytes_stored, float_shift_eff,
                 int32_zod, *,
                 mono: bool, hybrid: bool, hybrid_bitrate: bool,
                 hybrid_balance: bool, is_float: bool, int32_expand: bool,
                 nsteps: int, num_terms_max: int | None = None):
    residuals, broke, _ndec = entropy_decode_any(
        words, nwords_lane, med, slow, acc, delta,
        mono=mono, hybrid=hybrid, hybrid_bitrate=hybrid_bitrate,
        hybrid_balance=hybrid_balance, nsteps=nsteps)
    dec = decorr_decode_any(residuals, terms, deltas16, wa, wb, hist_a,
                            hist_b, num_terms, mono=mono,
                            num_terms_max=num_terms_max)
    out, crc, mute = joint_mute_crc(dec, nsamples, joint, mute_limit, broke,
                                    mono=mono)
    out = fixup(out, shift, bytes_stored, float_shift_eff, int32_zod,
                is_float=is_float, int32_expand=int32_expand, hybrid=hybrid)
    return out, crc, mute
