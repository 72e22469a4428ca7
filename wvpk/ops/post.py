"""Device post-processing: joint-stereo undo, mute detection, CRC, fixup.

CRC is the affine recurrence crc' = 3*crc + x (stereo pairs fold to
crc' = 9*crc + 3*l + r), evaluated for ALL prefixes with
`lax.associative_scan` so the mute-truncated partial CRC
(UnpackUtils.cs:609-646) falls out of a gather. Fixup mirrors
UnpackUtils.cs:1251-1404 and FloatUtils.cs:32-56; the wvx low-bit injection
is a short lane-parallel scan because its bit consumption depends on the
decoded values (and the reference's shift-register lookahead,
see wvpk.ref.oracle docstring, requires carrying `bc`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from .bitio import bit_length64, bits_of, make_windows, peek, wrap32

I64 = jnp.int64
U32 = jnp.uint32


def _cabs(v):
    """C# unchecked abs on int32 values held in int64."""
    return jnp.where(v < 0, wrap32(-v), v)


@partial(jax.jit, static_argnames=("mono",))
def joint_mute_crc(decorr_out, nsamples, joint, mute_limit, broke, *,
                   mono: bool):
    """Joint-stereo undo + mute-limit check + per-block CRC.

    decorr_out: (T, L, C) int32; nsamples (L,); joint (L,) bool;
    mute_limit (L,) int64; broke (L,) bool (entropy EOF).
    Returns (out (T, L, C) int32, crc (L,) int32, mute (L,) bool).
    """
    T, L, C = decorr_out.shape
    v = decorr_out.astype(I64)
    tidx = jnp.arange(T, dtype=jnp.int32)[:, None]
    valid = tidx < nsamples[None, :]

    if mono:
        out_l = v[:, :, 0]
        bad = valid & (_cabs(out_l) > mute_limit[None, :])
        a = jnp.full((T, L), 3, U32)
        b = out_l.astype(U32)
        outs = out_l[:, :, None]
    else:
        l0 = v[:, :, 0]
        r0 = v[:, :, 1]
        r1 = wrap32(r0 - (l0 >> 1))
        l1 = wrap32(l0 + r1)
        out_l = jnp.where(joint[None, :], l1, l0)
        out_r = jnp.where(joint[None, :], r1, r0)
        bad = valid & ((_cabs(out_l) > mute_limit[None, :])
                       | (_cabs(out_r) > mute_limit[None, :]))
        a = jnp.full((T, L), 9, U32)
        b = (out_l * 3 + out_r).astype(U32)
        outs = jnp.stack([out_l, out_r], axis=2)

    def compose(x, y):
        return (y[0] * x[0], y[0] * x[1] + y[1])

    A, B = jax.lax.associative_scan(compose, (a, b), axis=0)
    crc_all = A * jnp.uint32(0xFFFFFFFF) + B  # init crc = -1

    any_bad = bad.any(axis=0)
    first_bad = jnp.where(any_bad, jnp.argmax(bad, axis=0).astype(jnp.int32),
                          nsamples)
    idx = jnp.clip(first_bad - 1, 0, T - 1)
    crc_at = jnp.take_along_axis(crc_all, idx[None, :], axis=0)[0]
    crc = jnp.where(first_bad == 0, jnp.uint32(0xFFFFFFFF), crc_at)
    crc = wrap32(crc.astype(I64)).astype(jnp.int32)

    mute = broke | (first_bad < nsamples)
    outs = jnp.where((valid & ~mute[None, :])[:, :, None], outs, 0)
    return outs.astype(jnp.int32), crc, mute


@partial(jax.jit, static_argnames=("is_float", "int32_expand", "hybrid"))
def fixup(out, shift, bytes_stored, float_shift_eff, int32_zod, *,
          is_float: bool, int32_expand: bool, hybrid: bool):
    """Elementwise fixup (UnpackUtils.cs:1251-1404).

    The wvx injection path (with its own expansion + crc_x) runs beforehand
    in wvx_inject; `int32_expand` selects the non-wvx zeros/ones/dups
    re-expansion (UnpackUtils.cs:1316-1343). `shift` (L,) must already
    include the host-computed adjustments (hybrid redistribution
    UnpackUtils.cs:1318-1330 and the shift accumulation :1345).

    out: (T, L, C) int32; bytes_stored (L,) in 0..3;
    float_shift_eff (L,) pre-clamped float shift; int32_zod (L, 3).
    """
    v = out.astype(I64)

    if is_float:
        # FloatUtils.cs:32-56; C# int shifts are mod-32
        sh = float_shift_eff[None, :, None].astype(I64)
        left = wrap32(v << (jnp.clip(sh, 0, 63) & 31))
        right = v >> (jnp.clip(-sh, 0, 63) & 31)
        v = jnp.where(sh > 0, left, jnp.where(sh < 0, right, v))
        v = jnp.clip(v, -8388608, 8388607)
        return v.astype(jnp.int32)

    if int32_expand:
        zeros = int32_zod[:, 0][None, :, None].astype(I64)
        ones = int32_zod[:, 1][None, :, None].astype(I64)
        dups = int32_zod[:, 2][None, :, None].astype(I64)
        vz = wrap32(v << (zeros & 31))
        vo = wrap32(((v + 1) << (ones & 31)) - 1)
        vd = wrap32(((v + (v & 1)) << (dups & 31)) - (v & 1))
        v = jnp.where(zeros != 0, vz,
                      jnp.where(ones != 0, vo,
                                jnp.where(dups != 0, vd, v)))

    sh = (shift.astype(I64) & 0x1F)[None, :, None]
    if hybrid:
        bs = bytes_stored[None, :, None]
        max_value = jnp.where(bs == 0, 127,
                              jnp.where(bs == 1, 32767,
                                        jnp.where(bs == 2, 8388607,
                                                  0x7FFFFFFF))) >> sh
        # C#: 0x80000000 is uint, so its shift is logical
        # (UnpackUtils.cs:1374)
        min_value = jnp.where(bs == 3, wrap32(jnp.int64(0x80000000) >> sh),
                              jnp.where(bs == 0, -128,
                                        jnp.where(bs == 1, -32768,
                                                  -8388608)) >> sh)
        min_shifted = wrap32(min_value << sh)
        max_shifted = wrap32(max_value << sh)
        v = jnp.where(v < min_value, min_shifted,
                      jnp.where(v > max_value, max_shifted,
                                wrap32(v << sh)))
    else:
        v = wrap32(v << sh)
    return v.astype(jnp.int32)


@jax.jit
def wvx_inject(out, nsamples, wvx_words, wvx_start_bit, wvx_start_bc,
               sent_bits, max_width, int32_zod, false_stereo=None):
    """INT32 wvx low-bit injection + expansion + crc_x
    (UnpackUtils.cs:1271-1314). Values are processed in interleaved memory
    order; crc_x covers the post-expansion values.

    FALSE_STEREO quirk (UnpackUtils.cs:1265): fixup_samples counts
    `sample_count * 2` whenever MONO_FLAG is clear — including
    FALSE_STEREO blocks, whose buffer holds only `sample_count` mono
    values at that point (the channel duplication at :668-680 runs
    AFTER fixup). The reference therefore injects wvx bits into the
    zero second half of the buffer and folds those values into crc_x;
    the dup then overwrites them, so only the bit cursor and crc_x are
    affected. `false_stereo` lanes replicate this with a second pass
    over zero values.

    out: (T, L, C) int32 decorr output (post joint/mute);
    wvx_words: (L, W) uint32; wvx_start_bit/bc: (L,) initial cursor state;
    sent_bits/max_width: (L,); int32_zod: (L, 3) zeros/ones/dups;
    false_stereo: (L,) bool or None.
    Returns (out' int32, crc_x (L,) int32).
    """
    T, L, C = out.shape
    windows = make_windows(wvx_words)
    sb = sent_bits.astype(I64)
    # C# int/uint shift counts are mod-32 (reachable only via corrupt
    # metadata bytes; conforming streams keep sent_bits/zeros/ones/dups
    # well under 32): mask = (1U << sent_bits) - 1 wraps the count
    mask = (jnp.int64(1) << (sb & 31)) - 1
    mw = max_width.astype(I64)
    zeros = int32_zod[:, 0].astype(I64)
    ones = int32_zod[:, 1].astype(I64)
    dups = int32_zod[:, 2].astype(I64)
    ns = nsamples.astype(jnp.int32)

    def one_value(state, v, valid):
        bitpos, bc, crc_x = state
        pvalue = jnp.where(v < 0, ~v, v)
        width = jnp.where(pvalue > 0, bit_length64(pvalue), 0) + sb
        truncated = (mw > 0) & (width > mw)
        btr = jnp.where(truncated, sb - (width - mw), sb)
        do_read = valid & (sb > 0) & (~truncated | (btr > 0))
        btr = jnp.where(do_read, btr, 0)
        # getbits window semantics: refill bc in byte steps to >= btr, the
        # returned window is min(bc, 32) bits (lookahead included)
        need = jnp.maximum(btr - bc, 0)
        bc_pre = bc + (((need + 7) >> 3) << 3)
        win = peek(windows, bitpos)
        data = bits_of(win, jnp.minimum(bc_pre, 32)) & mask
        injected = wrap32(
            wrap32(wrap32(v << (btr & 31)) | data)
            << ((sb - btr) & 31))
        no_read = valid & (sb > 0) & ~do_read
        v1 = jnp.where(do_read, injected,
                       jnp.where(no_read, wrap32(v << (sb & 31)), v))
        bitpos = jnp.where(do_read, bitpos + btr, bitpos)
        bc = jnp.where(do_read, bc_pre - btr, bc)
        # re-expansion (same loop in the reference)
        vz = wrap32(v1 << (zeros & 31))
        vo = wrap32(((v1 + 1) << (ones & 31)) - 1)
        vd = wrap32(((v1 + (v1 & 1)) << (dups & 31)) - (v1 & 1))
        v2 = jnp.where(zeros != 0, vz,
                       jnp.where(ones != 0, vo,
                                 jnp.where(dups != 0, vd, v1)))
        v2 = jnp.where(valid, v2, v)
        crc1 = wrap32(crc_x * 9 + (v2 & 0xFFFF) * 3 + ((v2 >> 16) & 0xFFFF))
        crc_x = jnp.where(valid, crc1, crc_x)
        return (bitpos, bc, crc_x), v2

    def step(carry, xs):
        t, row = xs
        valid = t < ns
        state = carry
        vals = []
        for c in range(C):
            state, v1 = one_value(state, row[:, c].astype(I64), valid)
            vals.append(v1)
        return state, jnp.stack(vals, axis=1).astype(jnp.int32)

    carry0 = (wvx_start_bit.astype(I64), wvx_start_bc.astype(I64),
              jnp.full((L,), -1, I64))
    xs = (jnp.arange(T, dtype=jnp.int32), out)
    carry, injected = jax.lax.scan(step, carry0, xs)

    # pass false_stereo=None when no lane has FALSE_STEREO (the caller
    # checks) — jit specializes on the None/array pytree structure
    if false_stereo is not None:
        fs = jnp.asarray(false_stereo)

        def step_fs(c, t):
            state, _v = one_value(c, jnp.zeros((L,), I64), fs & (t < ns))
            return state, None

        carry, _ = jax.lax.scan(step_fs, carry,
                                jnp.arange(T, dtype=jnp.int32))
    crc_x = carry[2]
    return injected, wrap32(crc_x).astype(jnp.int32)
