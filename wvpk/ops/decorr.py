"""Fused lane-parallel decorrelation (hot loop 2 on device).

The reference applies up to 16 adaptive prediction passes sequentially over
the whole buffer (UnpackUtils.cs:553-607). Chaining all passes per sample is
mathematically identical (each pass only reads strictly-past outputs of
itself, or the current sample's other-channel output for terms -1/-2), so
the device kernel is ONE `lax.scan` over samples; within a sample the pass
chain is itself a `lax.scan` over the 16 pass slots with stacked
(16, L[, 8]) state — scanning instead of unrolling keeps the HLO body small
(an unrolled 16-pass body took XLA minutes to compile).

Semantics per term mirror UnpackUtils.cs:688-1240: predictor
(weight*sam + 512) >> 10 in 64-bit then int32 truncation; +/-delta weight
updates on sign agreement (clamped to +/-1024 for negative terms). Terms
may differ lane-to-lane.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from .bitio import wrap32

I64 = jnp.int64


def _pred(w, sam):
    return (w * sam + 512) >> 10


def _upd(w, delta, sam, v):
    do = (sam != 0) & (v != 0)
    step = jnp.where((sam ^ v) < 0, -delta, delta)
    return w + jnp.where(do, step, 0)


def _upd_clamp(w, delta, sam, v):
    do = (sam != 0) & (v != 0)
    neg = (sam ^ v) < 0
    w_neg = jnp.where(do, jnp.maximum(w - delta, -1024), w)
    w_pos = jnp.where(do, jnp.minimum(w + delta, 1024), w)
    return jnp.where(neg, w_neg, w_pos)


@partial(jax.jit, static_argnames=("mono",))
def decorr_decode(residuals, terms, deltas, w0_a, w0_b, hist0_a, hist0_b,
                  num_terms, *, mono: bool):
    """Apply all decorrelation passes.

    residuals: (T, L, C) int32 scan-major; C = 1 (mono) or 2
    terms/deltas: (L, 16) int32; num_terms (L,) int32
    w0_a/w0_b: (L, 16) int32; hist0_a/hist0_b: (L, 16, 8) int64
    Returns (T, L, C) int32 outputs.
    """
    T, L, C = residuals.shape
    terms_t = terms.astype(I64).T                      # (16, L)
    deltas_t = deltas.astype(I64).T
    iota8 = jnp.arange(8, dtype=jnp.int32)

    pass_const = dict(
        term=terms_t,
        delta=deltas_t,
        is17=terms_t == 17,
        is18=terms_t == 18,
        n1=terms_t == -1,
        n2=terms_t == -2,
        n3=terms_t == -3,
        pos=(terms_t >= 1) & (terms_t <= consts.MAX_TERM),
        act=(jnp.arange(16, dtype=jnp.int32)[:, None]
             < num_terms[None, :]),                    # (16, L)
    )

    def one_pass_stereo(chain, xs):
        va, vb, m_slot = chain
        (waj, wbj, ring_a, ring_b, cst) = xs
        t17, t18 = cst["is17"], cst["is18"]
        n1, n2, n3 = cst["n1"], cst["n2"], cst["n3"]
        pos, act, dj = cst["pos"], cst["act"], cst["delta"]

        sam_17_a = wrap32(2 * ring_a[:, 0] - ring_a[:, 1])
        sam_18_a = wrap32(3 * ring_a[:, 0] - ring_a[:, 1]) >> 1
        sam_ring_a = jax.lax.dynamic_index_in_dim(
            ring_a, m_slot, axis=1, keepdims=False)
        sam_a_pre = jnp.where(t17, sam_17_a,
                              jnp.where(t18, sam_18_a,
                                        jnp.where(pos, sam_ring_a,
                                                  ring_a[:, 0])))
        oa1 = wrap32(_pred(waj, sam_a_pre) + va)

        sam_17_b = wrap32(2 * ring_b[:, 0] - ring_b[:, 1])
        sam_18_b = wrap32(3 * ring_b[:, 0] - ring_b[:, 1]) >> 1
        sam_ring_b = jax.lax.dynamic_index_in_dim(
            ring_b, m_slot, axis=1, keepdims=False)
        sam_b_pre = jnp.where(t17, sam_17_b,
                              jnp.where(t18, sam_18_b,
                                        jnp.where(pos, sam_ring_b,
                                                  ring_b[:, 0])))
        # A-first path (all types except -2); -1 feeds oa into B
        sam_b_eff = jnp.where(n1, oa1, sam_b_pre)
        ob1 = wrap32(_pred(wbj, sam_b_eff) + vb)
        # B-first path (term -2)
        ob2 = wrap32(_pred(wbj, ring_b[:, 0]) + vb)
        oa2 = wrap32(_pred(waj, ob2) + va)

        oa = jnp.where(n2, oa2, oa1)
        ob = jnp.where(n2, ob2, ob1)
        sam_a_eff = jnp.where(n2, ob2, sam_a_pre)

        negterm = n1 | n2 | n3
        wa_upd = jnp.where(negterm, _upd_clamp(waj, dj, sam_a_eff, va),
                           _upd(waj, dj, sam_a_eff, va))
        wb_upd = jnp.where(negterm, _upd_clamp(wbj, dj, sam_b_eff, vb),
                           _upd(wbj, dj, sam_b_eff, vb))

        onehot = iota8[None, :] == ((m_slot + cst["term"]) & 7)[:, None]
        sa_pos = jnp.where(onehot, oa[:, None], ring_a)
        sb_pos = jnp.where(onehot, ob[:, None], ring_b)
        sa_1718 = jnp.concatenate(
            [oa[:, None], ring_a[:, 0:1], ring_a[:, 2:]], axis=1)
        sb_1718 = jnp.concatenate(
            [ob[:, None], ring_b[:, 0:1], ring_b[:, 2:]], axis=1)
        # -1: samples_A[0] = ob; -2: samples_B[0] = oa; -3: both
        sa0_new = jnp.where(n1 | n3, ob, ring_a[:, 0])
        sb0_new = jnp.where(n2 | n3, oa, ring_b[:, 0])
        sa_neg = jnp.concatenate([sa0_new[:, None], ring_a[:, 1:]], axis=1)
        sb_neg = jnp.concatenate([sb0_new[:, None], ring_b[:, 1:]], axis=1)

        t1718 = (t17 | t18)[:, None]
        sa_new = jnp.where(pos[:, None], sa_pos,
                           jnp.where(t1718, sa_1718,
                                     jnp.where(negterm[:, None], sa_neg,
                                               ring_a)))
        sb_new = jnp.where(pos[:, None], sb_pos,
                           jnp.where(t1718, sb_1718,
                                     jnp.where(negterm[:, None], sb_neg,
                                               ring_b)))
        amask = act[:, None]
        va = jnp.where(act, oa, va)
        vb = jnp.where(act, ob, vb)
        return ((va, vb, m_slot),
                (jnp.where(act, wa_upd, waj), jnp.where(act, wb_upd, wbj),
                 jnp.where(amask, sa_new, ring_a),
                 jnp.where(amask, sb_new, ring_b)))

    def one_pass_mono(chain, xs):
        va, m_slot = chain
        (waj, ring_a, cst) = xs
        t17, t18 = cst["is17"], cst["is18"]
        pos, act, dj = cst["pos"], cst["act"], cst["delta"]
        sam_17_a = wrap32(2 * ring_a[:, 0] - ring_a[:, 1])
        sam_18_a = wrap32(3 * ring_a[:, 0] - ring_a[:, 1]) >> 1
        sam_ring_a = jax.lax.dynamic_index_in_dim(
            ring_a, m_slot, axis=1, keepdims=False)
        sam_a = jnp.where(t17, sam_17_a,
                          jnp.where(t18, sam_18_a,
                                    jnp.where(pos, sam_ring_a,
                                              ring_a[:, 0])))
        oa = wrap32(_pred(waj, sam_a) + va)
        wa_upd = _upd(waj, dj, sam_a, va)
        onehot = iota8[None, :] == ((m_slot + cst["term"]) & 7)[:, None]
        sa_pos = jnp.where(onehot, oa[:, None], ring_a)
        sa_1718 = jnp.concatenate(
            [oa[:, None], ring_a[:, 0:1], ring_a[:, 2:]], axis=1)
        sa_new = jnp.where(pos[:, None], sa_pos,
                           jnp.where((t17 | t18)[:, None], sa_1718, ring_a))
        va = jnp.where(act, oa, va)
        return ((va, m_slot),
                (jnp.where(act, wa_upd, waj),
                 jnp.where(act[:, None], sa_new, ring_a)))

    def step(carry, xs):
        step_idx, res = xs
        m_slot = step_idx & 7
        va = res[:, 0].astype(I64)
        if mono:
            wa, sa = carry
            (va, _), (wa, sa) = jax.lax.scan(
                one_pass_mono, (va, m_slot), (wa, sa, pass_const))
            return (wa, sa), va[:, None].astype(jnp.int32)
        vb = res[:, 1].astype(I64)
        wa, wb, sa, sb = carry
        (va, vb, _), (wa, wb, sa, sb) = jax.lax.scan(
            one_pass_stereo, (va, vb, m_slot), (wa, wb, sa, sb, pass_const))
        return (wa, wb, sa, sb), jnp.stack([va, vb], axis=1).astype(jnp.int32)

    if mono:
        carry0 = (w0_a.astype(I64).T, hist0_a.astype(I64).transpose(1, 0, 2))
    else:
        carry0 = (w0_a.astype(I64).T, w0_b.astype(I64).T,
                  hist0_a.astype(I64).transpose(1, 0, 2),
                  hist0_b.astype(I64).transpose(1, 0, 2))
    xs = (jnp.arange(T, dtype=jnp.int32), residuals)
    _, outs = jax.lax.scan(step, carry0, xs)
    return outs
