"""The fused device decode pipeline.

Per bucket: staged bitstreams -> entropy scan -> decorr scan -> joint-stereo
/ mute / CRC -> wvx injection -> fixup, all on device; the host only parses
containers and reassembles outputs. This is the TPU restructuring of
unpack_samples (reference UnpackUtils.cs:510-686): the reference's
host/device boundary does not exist — here it sits exactly between
unpack_init (host) and the sample-domain math (device).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import consts, trace
from ..config import get_options
from ..container.blockstate import BlockState
from ..ops.decorr_select import decorr_decode_any
from ..ops.entropy_select import entropy_decode_any
from ..ops.post import fixup, joint_mute_crc, wvx_inject
from .staging import Bucket, group_blocks


@dataclass
class DecodedBlock:
    samples: np.ndarray    # (n, ch_out) int32 (FALSE_STEREO already dup'd)
    crc: int
    crc_x: int
    mute_error: bool
    crc_error: bool


def _sync(x):
    if get_options().sync_stages:
        import jax
        jax.block_until_ready(x)
    return x


def decode_bucket(b: Bucket) -> list[DecodedBlock]:
    prof = b.profile
    with trace.stage("entropy"):
        residuals, broke, ndec = entropy_decode_any(
            b.words, b.nwords_lane, b.med, b.slow, b.acc, b.delta,
            mono=prof.mono, hybrid=prof.hybrid,
            hybrid_bitrate=prof.hybrid_bitrate,
            hybrid_balance=prof.hybrid_balance, nsteps=prof.nsteps)
        _sync(residuals)

    L = b.words.shape[0]
    with trace.stage("decorr"):
        decorr_out = _sync(decorr_decode_any(
            residuals, b.terms, b.deltas16, b.wa, b.wb, b.hist_a, b.hist_b,
            b.num_terms, mono=prof.mono,
            num_terms_max=int(b.num_terms.max()) if len(b.states) else None))

    with trace.stage("post"):
        out, crc, mute = joint_mute_crc(
            decorr_out, b.nsamples, b.joint, b.mute_limit, broke,
            mono=prof.mono)
        _sync(out)

    crc_x = np.full((L,), -1, np.int32)
    if prof.has_wvx:
        with trace.stage("wvx"):
            out, crc_x_dev = wvx_inject(
                out, b.nsamples, b.wvx_words, b.wvx_start_bit,
                b.wvx_start_bc, b.sent_bits, b.max_width,
                np.stack([np.asarray([st.int32_zeros for st in b.states]),
                          np.asarray([st.int32_ones for st in b.states]),
                          np.asarray([st.int32_dups for st in b.states])],
                         axis=1).astype(np.int32))
            crc_x = np.asarray(crc_x_dev)

    with trace.stage("fixup"):
        out = _sync(fixup(out, b.shift, b.bytes_stored, b.float_shift_eff,
                          b.int32_zod,
                          is_float=prof.is_float,
                          int32_expand=prof.is_int32 and not prof.has_wvx,
                          hybrid=prof.hybrid))

    with trace.stage("transfer"):
        out_np = np.asarray(out)          # (T, L, C)
        crc_np = np.asarray(crc)
        mute_np = np.asarray(mute)

    results = []
    for i, st in enumerate(b.states):
        n = int(b.nsamples[i])
        vals = out_np[:n, i, :]
        if st.flags & consts.FALSE_STEREO:
            vals = np.repeat(vals, 2, axis=1)
        crc_err = (int(crc_np[i]) != st.header.crc
                   or (prof.has_wvx and int(crc_x[i]) != st.crc_mvx))
        results.append(DecodedBlock(
            samples=np.ascontiguousarray(vals),
            crc=int(crc_np[i]), crc_x=int(crc_x[i]),
            mute_error=bool(mute_np[i]), crc_error=bool(crc_err)))
    return results


def decode_states(states: list[BlockState]) -> list[DecodedBlock]:
    """Decode a list of blocks (any mix of profiles) on device."""
    from .dsd_pipeline import decode_dsd_states

    results: list[DecodedBlock | None] = [None] * len(states)
    pcm_states, pcm_indices = [], []
    dsd_states, dsd_indices = [], []
    for i, st in enumerate(states):
        if st.flags & consts.DSD_FLAG:
            dsd_states.append(st)
            dsd_indices.append(i)
        elif st.header.block_samples == 0:
            results[i] = DecodedBlock(
                samples=np.zeros((0, 1), np.int32), crc=-1, crc_x=-1,
                mute_error=False, crc_error=False)
        else:
            pcm_states.append(st)
            pcm_indices.append(i)
    remap = {id(st): i for st, i in zip(pcm_states, pcm_indices)}
    with trace.stage("staging"):
        buckets = group_blocks(pcm_states)
    for bucket in buckets:
        for st, res in zip(bucket.states, decode_bucket(bucket)):
            results[remap[id(st)]] = res
    if dsd_states:
        with trace.stage("dsd"):
            for i, res in zip(dsd_indices, decode_dsd_states(dsd_states)):
                results[i] = res
    if get_options().oracle_check:
        from ..ref import decode_block as oracle_decode
        for st, res in zip(states, results):
            want = oracle_decode(st)
            if not np.array_equal(want.samples, res.samples):
                raise AssertionError(
                    f"oracle mismatch at block {st.header.block_index}")
    return results


def decode_bytes(data: bytes) -> tuple[list, list[DecodedBlock]]:
    """Parse a .wv byte string and decode every block on device."""
    from ..container import parse_blocks
    blocks = parse_blocks(data)
    return blocks, decode_states([b.state for b in blocks])
