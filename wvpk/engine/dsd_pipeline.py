"""DSD block staging and device decode (modes 0/1/3).

Mirrors the PCM pipeline: group blocks by a static profile, stage per-lane
tables/state arrays, run the lane-parallel kernels, reassemble. The
block-end CRC check (DsdUtils.cs:99-101) and FALSE_STEREO duplication
(:119-131) happen at reassembly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import consts
from ..container.blockstate import BlockState
from ..ops.dsd import dsd_fast_decode, dsd_high_decode, dsd_raw_crc

MAX_DSD_BITS_VALUE = 256


def _on_tpu() -> bool:
    import jax
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _use_pallas_dsd() -> bool:
    from ..config import get_options
    mode = get_options().dsd_kernel
    return mode == "pallas" or (mode == "auto" and _on_tpu())


def _pow2_at_least(n: int, lo: int = 64) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


@dataclass(frozen=True)
class DsdProfile:
    mode: int
    mono: bool
    nsteps: int
    nbytes_cap: int
    bins: int = 0
    lookup_cap: int = 0


def _profile(st: BlockState) -> DsdProfile:
    d = st.dsd
    mono = bool(st.flags & consts.MONO_DATA)
    chans = 1 if mono else 2
    n = st.header.block_samples
    if d.mode == 0:
        return DsdProfile(0, mono, 0, 0)
    if d.mode == 1:
        return DsdProfile(
            1, mono, _pow2_at_least(n * chans),
            _pow2_at_least(len(d.data), 16), bins=d.history_bins,
            lookup_cap=_pow2_at_least(max(d.lookup_buffer.size, 1), 256))
    return DsdProfile(3, mono, _pow2_at_least(n),
                      _pow2_at_least(len(d.data), 16))


def _pad_bytes(payloads: list[bytes], cap: int) -> np.ndarray:
    out = np.zeros((len(payloads), cap), np.int32)
    for i, p in enumerate(payloads):
        out[i, :len(p)] = np.frombuffer(p, np.uint8)
    return out


def decode_dsd_states(states: list[BlockState]):
    """Device-decode a list of DSD block states; returns per-state
    (samples (n, ch_out), crc, mute_error)."""
    from .pipeline import DecodedBlock

    results: list[DecodedBlock | None] = [None] * len(states)
    groups: dict[DsdProfile, list[int]] = {}
    for i, st in enumerate(states):
        groups.setdefault(_profile(st), []).append(i)

    for prof, idxs in groups.items():
        sts = [states[i] for i in idxs]
        chans = 1 if prof.mono else 2
        nsamples = np.asarray([st.header.block_samples for st in sts], np.int32)
        nvals = nsamples * chans
        if prof.mode == 0:
            cap = max(int(nvals.max()), 1)
            data = _pad_bytes([st.dsd.data for st in sts], cap)
            neff = np.minimum(nvals, [len(st.dsd.data) for st in sts])
            crc = np.asarray(dsd_raw_crc(data, neff.astype(np.int32)))
            for k, i in enumerate(idxs):
                vals = data[k, :nvals[k]].astype(np.int32)
                results[i] = _assemble(sts[k], vals, int(crc[k]), False)
        elif prof.mode == 1:
            data = _pad_bytes([st.dsd.data for st in sts], prof.nbytes_cap)
            nbytes = np.asarray([len(st.dsd.data) for st in sts], np.int64)
            B = prof.bins
            summed = np.zeros((len(sts), B * 256), np.int32)
            value0 = np.zeros(len(sts), np.int64)
            for k, st in enumerate(sts):
                d = st.dsd
                summed[k] = d.summed_probabilities.astype(np.int32).reshape(-1)
                value0[k] = d.value
            if _use_pallas_dsd():
                from ..ops.dsd_pallas import dsd_fast_decode_pallas
                outs, err, crc = dsd_fast_decode_pallas(
                    data, nbytes, summed,
                    (value0 & 0xFFFFFFFF).astype(np.uint32).view(np.int32),
                    nvals.astype(np.int32), bins=B, mono=prof.mono,
                    nsteps=prof.nsteps, interpret=not _on_tpu())
            else:
                probs = np.zeros((len(sts), B * 256), np.int32)
                vlook = np.zeros((len(sts), B), np.int32)
                lookup = np.zeros((len(sts), prof.lookup_cap), np.int32)
                for k, st in enumerate(sts):
                    d = st.dsd
                    probs[k] = d.probabilities.astype(np.int32).reshape(-1)
                    vlook[k] = d.value_lookup
                    lookup[k, :d.lookup_buffer.size] = d.lookup_buffer
                outs, err, crc = dsd_fast_decode(
                    data, nbytes, summed, probs, vlook, lookup, value0,
                    np.full(len(sts), B, np.int64), nvals.astype(np.int32),
                    mono=prof.mono, nsteps=prof.nsteps)
            outs = np.asarray(outs).T  # (L, nsteps)
            err = np.asarray(err)
            crc = np.asarray(crc)
            for k, i in enumerate(idxs):
                results[i] = _assemble(sts[k], outs[k, :nvals[k]],
                                       int(crc[k]), bool(err[k]))
        else:
            data = _pad_bytes([st.dsd.data for st in sts], prof.nbytes_cap)
            nbytes = np.asarray([len(st.dsd.data) for st in sts], np.int64)
            ptable = np.stack([st.dsd.ptable for st in sts]).astype(np.int32)
            filters = np.stack([st.dsd.filters for st in sts]).astype(np.int32)
            value0 = np.asarray([st.dsd.value for st in sts], np.int64)
            if _use_pallas_dsd():
                from ..ops.dsd_pallas import dsd_high_decode_pallas
                outs, crc = dsd_high_decode_pallas(
                    data, nbytes, ptable, filters,
                    (value0 & 0xFFFFFFFF).astype(np.uint32).view(np.int32),
                    nsamples.astype(np.int32), mono=prof.mono,
                    nsteps=prof.nsteps, interpret=not _on_tpu())
            else:
                outs, crc = dsd_high_decode(
                    data, nbytes, ptable, filters, value0,
                    nsamples.astype(np.int32), mono=prof.mono,
                    nsteps=prof.nsteps)
            outs = np.asarray(outs)      # (nsteps, L, C)
            crc = np.asarray(crc)
            for k, i in enumerate(idxs):
                vals = outs[:nsamples[k], k, :].reshape(-1)
                results[i] = _assemble(sts[k], vals, int(crc[k]), False)
    return results


def _assemble(st: BlockState, interleaved: np.ndarray, crc: int, err: bool):
    from .pipeline import DecodedBlock

    hdr = st.header
    n = hdr.block_samples
    mute = err or crc != hdr.crc
    flags = st.flags
    if mute:
        interleaved = np.full_like(interleaved, 0x55)
        # the reference zero-fills only what it decoded; with CRC mismatch
        # the whole block muted (0x55 fill, DsdUtils.cs:104-117)
    if flags & consts.FALSE_STEREO:
        out = np.repeat(interleaved[:n, None], 2, axis=1)
    elif flags & consts.MONO_FLAG:
        out = interleaved[:n, None]
    else:
        out = interleaved.reshape(-1, 2)[:n]
    return DecodedBlock(samples=np.ascontiguousarray(out.astype(np.int32)),
                        crc=crc, crc_x=-1, mute_error=mute, crc_error=mute)
