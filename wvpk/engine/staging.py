"""Block staging: group parsed blocks into kernel buckets and build the
(lane, ...) device arrays.

Buckets are keyed by the static kernel profile (mono/hybrid/float/int32/wvx
and padded capacities) so each distinct profile compiles once; everything
else (terms, medians, shifts, joint flag...) is per-lane dynamic data.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import consts
from ..config import get_options
from ..container.blockstate import BlockState
from ..ops.bitio import pack_streams
from ..tables import i32


def _pow2_at_least(n: int, lo: int | None = None) -> int:
    v = lo if lo is not None else get_options().capacity_floor
    while v < n:
        v *= 2
    return v


@dataclass(frozen=True)
class Profile:
    mono: bool
    hybrid: bool
    hybrid_bitrate: bool
    hybrid_balance: bool
    is_float: bool
    is_int32: bool
    has_wvx: bool
    # hybrid-lossless: a paired .wvc correction stream is attached
    # (container.pair_wvc); such lanes decode exactly via the
    # correction scan + dual-CRC post (beyond reference parity)
    has_wvc: bool
    nsteps: int      # padded word-slot count for the entropy scan
    nsamples_cap: int


def profile_of(st: BlockState) -> Profile:
    f = st.flags
    mono = bool(f & consts.MONO_DATA)
    cap = _pow2_at_least(st.header.block_samples)
    has_wvx = st.wvxbits is not None and not (f & consts.FLOAT_DATA)
    return Profile(
        mono=mono,
        hybrid=bool(f & consts.HYBRID_FLAG),
        hybrid_bitrate=bool(f & consts.HYBRID_BITRATE),
        hybrid_balance=bool(f & consts.HYBRID_BALANCE),
        is_float=bool(f & consts.FLOAT_DATA),
        is_int32=bool(f & consts.INT32_DATA),
        has_wvx=has_wvx,
        has_wvc=(st.wvcbits is not None and st.wvc_crc is not None
                 and not has_wvx
                 and bool(f & consts.HYBRID_FLAG)),
        nsteps=cap * (1 if mono else 2),
        nsamples_cap=cap,
    )


@dataclass
class Bucket:
    profile: Profile
    states: list[BlockState]
    indices: list[int]          # positions in the caller's block list
    # staged arrays (numpy; moved to device by the pipeline)
    words: np.ndarray
    nwords_lane: np.ndarray
    nsamples: np.ndarray
    med: np.ndarray
    slow: np.ndarray
    acc: np.ndarray
    delta: np.ndarray
    terms: np.ndarray
    deltas16: np.ndarray
    wa: np.ndarray
    wb: np.ndarray
    hist_a: np.ndarray
    hist_b: np.ndarray
    num_terms: np.ndarray
    joint: np.ndarray
    mute_limit: np.ndarray
    hdr_crc: np.ndarray
    crc_mvx: np.ndarray
    shift: np.ndarray
    bytes_stored: np.ndarray
    float_shift_eff: np.ndarray
    int32_zod: np.ndarray       # zeros/ones/dups for fixup or wvx expansion
    sent_bits: np.ndarray
    max_width: np.ndarray
    wvx_words: np.ndarray | None
    wvx_start_bit: np.ndarray | None
    wvx_start_bc: np.ndarray | None
    # hybrid-lossless correction streams + the correction blocks'
    # header CRCs (cover the EXACT samples)
    wvc_words: np.ndarray | None = None
    wvc_crc: np.ndarray | None = None
    # static (chain, start, stop, num_terms_max) lane segments for the
    # per-class decorr specialization on mixed-chain buckets; None when
    # the bucket is uniform (static_terms covers it) or nothing qualifies
    chain_segments: tuple | None = None

    @property
    def static_terms(self) -> tuple | None:
        """The bucket's uniform decorr term chain, or None when lanes
        differ. Uniform chains (one encoder preset per corpus — the
        common case) let the Pallas decorr kernel compile a per-class
        specialized unroll (~2.6x its generic compute on deep chains)."""
        nt = np.asarray(self.num_terms)
        if nt.size == 0 or not (nt == nt[0]).all():
            return None
        n = int(nt[0])
        if n == 0:
            return None
        t = np.asarray(self.terms)[:, :n]
        if not (t == t[0]).all():
            return None
        return tuple(int(x) for x in t[0])


def _fixup_params(st: BlockState) -> tuple[int, tuple[int, int, int]]:
    """Host part of fixup_samples' parameter adjustment
    (UnpackUtils.cs:1316-1345). Returns (shift, (zeros, ones, dups))."""
    f = st.flags
    shift = (f & consts.SHIFT_MASK) >> consts.SHIFT_LSB
    zeros, ones, dups = st.int32_zeros, st.int32_ones, st.int32_dups
    sent = st.int32_sent_bits
    if not (f & consts.INT32_DATA) or (f & consts.FLOAT_DATA):
        return shift, (0, 0, 0)
    if st.wvxbits is not None:
        return shift, (zeros, ones, dups)
    if sent == 0 and (zeros + ones + dups):
        lossy = bool(f & consts.HYBRID_FLAG)
        while lossy and (f & consts.BYTES_STORED) == 3 and shift < 8:
            if zeros > 0:
                zeros -= 1
            elif ones > 0:
                ones -= 1
            elif dups > 0:
                dups -= 1
            else:
                break
            shift += 1
        return shift, (zeros, ones, dups)
    return shift + zeros + sent + ones + dups, (0, 0, 0)


def _chain_of(st: BlockState) -> tuple:
    return tuple(int(t) for t in st.terms[:st.num_terms])


def _order_by_chain(states: list[BlockState], indices: list[int],
                    mono: bool):
    """Sort a bucket's lanes so same-chain lanes are contiguous and
    compute the static decorr segments: big uniform-chain runs get a
    per-class specialized kernel inside the SAME fused program (mixed
    corpora otherwise fall back to the ~2.6x-slower generic unroll for
    every lane); everything else coalesces into one generic tail
    segment. Lane order inside a bucket is free — results map back
    through Bucket.states/indices."""
    opts = get_options()
    chains = [_chain_of(st) for st in states]
    counts: dict[tuple, int] = {}
    for c in chains:
        counts[c] = counts.get(c, 0) + 1
    if len(counts) == 1:
        return states, indices, None     # uniform: static_terms covers it
    specializable = sorted(
        (c for c, n in counts.items()
         if n >= opts.decorr_segment_min and len(c) > 0
         and not (mono and any(t < 0 for t in c))),
        key=lambda c: -counts[c])[:opts.decorr_segment_classes]
    if not specializable:
        return states, indices, None
    rank = {c: k for k, c in enumerate(specializable)}
    order = sorted(range(len(states)),
                   key=lambda i: rank.get(chains[i], len(rank)))
    states = [states[i] for i in order]
    indices = [indices[i] for i in order]
    segments, pos = [], 0
    for c in specializable:
        segments.append((c, pos, pos + counts[c], len(c)))
        pos += counts[c]
    if pos < len(states):
        tail_ntm = max(len(chains[i]) for i in order[pos:])
        segments.append((None, pos, len(states), max(tail_ntm, 1)))
    return states, indices, tuple(segments)


def stage(states: list[BlockState], indices: list[int]) -> Bucket:
    prof = profile_of(states[0])
    states, indices, chain_segments = _order_by_chain(
        states, indices, prof.mono)
    L = len(states)
    cap16 = consts.MAX_NTERMS
    words, _ = pack_streams([st.wvbits or b"" for st in states])
    chans = 1 if prof.mono else 2
    nsamples = np.asarray([st.header.block_samples for st in states], np.int32)
    arr = Bucket(
        profile=prof, states=states, indices=indices,
        words=words,
        nwords_lane=nsamples * chans,
        nsamples=nsamples,
        med=np.asarray([st.medians for st in states], np.int64),
        slow=np.asarray([st.slow_level for st in states], np.int64),
        acc=np.asarray([st.bitrate_acc for st in states], np.int64),
        delta=np.asarray([st.bitrate_delta for st in states], np.int64),
        terms=np.asarray([st.terms for st in states], np.int32),
        deltas16=np.asarray([st.deltas for st in states], np.int32),
        wa=np.asarray([st.weights_a for st in states], np.int32),
        wb=np.asarray([st.weights_b for st in states], np.int32),
        hist_a=np.asarray([st.samples_a for st in states], np.int64),
        hist_b=np.asarray([st.samples_b for st in states], np.int64),
        num_terms=np.asarray([st.num_terms for st in states], np.int32),
        joint=np.asarray([bool(st.flags & consts.JOINT_STEREO)
                          for st in states]),
        mute_limit=np.asarray([_mute_limit(st) for st in states], np.int64),
        hdr_crc=np.asarray([st.header.crc for st in states], np.int32),
        crc_mvx=np.asarray([st.crc_mvx for st in states], np.int32),
        shift=np.asarray([_fixup_params(st)[0] for st in states], np.int32),
        bytes_stored=np.asarray([st.flags & consts.BYTES_STORED
                                 for st in states], np.int32),
        float_shift_eff=np.asarray([_float_shift(st) for st in states],
                                   np.int32),
        int32_zod=np.asarray([_fixup_params(st)[1] for st in states],
                             np.int32),
        sent_bits=np.asarray([st.int32_sent_bits for st in states], np.int32),
        max_width=np.asarray([st.int32_max_width for st in states], np.int32),
        wvx_words=None, wvx_start_bit=None, wvx_start_bc=None,
        chain_segments=chain_segments,
    )
    if prof.has_wvc:
        wvc_words, _ = pack_streams([st.wvcbits or b"" for st in states])
        arr.wvc_words = wvc_words
        arr.wvc_crc = np.asarray(
            [st.wvc_crc if st.wvc_crc is not None else 0 for st in states],
            np.int32)
    if prof.has_wvx:
        wvx_words, _ = pack_streams([st.wvxbits or b"" for st in states])
        arr.wvx_words = wvx_words
        arr.wvx_start_bit = np.asarray(
            [st.wvx_start_bit for st in states], np.int32)
        # bc after the optional leading getbits(5) reads (new-style field)
        arr.wvx_start_bc = np.asarray(
            [3 if st.wvx_start_bit == 5 else 0 for st in states], np.int32)
    return arr


def _mute_limit(st: BlockState) -> int:
    mag = (st.flags & consts.MAG_MASK) >> consts.MAG_LSB
    lim = i32((1 << mag) + 2)
    if st.flags & consts.HYBRID_FLAG:
        lim = i32(lim * 2)
    return lim


def _float_shift(st: BlockState) -> int:
    sh = st.float_max_exp - st.float_norm_exp + st.float_shift
    return max(-32, min(32, sh))


def group_blocks(states: list[BlockState]) -> list[Bucket]:
    groups: dict[Profile, tuple[list[BlockState], list[int]]] = {}
    for i, st in enumerate(states):
        key = profile_of(st)
        groups.setdefault(key, ([], []))
        groups[key][0].append(st)
        groups[key][1].append(i)
    return [stage(sts, idxs) for (sts, idxs) in groups.values()]
