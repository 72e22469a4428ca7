"""Public PCM -> WavPack encode API.

The reference (Quake4/WavPackDecoder) is decode-only; this module goes
beyond parity by promoting the framework's heavily-fuzzed test-vector
encoder (wvpk/testgen/encoder.py, multichannel.py) to a supported
surface: ``wvpk.encode.encode(pcm, ...) -> bytes`` and a CLI encode mode
(``python -m wvpk.cli --encode in.wav -o out.wv``).

Every stream it emits is the same format the decoder's differential
fuzzers exercise: lossless decode is sample-exact (roundtrip identity is
asserted in tests), hybrid obeys the reference's error-limit semantics
(WordsUtils.cs:195-261), and the optional MD5 / block-checksum
extensions are stamped for the audit tooling.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from .testgen.encoder import EncodeSpec, encode_file
from .testgen.multichannel import encode_multichannel

# Decorrelation filter presets (decode order). These are this encoder's
# own chains -- chosen to cover the kernel tiers (2/4-ish/10 unrolled
# passes) -- not copies of any other encoder's tables. Negative
# (cross-channel) terms are stereo-only and stripped for mono content.
PRESETS = {
    "fast": ((17, 17), (2, 2)),
    "default": ((18, 18, 2, 17, 3), (2, 2, 2, 2, 2)),
    "high": ((18, 18, 18, -2, 2, 3, 5, -1, 17, 4),
             (2, 2, 2, 2, 2, 2, 2, 2, 2, 2)),
}


def _auto_shift(pcm: np.ndarray, bytes_per_sample: int) -> tuple[int, int]:
    """Common trailing-zero count -> (shift, int32_zeros).

    bytes <= 3 store it in the header SHIFT field; 4-byte content uses
    the int32 zeros re-expansion (UnpackUtils.cs:1332-1342) instead, the
    WavPack-native way to shrink wide residuals.
    """
    if not pcm.any():
        return 0, 0
    # common low zero bits across all samples (two's complement: v>>s<<s
    # == v iff the low s bits of the bit pattern are zero)
    acc = int(np.bitwise_or.reduce(
        pcm.astype(np.int64).view(np.uint64), axis=None))
    tz = min((acc & -acc).bit_length() - 1, 8)
    if bytes_per_sample >= 4:
        return 0, tz
    return tz, 0


def build_spec(pcm: np.ndarray, *, sample_rate: int = 44100,
               bytes_per_sample: int = 2, block_samples: int = 4096,
               preset: str = "default", joint: bool = True,
               hybrid: bool = False, bitrate: int = 512,
               md5: bool | None = None, block_checksum: int = 0,
               riff_header: bytes | None = None,
               riff_trailer: bytes | None = None) -> EncodeSpec:
    """Derive an EncodeSpec for `pcm` ((n,) or (n, ch) ints in the
    signed `bytes_per_sample`-wide domain).

    md5=None stamps the source digest for lossless only: like
    libwavpack, a stored MD5 always covers the SOURCE audio, which a
    hybrid-lossy decode legitimately won't match -- pass md5=True to
    stamp it anyway."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    if n == 0:
        raise ValueError("empty PCM")
    if not np.issubdtype(pcm.dtype, np.integer):
        raise ValueError(f"integer PCM required, got dtype {pcm.dtype}")
    if block_samples <= 0:
        raise ValueError(f"block_samples must be positive, got {block_samples}")
    lim = 1 << (bytes_per_sample * 8 - 1)
    if pcm.min() < -lim or pcm.max() >= lim:
        raise ValueError(f"PCM exceeds the {bytes_per_sample}-byte range")
    terms, deltas = PRESETS[preset]
    mono = ch == 1
    # false stereo: identical channels collapse to one encoded channel
    # (the decoder re-duplicates, UnpackUtils.cs:668-680)
    false_stereo = ch == 2 and bool(np.array_equal(pcm[:, 0], pcm[:, 1]))
    if mono or false_stereo:
        # cross-channel terms are stereo-only (multichannel mono tail
        # streams are stripped inside encode_multichannel instead, so
        # the segment's stereo pairs keep them)
        kept = [(t, d) for t, d in zip(terms, deltas) if t > 0]
        terms, deltas = tuple(t for t, _ in kept), tuple(d for _, d in kept)
    shift, zeros = (0, 0) if hybrid else _auto_shift(pcm, bytes_per_sample)
    # wide 32-bit content: the stored-domain magnitude must stay in the
    # entropy coder's comfortable range (24-bit-audio scale; the log2
    # tables and median adaptation degrade beyond ~2^28, per the
    # reference's own "limited resolution" note). Route the low bits
    # through the wvx raw-bit sidecar (UnpackUtils.cs:1271-1314), the
    # WavPack-native lossless mechanism for that, when trailing zeros
    # alone don't get us there.
    int32_mode = "zeros" if zeros else None
    sent_bits = 0
    maxabs = int(np.abs(pcm.astype(np.int64)).max())
    excess = maxabs.bit_length() - 23 - zeros
    if bytes_per_sample >= 4 and excess > 0:
        if hybrid:
            raise ValueError(
                "hybrid encoding supports up to ~24-bit magnitudes; "
                f"content needs {maxabs.bit_length()} bits")
        int32_mode, zeros, sent_bits = "wvx", 0, maxabs.bit_length() - 23
    return EncodeSpec(
        block_samples=block_samples,
        mono=mono,
        false_stereo=false_stereo,
        joint=joint and not mono and not false_stereo,
        terms=terms,
        deltas=deltas,
        bytes_stored=bytes_per_sample,
        shift=shift,
        int32_mode=int32_mode,
        int32_zeros=zeros,
        int32_sent_bits=sent_bits,
        sample_rate=sample_rate,
        hybrid=hybrid,
        hybrid_bitrate=hybrid,
        bitrate=bitrate,
        md5=(not hybrid) if md5 is None else md5,
        block_checksum=block_checksum,
        riff_header=riff_header,
        riff_trailer=riff_trailer,
    )


def encode_device(pcm: np.ndarray, **options) -> bytes:
    """Encode integer PCM to a WavPack stream ON DEVICE (TPU).

    The two hot loops (decorrelation inversion, entropy word coding) run
    lane-parallel over the file's blocks (`ops/encode_kernels.py`);
    every block is seeded fresh so blocks are independent lanes. Output
    decodes bit-exactly on all decoder paths; single-block files are
    byte-identical to the host `encode`.

    hybrid=True runs the fused lossy scan (peel -> error-limit coding ->
    reconstruction-feedback apply, `hybrid_encode_scan`); hybrid blocks
    never start zero-run escapes (~2 bits/word above the host encoder in
    digital silence — see engine/device_encoder.py). Wide-32bit wvx
    routing stays on the host path and raises ValueError here; use
    `encode` instead. >2ch emits a multichannel segment with each
    stream's blocks as one lane batch.

    warmup (default 512, 0 disables): adapt each block's decorr state
    over its own first `warmup` samples on device, then seed the block
    with the quantized warm state — recovers the fresh-seed compression
    cost (within ~0.1% of the host encoder's carried-state ratio at
    512) while keeping blocks independent lanes.
    """
    from dataclasses import replace

    from .engine.device_encoder import (encode_blocks_device,
                                        encode_multichannel_device)
    warmup = options.pop("warmup", 512)
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    spec = build_spec(pcm, **options)
    if pcm.shape[1] > 2:
        return encode_multichannel_device(
            pcm, replace(spec, mono=False, false_stereo=False),
            warmup=warmup)
    if spec.false_stereo:
        pcm = pcm[:, :1]
    return b"".join(encode_blocks_device(pcm, spec, warmup=warmup))


def encode(pcm: np.ndarray, **options) -> bytes:
    """Encode integer PCM to a WavPack stream.

    pcm: (n,) mono or (n, ch) interleaved ints, signed, within the
    `bytes_per_sample` range. ch > 2 emits a multichannel segment
    (INITIAL/FINAL stream runs + ID_CHANNEL_INFO) decodable with
    OPEN_ALL_CHANNELS. Keyword options: see build_spec. Returns the
    `.wv` byte stream.
    """
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    spec = build_spec(pcm, **options)
    if pcm.shape[1] > 2:
        # segment encoder stamps checksums itself; strip false_stereo
        return encode_multichannel(pcm, replace(spec, mono=False,
                                                 false_stereo=False))
    if spec.false_stereo:
        pcm = pcm[:, :1]
    return encode_file(pcm, spec)
