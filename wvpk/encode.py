"""Public PCM -> WavPack encode API.

The reference (Quake4/WavPackDecoder) is decode-only; this module goes
beyond parity by promoting the framework's heavily-fuzzed test-vector
encoder (wvpk/testgen/encoder.py, multichannel.py) to a supported
surface: ``wvpk.encode.encode(pcm, ...) -> bytes``, the device
(TPU) variant ``encode_device``, the bounded-memory file streamer
``encode_wav_file`` and a CLI encode mode
(``python -m wvpk.cli --encode in.wav -o out.wv [--device]
[--streaming]``).

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


def _auto_shift(or_acc: int, bytes_per_sample: int) -> tuple[int, int]:
    """Common trailing-zero count of the OR-accumulated bit pattern ->
    (shift, int32_zeros).

    bytes <= 3 store it in the header SHIFT field; 4-byte content uses
    the int32 zeros re-expansion (UnpackUtils.cs:1332-1342) instead, the
    WavPack-native way to shrink wide residuals. (Two's complement:
    v>>s<<s == v iff the low s bits of the bit pattern are zero, so the
    OR over all samples carries the whole answer.)
    """
    if or_acc == 0:
        return 0, 0
    tz = min((or_acc & -or_acc).bit_length() - 1, 8)
    if bytes_per_sample >= 4:
        return 0, tz
    return tz, 0


def pcm_stats(pcm: np.ndarray) -> dict:
    """Whole-stream facts build_spec derives from the audio. Chunk-safe:
    `merge_pcm_stats` folds per-window stats into the same answer, so
    the streaming encoder can derive an identical spec from one bounded
    pre-scan pass."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    wide = pcm.astype(np.int64)
    return {
        "n": pcm.shape[0],
        "ch": pcm.shape[1],
        "minv": int(wide.min()) if pcm.size else 0,
        "maxv": int(wide.max()) if pcm.size else 0,
        "maxabs": int(np.abs(wide).max()) if pcm.size else 0,
        "or_acc": int(np.bitwise_or.reduce(wide.view(np.uint64), axis=None))
                  if pcm.size else 0,
        "equal_ch": pcm.shape[1] == 2
                    and bool(np.array_equal(pcm[:, 0], pcm[:, 1])),
    }


def merge_pcm_stats(a: dict | None, b: dict) -> dict:
    if a is None:
        return b
    if a["ch"] != b["ch"]:
        raise ValueError("channel count changed mid-stream")
    return {
        "n": a["n"] + b["n"],
        "ch": a["ch"],
        "minv": min(a["minv"], b["minv"]),
        "maxv": max(a["maxv"], b["maxv"]),
        "maxabs": max(a["maxabs"], b["maxabs"]),
        "or_acc": a["or_acc"] | b["or_acc"],
        "equal_ch": a["equal_ch"] and b["equal_ch"],
    }


def build_spec(pcm: np.ndarray, *, stats: dict | None = None,
               **options) -> EncodeSpec:
    """Derive an EncodeSpec for `pcm` ((n,) or (n, ch) ints in the
    signed `bytes_per_sample`-wide domain).

    md5=None stamps the source digest for lossless only: like
    libwavpack, a stored MD5 always covers the SOURCE audio, which a
    hybrid-lossy decode legitimately won't match -- pass md5=True to
    stamp it anyway."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if not np.issubdtype(pcm.dtype, np.integer):
        raise ValueError(f"integer PCM required, got dtype {pcm.dtype}")
    return _spec_from_stats(stats if stats is not None else pcm_stats(pcm),
                            **options)


def _spec_from_stats(st: dict, *, sample_rate: int = 44100,
                     bytes_per_sample: int = 2, block_samples: int = 4096,
                     preset: str = "default", joint: bool = True,
                     hybrid: bool = False, bitrate: int = 512,
                     md5: bool | None = None, block_checksum: int = 0,
                     riff_header: bytes | None = None,
                     riff_trailer: bytes | None = None) -> EncodeSpec:
    n, ch = st["n"], st["ch"]
    if n == 0:
        raise ValueError("empty PCM")
    if block_samples <= 0:
        raise ValueError(f"block_samples must be positive, got {block_samples}")
    lim = 1 << (bytes_per_sample * 8 - 1)
    if st["minv"] < -lim or st["maxv"] >= lim:
        raise ValueError(f"PCM exceeds the {bytes_per_sample}-byte range")
    terms, deltas = PRESETS[preset]
    mono = ch == 1
    # false stereo: identical channels collapse to one encoded channel
    # (the decoder re-duplicates, UnpackUtils.cs:668-680)
    false_stereo = st["equal_ch"]
    if mono or false_stereo:
        # cross-channel terms are stereo-only (multichannel mono tail
        # streams are stripped inside encode_multichannel instead, so
        # the segment's stereo pairs keep them)
        kept = [(t, d) for t, d in zip(terms, deltas) if t > 0]
        terms, deltas = tuple(t for t, _ in kept), tuple(d for _, d in kept)
    shift, zeros = ((0, 0) if hybrid
                    else _auto_shift(st["or_acc"], bytes_per_sample))
    # wide 32-bit content: the stored-domain magnitude must stay in the
    # entropy coder's comfortable range (24-bit-audio scale; the log2
    # tables and median adaptation degrade beyond ~2^28, per the
    # reference's own "limited resolution" note). Route the low bits
    # through the wvx raw-bit sidecar (UnpackUtils.cs:1271-1314), the
    # WavPack-native lossless mechanism for that, when trailing zeros
    # alone don't get us there.
    int32_mode = "zeros" if zeros else None
    sent_bits = 0
    maxabs = st["maxabs"]
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

    mesh (a `jax.sharding.Mesh`) shards the encode scans lane-parallel
    across devices (pure data parallelism, block-identical to
    unsharded at any warmup — the warm lookahead scan shards too).
    """
    from dataclasses import replace

    from .engine.device_encoder import (encode_blocks_device,
                                        encode_multichannel_device)
    warmup = options.pop("warmup", 512)
    mesh = options.pop("mesh", None)
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    spec = build_spec(pcm, **options)
    if pcm.shape[1] > 2:
        return encode_multichannel_device(
            pcm, replace(spec, mono=False, false_stereo=False),
            warmup=warmup, mesh=mesh)
    if spec.false_stereo:
        pcm = pcm[:, :1]
    return b"".join(encode_blocks_device(pcm, spec, mesh=mesh,
                                         warmup=warmup))


def encode_wav_file(in_path, out_path, *, device: bool = False,
                    warmup: int = 512, window_samples: int = 1 << 20,
                    mesh=None, **options) -> dict:
    """Bounded-memory WAV file -> .wv file encode (two streaming passes).

    Pass 1 scans the payload once to fold `pcm_stats` windows (the spec
    -- shift/wvx routing/false-stereo -- needs whole-stream facts) and
    the whole-file MD5; pass 2 encodes window-by-window, appending
    blocks to `out_path` as they are produced. Peak memory is
    O(window_samples), not O(file): a multi-GB WAV encodes in constant
    space, the encode mirror of the decoder's bounded streaming mode.

    Windows are block-aligned. Host windows thread the encoder's
    carried adaptive state across the boundary (one-window files are
    byte-identical to `encode`); `device=True` uses the lane-parallel
    TPU kernels, whose blocks are independent (fresh- or warmup-seeded)
    lanes, so device output is byte-identical to `encode_device` for
    ANY window split. >2ch input emits multichannel segments
    (per-stream carried state on host; independent lanes on device).
    `mesh` (device=True only) shards each window's encode scans
    lane-parallel across a `jax.sharding.Mesh`, byte-identical to the
    unsharded stream. Returns {"samples", "channels", "bytes_written",
    "windows"}.
    """
    import hashlib

    from .io.pcm import format_samples
    from .io.wav import decode_pcm_bytes, scan_wav_file

    ch, rate, bits, off, size, header, trailer = scan_wav_file(in_path)
    bps = (bits + 7) // 8
    options.setdefault("bytes_per_sample", bps)
    options.setdefault("sample_rate", rate)
    options["riff_header"] = header
    options["riff_trailer"] = trailer
    frame = bps * ch
    total = size // frame
    if total == 0:
        raise ValueError("empty PCM")
    bs = options.get("block_samples", 4096)
    win = max(bs, window_samples // bs * bs)

    hybrid = options.get("hybrid", False)
    md5_opt = options.get("md5")
    want_md5 = (not hybrid) if md5_opt is None else md5_opt
    hasher = hashlib.md5() if want_md5 else None
    st = None
    with open(in_path, "rb") as f:
        f.seek(off)
        done = 0
        while done < total:
            m = min(total - done, win)
            v = decode_pcm_bytes(f.read(m * frame), bps).reshape(-1, ch)
            st = merge_pcm_stats(st, pcm_stats(v))
            if hasher is not None:
                # the stored MD5 covers the formatted output bytes
                # (false-stereo duplication == the original channels)
                hasher.update(format_samples(
                    v, options["bytes_per_sample"]))
            done += m
    spec = replace(_spec_from_stats(st, **options),
                   total_samples_override=total)
    if ch > 2:
        # segment encoder stamps checksums itself; strip false_stereo
        spec = replace(spec, mono=False, false_stereo=False)
    if device and spec.int32_mode == "wvx":
        # fail before any output is written: wide-32bit wvx routing is
        # host-only (same contract as encode_device)
        raise ValueError("device encode does not support >24-bit "
                         "magnitudes (wvx routing); drop device=True")
    digest = hasher.digest() if hasher is not None else None

    if device:
        from .engine.device_encoder import (encode_blocks_device,
                                            encode_multichannel_device)
    else:
        from .testgen.encoder import encode_blocks
        from .testgen.multichannel import encode_multichannel
    nbytes = nwin = 0
    carry = carries = None
    with open(in_path, "rb") as f, open(out_path, "wb") as out:
        f.seek(off)
        done = 0
        while done < total:
            m = min(total - done, win)
            v = decode_pcm_bytes(f.read(m * frame), bps).reshape(-1, ch)
            if spec.false_stereo:
                v = v[:, :1]
            first, last = done == 0, done + m >= total
            if ch > 2 and device:
                blocks = [encode_multichannel_device(
                    v, spec, warmup=warmup, mesh=mesh, start_sample=done,
                    first=first, last=last, md5_digest=digest,
                    pad_to=total)]
            elif ch > 2:
                seg, carries = encode_multichannel(
                    v, spec, start_sample=done, first=first, last=last,
                    md5_digest=digest, carries=carries,
                    return_carries=True)
                blocks = [seg]
            elif device:
                blocks = encode_blocks_device(
                    v, spec, warmup=warmup, mesh=mesh, start_sample=done,
                    first=first, last=last, md5_digest=digest,
                    pad_to=total)
            else:
                blocks, carry = encode_blocks(
                    v, spec, start_sample=done, first=first, last=last,
                    md5_digest=digest, carry=carry, return_carry=True)
            for b in blocks:
                out.write(b)
                nbytes += len(b)
            nwin += 1
            done += m
    return {"samples": total, "channels": ch, "bytes_written": nbytes,
            "windows": nwin}


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
