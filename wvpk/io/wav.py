"""RIFF WAV emission (reference ChunkHeader.cs / RiffChunkHeader.cs /
WaveHeader.cs and the demo's header synthesis WvDemo.cs:80-104)."""

from __future__ import annotations

import struct


def make_wav_header(total_samples: int, num_channels: int, sample_rate: int,
                    bits_per_sample: int, bytes_per_sample: int) -> bytes:
    block_align = bytes_per_sample * num_channels
    data_size = total_samples * block_align
    riff = b"RIFF" + struct.pack("<I", data_size + 4 + 2 * 8 + 16) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, num_channels, sample_rate,
        sample_rate * block_align, block_align, bits_per_sample)
    data = b"data" + struct.pack("<I", data_size)
    return riff + fmt + data


def write_wav(path, pcm_bytes: bytes, *, total_samples: int,
              num_channels: int, sample_rate: int, bits_per_sample: int,
              bytes_per_sample: int, header: bytes | None = None,
              trailer: bytes | None = None) -> None:
    """Write a WAV file; a saved RIFF header from the container is used
    verbatim when present (WvDemo.cs:74-77)."""
    with open(path, "wb") as f:
        f.write(header if header is not None else make_wav_header(
            total_samples, num_channels, sample_rate, bits_per_sample,
            bytes_per_sample))
        f.write(pcm_bytes)
        if trailer:
            f.write(trailer)
