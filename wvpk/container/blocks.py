"""Whole-file block index: header + metadata + decoded state per block.

The reference re-discovers blocks lazily while decoding
(WavPackUtils.cs:210-225); we index the whole container at open so that
(a) every block becomes an independent device lane, and (b) seek/resume is
O(1) (SURVEY.md section 5.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..consts import MAX_BLOCK_SAMPLES
from .blockstate import BlockState, ContextUpdates, decode_block_state
from .header import HEADER_SIZE, BlockHeader, scan_headers
from .metadata import MetadataItem, iter_metadata


@dataclass
class Block:
    header: BlockHeader
    items: list[MetadataItem]
    state: BlockState
    updates: ContextUpdates


def parse_blocks(data: bytes, strict: bool = False) -> list[Block]:
    """Index every decodable block. Truncated or metadata-corrupt blocks
    are skipped (their sample range gap-fills as zeros downstream) — the
    reference stops decoding at the first such block
    (WavPackUtils.cs:216-221); continuing past it is a recovery
    improvement, `strict=True` restores raise-on-error.

    PCM blocks without context-update metadata parse through the native C
    walker (wvpk_parse_block, ~10x the Python walk); DSD blocks, blocks
    carrying context updates (config/riff/channel info) and malformed
    blocks take the exact-semantics Python path."""
    from ..native import parse_block_native
    from .blockstate import state_from_native

    blocks = []
    for hdr in scan_headers(data):
        if hdr.stream_position + hdr.ck_size + 8 > len(data):
            if strict:
                raise ValueError("truncated trailing block")
            continue
        if hdr.block_samples > MAX_BLOCK_SAMPLES:
            # corrupt header (consts.MAX_BLOCK_SAMPLES rationale):
            # conceal like any other malformed block
            if strict:
                raise ValueError(
                    f"block_samples {hdr.block_samples} exceeds the "
                    f"engine cap {MAX_BLOCK_SAMPLES}")
            continue
        arr = None if strict else parse_block_native(data,
                                                     hdr.stream_position)
        if arr is not None:
            state, updates = state_from_native(hdr, arr, data)
            blocks.append(Block(hdr, [], state, updates))
            continue
        try:
            items = iter_metadata(data, hdr)
            state, updates = decode_block_state(hdr, items)
        except Exception:
            if strict:
                raise
            continue
        blocks.append(Block(hdr, items, state, updates))
    return blocks
