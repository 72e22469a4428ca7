"""Whole-file block index: header + metadata + decoded state per block.

The reference re-discovers blocks lazily while decoding
(WavPackUtils.cs:210-225); we index the whole container at open so that
(a) every block becomes an independent device lane, and (b) seek/resume is
O(1) (SURVEY.md section 5.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from .blockstate import BlockState, ContextUpdates, decode_block_state
from .header import BlockHeader, scan_headers
from .metadata import MetadataItem, iter_metadata


@dataclass
class Block:
    header: BlockHeader
    items: list[MetadataItem]
    state: BlockState
    updates: ContextUpdates


def parse_blocks(data: bytes) -> list[Block]:
    blocks = []
    for hdr in scan_headers(data):
        items = iter_metadata(data, hdr)
        state, updates = decode_block_state(hdr, items)
        blocks.append(Block(hdr, items, state, updates))
    return blocks
