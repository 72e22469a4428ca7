"""Batched device decode engine: block staging and the fused pipeline."""

from .pipeline import DecodedBlock, decode_states, decode_bytes

__all__ = ["DecodedBlock", "decode_states", "decode_bytes"]
