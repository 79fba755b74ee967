from .mesh import psum_exact, ring_rotate, ring_size, ring_rank
from .ring import ring_attention
from .fused_ring import fused_ring_attention
from .zigzag import zigzag_ring_attention
from .stripe import stripe_attention
from .llama3 import llama3_attention
from .ulysses import ulysses_attention
from .layouts import (
    extract_local_contiguous,
    extract_local_zigzag,
    extract_local_stripe,
    zigzag_position_ids,
    stripe_position_ids,
)

__all__ = [
    "ring_rotate",
    "ring_size",
    "ring_rank",
    "psum_exact",
    "ring_attention",
    "fused_ring_attention",
    "zigzag_ring_attention",
    "stripe_attention",
    "llama3_attention",
    "ulysses_attention",
    "extract_local_contiguous",
    "extract_local_zigzag",
    "extract_local_stripe",
    "zigzag_position_ids",
    "stripe_position_ids",
]
