from .adapter import (
    DATA_PARAMS,
    current_ring_params,
    ring_attention_forward,
    substitute_hf_flash_attn,
    update_ring_flash_attn_params,
    use_ring_attn,
)

__all__ = [
    "DATA_PARAMS",
    "current_ring_params",
    "ring_attention_forward",
    "substitute_hf_flash_attn",
    "update_ring_flash_attn_params",
    "use_ring_attn",
]
