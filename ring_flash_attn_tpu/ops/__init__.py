from .mask import MaskArgs
from .merge import merge_partials
from .flash import (
    block_fwd,
    block_bwd,
    flash_attention,
)
from .paged import (
    PagedKVCache,
    QuantPagedKVCache,
    paged_append,
    paged_decode_attention,
    paged_init,
    paged_prefill,
    paged_quant_append,
    paged_quant_decode_attention,
    paged_quant_init,
    paged_quant_prefill,
)

__all__ = [
    "MaskArgs",
    "PagedKVCache",
    "QuantPagedKVCache",
    "paged_append",
    "paged_decode_attention",
    "paged_init",
    "paged_prefill",
    "paged_quant_append",
    "paged_quant_decode_attention",
    "paged_quant_init",
    "paged_quant_prefill",
    "merge_partials",
    "block_fwd",
    "block_bwd",
    "flash_attention",
]
