from .mask import MaskArgs
from .merge import merge_partials
from .flash import (
    block_fwd,
    block_bwd,
    flash_attention,
)
from .paged import (
    PagedKVCache,
    paged_append,
    paged_decode_attention,
    paged_init,
    paged_prefill,
)

__all__ = [
    "MaskArgs",
    "PagedKVCache",
    "paged_append",
    "paged_decode_attention",
    "paged_init",
    "paged_prefill",
    "merge_partials",
    "block_fwd",
    "block_bwd",
    "flash_attention",
]
