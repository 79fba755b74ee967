from .mask import MaskArgs
from .merge import merge_partials
from .flash import (
    block_fwd,
    block_bwd,
    flash_attention,
)

__all__ = [
    "MaskArgs",
    "merge_partials",
    "block_fwd",
    "block_bwd",
    "flash_attention",
]
