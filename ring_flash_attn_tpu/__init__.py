"""ring-flash-attention-tpu: TPU-native ring/context-parallel flash attention.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
zhuzilin/ring-flash-attention (see SURVEY.md): Pallas flash-attention block
kernels (fwd+bwd, causal, GQA, varlen-via-segment-ids), LSE-rescale partial
merging, and four context-parallel schedules (basic ring, zigzag, stripe,
llama3 all-gather) expressed as shard_map programs over a jax.sharding.Mesh
with `jax.lax.ppermute` / `all_gather` / `psum_scatter` collectives instead of
NCCL P2P.

Public API mirrors the reference's 18 attention entry points
(reference ring_flash_attn/__init__.py:1-35) plus TPU-native extras.
"""

__version__ = "0.3.0"

from .api import *  # noqa: F401,F403
from .api import __all__ as _api_all
from .adapters import (  # noqa: F401
    RingAttentionLayer,
    current_ring_params,
    get_attention,
    list_attention,
    register_attention,
    substitute_hf_flash_attn,
    update_ring_flash_attn_params,
    use_ring_attn,
)

__all__ = list(_api_all) + [
    "RingAttentionLayer",
    "current_ring_params",
    "get_attention",
    "list_attention",
    "register_attention",
    "substitute_hf_flash_attn",
    "update_ring_flash_attn_params",
    "use_ring_attn",
]
