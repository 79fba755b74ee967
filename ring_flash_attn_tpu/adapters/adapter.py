"""Model-integration adapter (reference adapters/hf_adapter.py).

The reference makes any HF causal LM ring-capable by monkeypatching
transformers' flash-attention entry points and feeding per-batch sharding
metadata through a module-global DATA_PARAMS dict
(reference hf_adapter.py:32,42-62,361-393). The TPU-native analog:

- `update_ring_flash_attn_params(cu_seqlens, group)` — identical contract:
  recompute the llama3 sharding metadata for the new batch and stash it
  (reference :42-62). Call once per batch, before the model forward.
- `use_ring_attn(bool)` — runtime toggle (reference RING_ATTN_SWITCH, :33).
- `ring_attention_forward(q, k, v, ...)` — the attention callable models
  route through: per-shard (B, S, H, D) in/out, dispatching to
  llama3_flash_attn_varlen_func with DATA_PARAMS, or plain causal flash
  when the switch is off. models/transformer.py consumes this, and
  `substitute_hf_flash_attn` wires it into HF transformers' Flax models.

Constraints mirror the reference: causal-only, packed batch_size == 1
(reference hf_adapter.py:138-147).
"""

import jax.numpy as jnp

from ..api import (
    flash_attn_func,
    llama3_flash_attn_prepare_cu_seqlens,
    llama3_flash_attn_varlen_func,
)

# Per-batch sharding metadata, set by update_ring_flash_attn_params —
# the reference's module-global of the same name (hf_adapter.py:32).
DATA_PARAMS = {}
_RING_ATTN_SWITCH = True


def use_ring_attn(enable):
    """Runtime toggle (reference hf_adapter.py:65-67)."""
    global _RING_ATTN_SWITCH
    _RING_ATTN_SWITCH = enable


def update_ring_flash_attn_params(cu_seqlens, group=None, rank=None,
                                  world_size=None):
    """Recompute llama3 metadata for this batch (reference :42-62).

    cu_seqlens: GLOBAL packed cu_seqlens (host ints). rank/world_size
    identify this shard; unlike torch.distributed, JAX SPMD has no ambient
    process group outside traced code, so they are explicit (every rank of
    a multi-host program passes its own jax.process_index-derived rank, or
    the adapter is used inside shard_map where api-level functions read the
    axis instead)."""
    assert rank is not None and world_size is not None, (
        "rank/world_size are required on TPU (no ambient process group)"
    )
    (
        cu_seqlens_q,
        cu_seqlens_k,
        max_seqlen_q,
        max_seqlen_k,
        local_k_slice,
    ) = llama3_flash_attn_prepare_cu_seqlens(
        cu_seqlens, causal=True, rank=rank, world_size=world_size
    )
    DATA_PARAMS.update(
        {
            "cu_seqlens_q": cu_seqlens_q,
            "cu_seqlens_k": cu_seqlens_k,
            "max_seqlen_q": max_seqlen_q,
            "max_seqlen_k": max_seqlen_k,
            "local_k_slice": local_k_slice,
            "group": group,
        }
    )


def ring_attention_forward(q, k, v, causal=True, softmax_scale=None,
                           heads_k_stride=None, group=None):
    """Attention override: (B, S, H, D) in/out, B == 1 packed when ring is
    on (the reference enforces the same, hf_adapter.py:145-147)."""
    if not _RING_ATTN_SWITCH or not DATA_PARAMS:
        return flash_attn_func(
            q, k, v, softmax_scale=softmax_scale, causal=causal
        )
    assert causal, "ring adapter is causal-only (reference :138-144)"
    assert q.shape[0] == 1, (
        "ring adapter requires packed batch_size == 1 (reference :145-147)"
    )
    out = llama3_flash_attn_varlen_func(
        q[0], k[0], v[0],
        cu_seqlens_q=DATA_PARAMS["cu_seqlens_q"],
        cu_seqlens_k=DATA_PARAMS["cu_seqlens_k"],
        max_seqlen_q=DATA_PARAMS["max_seqlen_q"],
        max_seqlen_k=DATA_PARAMS["max_seqlen_k"],
        heads_k_stride=heads_k_stride,
        local_k_slice=DATA_PARAMS["local_k_slice"],
        softmax_scale=softmax_scale,
        causal=True,
        group=group if group is not None else DATA_PARAMS.get("group"),
    )
    return out[None]


def substitute_hf_flash_attn(process_group=None, heads_k_stride=1):
    """Patch HF transformers so Flax causal-LM attention routes through
    ring attention (the reference patches torch transformers' private
    _flash_attention_forward + ALL_ATTENTION_FUNCTIONS, hf_adapter.py:361-393).

    Round-1 scope: registers `ring_attention_forward` as the override used
    by models/transformer.py and returns it; wiring into
    transformers.modeling_flax_* lands with the model-zoo pass."""
    global _HF_SUBSTITUTED
    _HF_SUBSTITUTED = True
    DATA_PARAMS.setdefault("group", process_group)
    DATA_PARAMS["heads_k_stride"] = heads_k_stride
    return ring_attention_forward


_HF_SUBSTITUTED = False
