"""Model-integration adapter (reference adapters/hf_adapter.py).

The reference makes any HF causal LM ring-capable by monkeypatching
transformers' flash-attention entry points and feeding per-batch sharding
metadata through a module-global DATA_PARAMS dict
(reference hf_adapter.py:32,42-62,361-393). The TPU-native analog differs in
one key way: torchrun gives every rank its own process (per-rank metadata in
a global), while JAX SPMD traces ONE program for all ranks — so DATA_PARAMS
holds *global* metadata (the packed batch's per-token segment labels) and
each shard slices out its piece with `lax.axis_index` inside the trace.

- `update_ring_flash_attn_params(cu_seqlens, group)` — per batch, before the
  model forward (reference :42-62): stores the global segment-label array.
- `use_ring_attn(bool)` — runtime toggle (reference RING_ATTN_SWITCH, :33).
- `ring_attention_forward(q, k, v, ...)` — the attention override models
  route through: per-shard (B, S_local, H, D) in/out, llama3 all-gather
  context parallelism underneath.
- `substitute_hf_flash_attn()` — patches HF transformers' Flax decoder
  attention (llama/mistral/gemma) to route through the override.

Constraints mirror the reference: causal-only, packed batch_size == 1
(reference hf_adapter.py:138-147). The patched model must be applied inside
shard_map over the context-parallel axis with global position_ids per shard.
"""

import importlib
import warnings

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..api import _axis, flash_attn_func
from ..parallel.llama3 import llama3_attention

# Per-batch sharding metadata, set by update_ring_flash_attn_params —
# the reference's module-global of the same name (hf_adapter.py:32).
DATA_PARAMS = {}
_RING_ATTN_SWITCH = True
_HF_SUBSTITUTED = False


def use_ring_attn(enable):
    """Runtime toggle (reference hf_adapter.py:65-67)."""
    global _RING_ATTN_SWITCH
    _RING_ATTN_SWITCH = enable


def update_ring_flash_attn_params(cu_seqlens, group=None):
    """Recompute sharding metadata for this batch (reference :42-62).

    cu_seqlens: GLOBAL packed cu_seqlens (host ints). Stores each token's
    globally-consistent segment label (its sequence's global start), which
    every shard slices by axis_index at trace time — replacing the
    reference's per-rank cu_seqlens_q/k + local_k_slice."""
    cu = np.asarray(cu_seqlens, np.int64)
    total = int(cu[-1])
    seg = np.searchsorted(cu, np.arange(total), side="right") - 1
    DATA_PARAMS.update(
        {
            "global_segids": jnp.asarray(cu[seg], jnp.int32),
            "total": total,
            "group": group,
        }
    )


def current_ring_params():
    """The current batch's metadata as a pytree of traced-safe arrays.

    jit-caching caveat: `ring_attention_forward`'s implicit DATA_PARAMS
    fallback bakes the segment labels into the trace as a CONSTANT — a
    later `update_ring_flash_attn_params` with a different packing of the
    same shape would silently reuse the stale constants under a cached
    jit. Thread this pytree through your jitted step's arguments and pass
    it as `global_segids=` instead; it is then a traced input and every
    batch's packing flows through the cached executable correctly."""
    return {"global_segids": DATA_PARAMS["global_segids"]}


def ring_attention_forward(q, k, v, causal=True, softmax_scale=None,
                           heads_k_stride=None, group=None,
                           position_ids=None, softcap=0.0,
                           alibi_slopes=None, global_segids=None):
    """Attention override: (B, S_local, H, D) in/out, packed batch_size == 1
    when ring is on (the reference enforces the same, hf_adapter.py:145-147).
    Must run inside shard_map over the context-parallel axis.

    Segment labels, in preference order:
    1. `position_ids` (packed batches reset positions at each sequence
       start, so a token's sequence label is its global packed index minus
       its within-sequence position) — fully traced, immune to stale jit
       constants; what the HF patch uses.
    2. `global_segids` — the `current_ring_params()` pytree threaded
       through the caller's jitted arguments; also fully traced.
    3. The implicit DATA_PARAMS fallback: correct eagerly or on first
       trace, but BAKED AS A CONSTANT into any cached jit — a same-shape
       different-packing batch would silently reuse stale metadata, so
       this path warns at trace time."""
    if not _RING_ATTN_SWITCH or (
        position_ids is None and global_segids is None
        and "global_segids" not in DATA_PARAMS
    ):
        return flash_attn_func(
            q, k, v, softmax_scale=softmax_scale, causal=causal,
            softcap=softcap, alibi_slopes=alibi_slopes,
        )
    assert causal, "ring adapter is causal-only (reference :138-144)"
    assert q.shape[0] == 1, (
        "ring adapter requires packed batch_size == 1 (reference :145-147)"
    )
    axis = _axis(group if group is not None else DATA_PARAMS.get("group"))
    l = q.shape[1]
    try:
        rank = lax.axis_index(axis)
    except NameError:
        # not inside shard_map over the CP axis — e.g. flax module init
        # traces the patched attention while constructing a model AFTER
        # substitute_hf_flash_attn(); run the single-device path
        return flash_attn_func(
            q, k, v, softmax_scale=softmax_scale, causal=causal,
            softcap=softcap, alibi_slopes=alibi_slopes,
        )
    if position_ids is not None:
        tok_idx = rank * l + jnp.arange(l, dtype=jnp.int32)
        seg_local = tok_idx - position_ids.reshape(-1).astype(jnp.int32)
    elif global_segids is not None:
        seg_local = lax.dynamic_slice(
            jnp.asarray(global_segids, jnp.int32), (rank * l,), (l,)
        )
    else:
        warnings.warn(
            "ring_attention_forward is tracing with DATA_PARAMS segment "
            "labels baked in as constants: re-running this jitted function "
            "after update_ring_flash_attn_params() with a different "
            "packing of the same shape will silently use stale metadata. "
            "Pass position_ids, or thread current_ring_params() through "
            "your step's arguments as global_segids.",
            stacklevel=2,
        )
        seg_local = lax.dynamic_slice(
            DATA_PARAMS["global_segids"], (rank * l,), (l,)
        )
    scale = softmax_scale if softmax_scale is not None else q.shape[-1] ** -0.5
    out, _ = llama3_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        seg_local, scale=scale, causal=True,
        heads_k_stride=heads_k_stride or DATA_PARAMS.get("heads_k_stride"),
        axis_name=axis,
        softcap=float(softcap) if softcap else None,
        alibi_slopes=alibi_slopes,
    )
    return jnp.swapaxes(out, 1, 2)


def _make_patched_flax_attention_call(orig_call):
    """Ring-aware replacement for HF Flax decoder attention __call__
    (FlaxLlamaAttention and its mistral/gemma copies share this signature).
    Falls back to the original for decode-cache / attn-weights paths — the
    same scoping as the reference's patched _flash_attention_forward
    (hf_adapter.py:74-167)."""

    def patched(self, hidden_states, attention_mask, position_ids,
                deterministic=True, init_cache=False,
                output_attentions=False):
        using_cache = init_cache or self.has_variable("cache", "cached_key")
        if not _RING_ATTN_SWITCH or using_cache or output_attentions:
            return orig_call(
                self, hidden_states, attention_mask, position_ids,
                deterministic=deterministic, init_cache=init_cache,
                output_attentions=output_attentions,
            )
        query = self._split_heads(self.q_proj(hidden_states), self.num_heads)
        key = self._split_heads(
            self.k_proj(hidden_states), self.num_key_value_heads
        )
        value = self._split_heads(
            self.v_proj(hidden_states), self.num_key_value_heads
        )
        # position_ids carry each token's within-sequence position (the
        # standard packed convention) — correct rotary phases per shard AND
        # enough to recover segment labels (see ring_attention_forward).
        key, query = self.rotary_emb(key, query, position_ids)
        attn_output = ring_attention_forward(
            query, key, value, causal=True,
            softmax_scale=self.head_dim**-0.5,
            position_ids=position_ids,
        )
        attn_output = self._merge_heads(attn_output.astype(self.dtype))
        attn_output = self.o_proj(attn_output)
        return (attn_output,)

    return patched


def substitute_hf_flash_attn(process_group=None, heads_k_stride=1):
    """Make HF transformers' Flax causal-LM attention ring-capable (the
    reference patches torch transformers' private _flash_attention_forward +
    ALL_ATTENTION_FUNCTIONS, hf_adapter.py:361-393; on the JAX side the
    integration point is the Flax attention modules' __call__).

    Patches every available Flax decoder family with the llama attention
    structure (llama, mistral, gemma). Call once at startup; then per batch
    call `update_ring_flash_attn_params`, and apply the model inside
    shard_map over the context-parallel axis with global position_ids.
    Returns `ring_attention_forward` for custom stacks."""
    global _HF_SUBSTITUTED
    DATA_PARAMS["group"] = process_group
    DATA_PARAMS["heads_k_stride"] = heads_k_stride
    if _HF_SUBSTITUTED:
        return ring_attention_forward

    targets = [
        ("transformers.models.llama.modeling_flax_llama",
         "FlaxLlamaAttention"),
        ("transformers.models.mistral.modeling_flax_mistral",
         "FlaxMistralAttention"),
        ("transformers.models.gemma.modeling_flax_gemma",
         "FlaxGemmaAttention"),
    ]
    patched_any = False
    for mod_name, cls_name in targets:
        try:
            mod = importlib.import_module(mod_name)
            cls = getattr(mod, cls_name)
        except Exception:
            continue
        cls.__call__ = _make_patched_flax_attention_call(cls.__call__)
        patched_any = True
    _HF_SUBSTITUTED = patched_any
    return ring_attention_forward
