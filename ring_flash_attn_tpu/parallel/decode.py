"""Sequence-sharded long-context decode with a quantized KV cache.

The inference counterpart of the training schedules: the (int8) KV cache is
sharded contiguously along the sequence over the mesh axis; each decode step
computes a partial attention against the local cache shard and the partials
are LSE-combined across the axis with one psum — no ring needed for decode
(every rank already holds its shard; only O(Hq*D) partials cross the ICI,
not the cache).

This is the BASELINE.json long-context serving path: multi-host pod slice,
compressed KV, sequence-sharded.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.mask import NEG_INF
from ..ops.quant import QuantizedKV, quant_decode_attention, update_cache
from .mesh import ring_rank, ring_size


def merge_across_axis(out, lse, axis_name):
    """Combine per-shard normalized partials (out, lse) over the mesh axis.

    Stable cross-shard softmax combine: m = pmax(lse), w = exp(lse - m),
    out = psum(w*out)/psum(w). Dead shards (lse=NEG_INF) get w=0.
    """
    m = lax.pmax(lse, axis_name)
    m = jnp.maximum(m, NEG_INF / 2)  # all-dead row guard
    w = jnp.exp(lse - m)
    num = lax.psum(w[..., None] * out, axis_name)
    den = lax.psum(w, axis_name)
    den_safe = jnp.where(den == 0.0, 1.0, den)
    merged = num / den_safe[..., None]
    lse_m = jnp.where(den == 0.0, NEG_INF, m + jnp.log(den_safe))
    return merged, lse_m


def sharded_quant_decode(q, cache: QuantizedKV, total_length, scale,
                         axis_name, softcap=None):
    """Per-shard decode step (call inside shard_map).

    q (B, Hq, Tq, D) replicated new-token queries; cache = this rank's
    contiguous shard of the sequence. total_length: valid tokens globally
    (traced ok). Returns merged (out in q.dtype, lse f32) replicated.
    """
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    s_shard = cache.k_q.shape[2]
    start = rank * s_shard
    local_len = jnp.clip(total_length - start, 0, s_shard)
    out, lse = quant_decode_attention(
        q, cache, local_len, scale, pos_offset=start, softcap=softcap
    )
    out, lse = merge_across_axis(out, lse, axis_name)
    return out.astype(q.dtype), lse


def sharded_cache_update(cache: QuantizedKV, k_new, v_new, index,
                         axis_name):
    """Insert new tokens at global position `index` into the sharded cache.

    Each rank owns positions [rank*s_shard, (rank+1)*s_shard); tokens
    falling outside the local range are dropped by clamping + re-writing
    the same values (masked write via dynamic_update_slice with clamped
    index then select)."""
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    s_shard = cache.k_q.shape[2]
    t_new = k_new.shape[2]
    start = rank * s_shard
    local_idx = jnp.clip(index - start, 0, s_shard - t_new)
    owned = jnp.logical_and(index >= start, index < start + s_shard)
    updated = update_cache(cache, k_new, v_new, local_idx)
    return jax.tree.map(
        lambda new, old: jnp.where(owned, new, old), updated, cache
    )
