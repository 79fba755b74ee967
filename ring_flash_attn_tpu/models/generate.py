"""Long-context inference: context-parallel prefill + sequence-sharded
quantized-KV decode (the BASELINE.json serving configuration).

Prefill runs the llama3 all-gather schedule over the contiguous-sharded
prompt and quantizes each layer's (post-rotary) K/V into an int8 cache
shard owned by this rank — the cache sharding IS the prompt sharding, so
nothing moves. Decode feeds one token at a time with two cache regions:

- the sharded prompt cache (read-only after prefill): each rank computes a
  local partial and the partials LSE-combine across the axis with one psum
  (parallel/decode.py) — only O(H*D) crosses the ICI per step, never the KV.
- a small REPLICATED tail cache for generated tokens: every rank appends
  the same new KV and computes the same tail partial locally, which merges
  into the cross-shard result with the standard fp32 LSE merge. Long-context
  serving generates few tokens relative to the prompt, so the replicated
  tail costs ~nothing and keeps every shape static.

Everything here is per-shard (call inside shard_map over `axis_name`).
"""

import jax.numpy as jnp
from jax import lax

from ..ops.merge import merge_partials
from ..ops.quant import make_cache, quant_decode_attention, update_cache
from ..parallel.decode import merge_across_axis
from ..parallel.llama3 import llama3_attention
from ..parallel.mesh import ring_rank, ring_size
from .transformer import ModelConfig, _mlp, _rmsnorm, _rope


def _proj_qkv(cfg, x, layer, positions):
    b, s, d = x.shape
    h, hkv, hd = cfg.heads, cfg.kv_heads, cfg.head_dim
    xn = _rmsnorm(x, layer["attn_norm"])
    q = (xn @ layer["wq"]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = (xn @ layer["wk"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    v = (xn @ layer["wv"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    return q, k, v


def prefill(params, cfg: ModelConfig, tokens, axis_name):
    """Per-shard prefill over the contiguous-sharded prompt.

    tokens (B, S_local): rank r holds global tokens [r*S_local,
    (r+1)*S_local). Returns (logits (B, S_local, vocab), caches: one
    QuantizedKV shard of length S_local per layer)."""
    rank = ring_rank(axis_name)
    b, s_local = tokens.shape
    positions = rank * s_local + jnp.arange(s_local, dtype=jnp.int32)
    scale = cfg.head_dim**-0.5

    x = params["embed"][tokens]
    caches = []
    for layer in params["layers"]:
        q, k, v = _proj_qkv(cfg, x, layer, positions)
        out, _ = llama3_attention(
            q, k, v, None, scale=scale, causal=True, axis_name=axis_name
        )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s_local, -1)
        x = x + out @ layer["wo"]
        x = _mlp(x, layer)
        cache = update_cache(
            make_cache(b, cfg.kv_heads, s_local, cfg.head_dim), k, v, 0
        )
        caches.append(cache)
    x = _rmsnorm(x, params["final_norm"])
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, caches


def decode_step(params, cfg: ModelConfig, token, index, n_tail, caches,
                tails, axis_name):
    """One decode step. token (B,) int32 at global position `index`;
    n_tail = generated tokens already in the tail cache (before this one).
    Returns (logits (B, vocab), updated tail caches)."""
    b = token.shape[0]
    scale = cfg.head_dim**-0.5
    s_local = caches[0].k_q.shape[2]
    x = params["embed"][token][:, None]  # (B, 1, d)
    new_tails = []
    for layer, cache, tail in zip(params["layers"], caches, tails):
        q, k, v = _proj_qkv(cfg, x, layer, index.reshape(1))
        tail = update_cache(tail, k, v, n_tail)
        # sharded prompt partial + cross-shard combine
        p_out, p_lse = quant_decode_attention(q, cache, s_local, scale)
        p_out, p_lse = merge_across_axis(p_out, p_lse, axis_name)
        # replicated tail partial, merged locally
        t_out, t_lse = quant_decode_attention(q, tail, n_tail + 1, scale)
        out, _ = merge_partials(p_out, p_lse, t_out, t_lse)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, 1, -1)
        x = x + out @ layer["wo"]
        x = _mlp(x, layer)
        new_tails.append(tail)
    x = _rmsnorm(x, params["final_norm"])
    logits = (x[:, 0] @ params["lm_head"]).astype(jnp.float32)
    return logits, new_tails


def generate(params, cfg: ModelConfig, prompt_local, steps, axis_name,
             max_new=None):
    """Greedy generation: prefill the sharded prompt, then `steps` decode
    steps. Returns (B, steps) generated tokens (replicated).

    prompt_local (B, S_local): this rank's contiguous prompt shard."""
    max_new = max_new or steps
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    b, s_local = prompt_local.shape
    prompt_len = s_local * w

    logits, caches = prefill(params, cfg, prompt_local, axis_name)
    # the next token comes from the LAST global position (on the last rank);
    # psum-select so every rank agrees.
    last_logits = lax.psum(
        jnp.where(rank == w - 1, logits[:, -1], 0.0), axis_name
    )
    token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
    tails = [
        make_cache(b, cfg.kv_heads, max_new, cfg.head_dim)
        for _ in params["layers"]
    ]

    def body(carry, step):
        token, tails = carry
        index = jnp.int32(prompt_len) + step
        logits, tails = decode_step(
            params, cfg, token, index, step, caches, tails, axis_name
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, tails), token

    (_, _), toks = lax.scan(
        body, (token, tails), jnp.arange(steps, dtype=jnp.int32)
    )
    return toks.T  # (B, steps)
