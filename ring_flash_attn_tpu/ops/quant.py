"""Quantized KV-cache ops for long-context decode.

The reference is a training library; its inference story is "shard the KV
around the ring". For TPU serving the binding constraint is HBM bandwidth —
decode attention reads the whole KV cache per token — so the framework ships
a compressed KV cache: int8 (symmetric, per-token-per-head scales over the
head dim) halves cache reads vs bf16 with negligible quality loss for
attention keys/values.

Layout: values int8 (B, Hkv, S, D); scales fp32 (B, Hkv, S). Dequantization
folds into the attention math after the QK^T / before the PV matmuls, so no
materialized bf16 copy of the cache ever exists.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .mask import NEG_INF


class QuantizedKV(NamedTuple):
    k_q: jax.Array  # int8 / fp8 (B, Hkv, S, D)
    k_scale: jax.Array  # f32 (B, Hkv, S)
    v_q: jax.Array  # int8 / fp8 (B, Hkv, S, D)
    v_scale: jax.Array  # f32 (B, Hkv, S)


_QDTYPES = {
    "int8": (jnp.int8, 127.0),
    "fp8_e4m3": (jnp.float8_e4m3fn, 448.0),
    "fp8_e5m2": (jnp.float8_e5m2, 57344.0),
}


def quantize_tensor(x, qdtype="int8"):
    """Symmetric quantization over the last dim: x ~= x_q * scale[..., None].

    qdtype: "int8" (default), "fp8_e4m3", "fp8_e5m2"."""
    dt, qmax = _QDTYPES[qdtype]
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax)
    scaled = xf / scale[..., None]
    if qdtype == "int8":
        x_q = jnp.clip(jnp.round(scaled), -qmax, qmax).astype(dt)
    else:
        x_q = scaled.astype(dt)
    return x_q, scale


def quantize_kv(k, v, qdtype="int8"):
    k_q, k_s = quantize_tensor(k, qdtype)
    v_q, v_s = quantize_tensor(v, qdtype)
    return QuantizedKV(k_q, k_s, v_q, v_s)


def make_cache(batch, kv_heads, max_len, head_dim, qdtype="int8"):
    """Empty quantized cache (decode-time rolling buffer)."""
    dt, _ = _QDTYPES[qdtype]
    z8 = jnp.zeros((batch, kv_heads, max_len, head_dim), dt)
    zs = jnp.ones((batch, kv_heads, max_len), jnp.float32)
    return QuantizedKV(z8, zs, z8, zs)


def update_cache(cache: QuantizedKV, k_new, v_new, index):
    """Insert new k/v (B, Hkv, T_new, D) at position `index` (traced ok)."""
    qdtype = next(
        name for name, (dt, _) in _QDTYPES.items() if dt == cache.k_q.dtype
    )
    k_q, k_s = quantize_tensor(k_new, qdtype)
    v_q, v_s = quantize_tensor(v_new, qdtype)
    upd4 = lambda buf, val: jax.lax.dynamic_update_slice_in_dim(
        buf, val, index, axis=2
    )
    return QuantizedKV(
        upd4(cache.k_q, k_q),
        upd4(cache.k_scale, k_s),
        upd4(cache.v_q, v_q),
        upd4(cache.v_scale, v_s),
    )


def quant_decode_attention(q, cache: QuantizedKV, length, scale,
                           pos_offset=0, softcap=None, backend=None):
    """Decode attention of q (B, Hq, Tq, D) against the quantized cache.

    length: number of valid cache positions (traced ok); positions >= length
    are masked. pos_offset: global position of this cache shard's first
    token (for sequence-sharded caches). Causal within the new tokens is NOT
    applied here (decode Tq is typically 1; for Tq > 1 prefill use the flash
    path on unquantized kv). Returns (out f32, lse f32) partials so shards
    can be LSE-merged.
    """
    from ..config import get_backend

    resolved = get_backend(backend)
    if resolved != "xla" and cache.k_q.shape[2] % 128 == 0:
        # streaming Pallas kernel: no whole-cache f32 temporaries (the XLA
        # path materializes dequantized k/v and the full logits row)
        from .quant_decode_pallas import pallas_quant_decode

        return pallas_quant_decode(
            q, cache, length, scale, softcap=softcap,
            interpret=(resolved == "pallas_interpret"),
        )
    b, hq, tq, d = q.shape
    hkv, s = cache.k_q.shape[1], cache.k_q.shape[2]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g * tq, d)
    # dequant folded after the matmul: (q @ k_q^T) * k_scale
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qf, cache.k_q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * cache.k_scale[:, :, None, :] * scale
    if softcap:
        # Gemma-2 style tanh capping, matching the training kernels
        logits = softcap * jnp.tanh(logits / softcap)
    valid = (
        jnp.arange(s, dtype=jnp.int32)[None, None, None, :] < length
    )
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # fold v_scale into p before the PV matmul (p * v_scale) @ v_q
    pv = p * cache.v_scale[:, :, None, :]
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", pv, cache.v_q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / l
    lse = (m + jnp.log(l))[..., 0]
    dead = m[..., 0] <= NEG_INF / 2
    out = jnp.where(dead[..., None], 0.0, out)
    lse = jnp.where(dead, NEG_INF, lse)
    return out.reshape(b, hq, tq, d), lse.reshape(b, hq, tq)
