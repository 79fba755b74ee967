"""Quantized-KV decode tests: quantization error bounds, sharded decode vs
full-precision oracle, cache update plumbing."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ring_flash_attn_tpu.ops.quant import (
    make_cache,
    quant_decode_attention,
    quantize_kv,
    quantize_tensor,
    update_cache,
)
from ring_flash_attn_tpu.parallel.decode import (
    sharded_cache_update,
    sharded_quant_decode,
)


W = 8
B, HQ, HKV, S, D = 1, 8, 2, 512, 64
SCALE = D**-0.5


@pytest.mark.parametrize(
    "qdtype,bound", [("int8", 1.0 / 127), ("fp8_e4m3", 1.0 / 8)]
)
def test_quantize_roundtrip_error(qdtype, bound):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64, 128), jnp.float32)
    x_q, s = quantize_tensor(x, qdtype)
    x_hat = x_q.astype(jnp.float32) * s[..., None]
    rel = jnp.max(jnp.abs(x - x_hat)) / jnp.max(jnp.abs(x))
    assert rel < bound


def test_fp8_decode_close_to_oracle():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    cache = quantize_kv(k, v, "fp8_e4m3")
    out, _ = quant_decode_attention(q, cache, S, SCALE)
    g = HQ // HKV
    qf = q.reshape(B, HKV, g, D)
    p = jax.nn.softmax(jnp.einsum("bhgd,bhkd->bhgk", qf, k) * SCALE, -1)
    ref = jnp.einsum("bhgk,bhkd->bhgd", p, v).reshape(B, HQ, 1, D)
    assert jnp.max(jnp.abs(out - ref)) < 0.12  # fp8_e4m3 ~2-3 mantissa bits


def test_quant_decode_matches_oracle():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    cache = quantize_kv(k, v)
    out, lse = quant_decode_attention(q, cache, S, SCALE)
    # full-precision oracle: decode token attends to all S positions
    g = HQ // HKV
    qf = q.reshape(B, HKV, g, D)
    logits = jnp.einsum("bhgd,bhkd->bhgk", qf, k) * SCALE
    p = jax.nn.softmax(logits, -1)
    ref = jnp.einsum("bhgk,bhkd->bhgd", p, v).reshape(B, HQ, 1, D)
    # int8 kv: expect ~1% error
    assert jnp.max(jnp.abs(out - ref)) < 0.02


def test_quant_decode_length_mask():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    cache = quantize_kv(k, v)
    out_half, _ = quant_decode_attention(q, cache, S // 2, SCALE)
    cache_half = quantize_kv(k[:, :, : S // 2], v[:, :, : S // 2])
    out_ref, _ = quant_decode_attention(q, cache_half, S // 2, SCALE)
    assert jnp.max(jnp.abs(out_half - out_ref)) < 1e-5


def test_sharded_decode_matches_single(devices8):
    mesh = Mesh(devices8, ("sp",))
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    cache = quantize_kv(k, v)
    length = jnp.int32(S - 100)  # partial fill

    ref, ref_lse = quant_decode_attention(q, cache, length, SCALE)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, None, "sp", None), P(None, None, "sp"),
                       P(None, None, "sp", None), P(None, None, "sp"), P()),
             out_specs=(P(), P()), check_vma=False)
    def f(q, kq, ks, vq, vs, length):
        from ring_flash_attn_tpu.ops.quant import QuantizedKV

        shard = QuantizedKV(kq, ks, vq, vs)
        return sharded_quant_decode(q, shard, length, SCALE, "sp")

    out, lse = jax.jit(f)(q, cache.k_q, cache.k_scale, cache.v_q,
                          cache.v_scale, length)
    assert jnp.max(jnp.abs(out - ref)) < 1e-5
    assert jnp.max(jnp.abs(lse - ref_lse)) < 1e-5


def test_cache_update_roundtrip():
    cache = make_cache(B, HKV, S, D)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, 16, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, 16, D), jnp.float32)
    cache = update_cache(cache, k, v, 32)
    k_hat = cache.k_q[:, :, 32:48].astype(jnp.float32) * cache.k_scale[
        :, :, 32:48, None
    ]
    assert jnp.max(jnp.abs(k_hat - k)) < 0.02


def test_sharded_cache_update(devices8):
    mesh = Mesh(devices8, ("sp",))
    s_shard = S // W
    cache = make_cache(B, HKV, S, D)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, 1, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, 1, D), jnp.float32)
    index = jnp.int32(3 * s_shard + 5)  # lands on rank 3

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, None, "sp", None), P(None, None, "sp"),
                       P(None, None, "sp", None), P(None, None, "sp"),
                       P(), P(), P()),
             out_specs=(P(None, None, "sp", None), P(None, None, "sp"),
                        P(None, None, "sp", None), P(None, None, "sp")),
             check_vma=False)
    def f(kq, ks, vq, vs, k, v, index):
        from ring_flash_attn_tpu.ops.quant import QuantizedKV

        return tuple(
            sharded_cache_update(QuantizedKV(kq, ks, vq, vs), k, v, index,
                                 "sp")
        )

    kq, ks, vq, vs = jax.jit(f)(cache.k_q, cache.k_scale, cache.v_q,
                                cache.v_scale, k, v, index)
    k_hat = kq[:, :, 3 * s_shard + 5].astype(jnp.float32) * ks[
        :, :, 3 * s_shard + 5, None
    ]
    assert jnp.max(jnp.abs(k_hat - k[:, :, 0])) < 0.02
    # everything else untouched (still zeros)
    mask = np.ones(S, bool)
    mask[3 * s_shard + 5] = False
    assert jnp.all(kq[:, :, mask] == 0)


def test_quant_decode_softcap():
    """Softcap (Gemma-2) on the quantized decode path vs a dense capped
    oracle on the dequantized cache."""
    import jax
    import jax.numpy as jnp
    from ring_flash_attn_tpu.ops.quant import (
        quantize_kv, quant_decode_attention,
    )

    B, HQ, HKV, S, D, CAP = 1, 4, 2, 128, 64, 8.0
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    cache = quantize_kv(k, v)
    out, _ = quant_decode_attention(q, cache, S, D**-0.5, softcap=CAP)

    # oracle on the dequantized cache values (isolates the softcap math
    # from quantization error)
    kd = cache.k_q.astype(jnp.float32) * cache.k_scale[..., None]
    vd = cache.v_q.astype(jnp.float32) * cache.v_scale[..., None]
    g = HQ // HKV
    qf = q.astype(jnp.float32).reshape(B, HKV, g, D)
    s_ = jnp.einsum("bhgd,bhkd->bhgk", qf, kd) * (D**-0.5)
    s_ = CAP * jnp.tanh(s_ / CAP)
    p = jax.nn.softmax(s_, axis=-1)
    ref = jnp.einsum("bhgk,bhkd->bhgd", p, vd).reshape(B, HQ, 1, D)
    assert jnp.max(jnp.abs(out - ref)) < 1e-4


def test_pallas_decode_matches_xla():
    """The streaming Pallas decode kernel (interpret mode) matches the XLA
    path, including length masking, GQA, softcap, and fp8 caches."""
    import jax
    import jax.numpy as jnp
    from ring_flash_attn_tpu.ops.quant import (
        quantize_kv, quant_decode_attention,
    )

    B, HQ, HKV, S, D = 2, 4, 2, 512, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    for qdtype, cap in (("int8", None), ("int8", 12.0), ("fp8_e4m3", None)):
        cache = quantize_kv(k, v, qdtype=qdtype)
        ref_o, ref_l = quant_decode_attention(
            q, cache, 300, D**-0.5, softcap=cap, backend="xla"
        )
        got_o, got_l = quant_decode_attention(
            q, cache, 300, D**-0.5, softcap=cap, backend="pallas_interpret"
        )
        assert jnp.max(jnp.abs(got_o - ref_o)) < 5e-3, (qdtype, cap)
        assert jnp.max(jnp.abs(got_l - ref_l)) < 5e-3, (qdtype, cap)


def test_pallas_decode_non_pow2_cache():
    """Cache lengths that are multiples of 128 but not of the default 1024
    block (e.g. 1280) must pick a dividing block, not assert (ADVICE
    round 1, quant.py)."""
    import jax
    import jax.numpy as jnp
    from ring_flash_attn_tpu.ops.quant import (
        quantize_kv, quant_decode_attention,
    )

    B, HQ, HKV, S, D = 1, 4, 2, 1280, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    cache = quantize_kv(k, v, qdtype="int8")
    ref_o, ref_l = quant_decode_attention(
        q, cache, 1000, D**-0.5, backend="xla"
    )
    got_o, got_l = quant_decode_attention(
        q, cache, 1000, D**-0.5, backend="pallas_interpret"
    )
    assert jnp.max(jnp.abs(got_o - ref_o)) < 5e-3
    assert jnp.max(jnp.abs(got_l - ref_l)) < 5e-3
