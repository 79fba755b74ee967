"""Ulysses head-parallel SP tests (extension beyond the reference)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.naive import naive_block_fwd
from ring_flash_attn_tpu.parallel.ulysses import ulysses_attention

W = 8
B, HQ, HKV, S, D = 1, 8, 2, 512, 64
SCALE = D**-0.5


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_oracle(devices8, causal):
    mesh = Mesh(np.array(devices8), ("sp",))
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D), jnp.float32)

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
             out_specs=(P(None, None, "sp", None), P(None, None, "sp")),
             check_vma=False)
    def f(q, k, v):
        return ulysses_attention(
            q, k, v, scale=SCALE, causal=causal, axis_name="sp"
        )

    out, lse = jax.jit(f)(q, k, v)
    ref, ref_lse = naive_block_fwd(q, k, v, SCALE, MaskArgs(causal=causal))
    assert jnp.max(jnp.abs(out - ref)) < 2e-5
    assert jnp.max(jnp.abs(lse - ref_lse)) < 2e-5

    g1 = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(f(q, k, v)[0] * dout), (0, 1, 2)
    ))(q, k, v)

    def oracle_loss(q, k, v):
        o, _ = naive_block_fwd(q, k, v, SCALE, MaskArgs(causal=causal))
        return jnp.sum(o * dout)

    g2 = jax.grad(oracle_loss, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert jnp.max(jnp.abs(a - b)) < 1e-4


def test_ulysses_dropout_and_alibi_equal_single_device(devices8):
    """Head-sharded dropout uses global head ids (head_offset), so the
    pattern is bit-identical to the unsharded computation; ALiBi slopes are
    sliced per shard."""
    mesh = Mesh(np.array(devices8), ("sp",))
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    slopes = jnp.asarray([2.0 ** (-(i + 1)) for i in range(HQ)], jnp.float32)

    from ring_flash_attn_tpu.ops.flash import flash_attention

    mask = MaskArgs(causal=True, dropout_p=0.25, dropout_seed=7,
                    alibi_slopes=slopes)
    ref, _ = flash_attention(q, k, v, SCALE, mask, backend="xla")

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
             out_specs=(P(None, None, "sp", None), P(None, None, "sp")),
             check_vma=False)
    def f(q, k, v):
        return ulysses_attention(
            q, k, v, scale=SCALE, causal=True, axis_name="sp",
            dropout_p=0.25, dropout_seed=7, alibi_slopes=slopes,
        )

    out, _ = jax.jit(f)(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 2e-6
