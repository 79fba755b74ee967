"""2D (ring x Ulysses) context parallelism tests — USP extension."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.naive import naive_block_fwd
from ring_flash_attn_tpu.parallel import layouts
from ring_flash_attn_tpu.parallel.ulysses import usp_attention

WR, WU = 2, 4
B, HQ, HKV, S, D = 1, 8, 2, 512, 64
SCALE = D**-0.5


@pytest.mark.parametrize(
    "variant,causal",
    [("ring", False), ("ring", True), ("zigzag", True), ("stripe", True)],
)
def test_usp_matches_oracle(devices8, variant, causal):
    mesh = Mesh(np.array(devices8).reshape(WR, WU), ("rp", "up"))
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D), jnp.float32)

    tolocal = {
        "ring": None,
        "zigzag": layouts.all_local_zigzag,
        "stripe": layouts.all_local_stripe,
    }[variant]
    restore = {
        "ring": None,
        "zigzag": layouts.restore_zigzag,
        "stripe": layouts.restore_stripe,
    }[variant]
    if tolocal is not None:
        ql, kl, vl, doutl = (tolocal(x, WR, axis=2) for x in (q, k, v, dout))
    else:
        ql, kl, vl, doutl = q, k, v, dout

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, None, ("rp", "up"), None),) * 3,
             out_specs=(P(None, None, ("rp", "up"), None),
                        P(None, None, ("rp", "up"))),
             check_vma=False)
    def f(q, k, v):
        return usp_attention(
            q, k, v, scale=SCALE, causal=causal,
            ulysses_axis="up", ring_axis="rp", variant=variant,
        )

    out, _ = jax.jit(f)(ql, kl, vl)
    rs = (lambda x: restore(x, WR, axis=2)) if restore else (lambda x: x)
    ref, _ = naive_block_fwd(q, k, v, SCALE, MaskArgs(causal=causal))
    assert jnp.max(jnp.abs(rs(out) - ref)) < 2e-5

    g1 = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(f(q, k, v)[0] * doutl), (0, 1, 2)
    ))(ql, kl, vl)

    def oracle_loss(q, k, v):
        o, _ = naive_block_fwd(q, k, v, SCALE, MaskArgs(causal=causal))
        return jnp.sum(o * dout)

    g2 = jax.grad(oracle_loss, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert jnp.max(jnp.abs(rs(a) - b)) < 1e-4


def test_usp_dropout_equal_single_device(devices8):
    """2-D USP dropout: the ulysses head_offset + the inner ring's absolute
    sequence offsets keep the keep-mask globally consistent."""
    import numpy as np
    from ring_flash_attn_tpu.ops.flash import flash_attention
    from ring_flash_attn_tpu.ops.mask import MaskArgs

    mesh = Mesh(np.array(devices8).reshape(2, 4), ("hp", "sp"))
    B2, HQ2, HKV2, S2, D2 = 1, 4, 2, 256, 32
    scale = D2**-0.5
    q = jax.random.normal(jax.random.PRNGKey(0), (B2, HQ2, S2, D2),
                          jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B2, HKV2, S2, D2),
                          jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B2, HKV2, S2, D2),
                          jnp.float32)

    mask = MaskArgs(causal=True, dropout_p=0.25, dropout_seed=11)
    ref, _ = flash_attention(q, k, v, scale, mask, backend="xla")

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, None, ("sp", "hp"), None),) * 3,
        out_specs=(P(None, None, ("sp", "hp"), None),
                   P(None, None, ("sp", "hp"))),
        check_vma=False,
    )
    def f(q, k, v):
        return usp_attention(
            q, k, v, scale=scale, causal=True, ulysses_axis="hp",
            ring_axis="sp", variant="ring", dropout_p=0.25, dropout_seed=11,
        )

    out, _ = jax.jit(f)(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 2e-6
