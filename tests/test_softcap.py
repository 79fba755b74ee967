"""Softcap (tanh logit capping) tests — an EXTENSION over the reference,
which forcibly zeroes flash-attn's softcap (reference utils.py:19-20).

Oracle = plain softmax attention with `s -> cap * tanh(s / cap)` applied to
the scaled logits (the Gemma-2 formulation flash-attn implements), gradients
via autodiff.
"""

from functools import partial

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ring_flash_attn_tpu.ops.flash import flash_attention
from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.parallel import layouts
from ring_flash_attn_tpu.parallel.ring import ring_attention
from ring_flash_attn_tpu.parallel.zigzag import zigzag_ring_attention

B, HQ, HKV, S, D = 1, 4, 2, 256, 64
SCALE = D**-0.5
CAP = 30.0
W = 8
SPEC4 = P(None, None, "sp", None)
SPEC3 = P(None, None, "sp")


def capped_attention(q, k, v, causal=True):
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, s, d)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qf, k.astype(jnp.float32)) * SCALE
    logits = CAP * jnp.tanh(logits / CAP)
    if causal:
        i = jnp.arange(s)
        logits = jnp.where(i[:, None] >= i[None, :], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", p, v.astype(jnp.float32))
    return out.reshape(b, hq, s, d)


@pytest.fixture(scope="module")
def data():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D), jnp.float32)
    return q, k, v, dout


def _ref(q, k, v, dout, causal=True):
    ref = capped_attention(q, k, v, causal)

    def loss(q, k, v):
        return jnp.sum(capped_attention(q, k, v, causal) * dout)

    return (ref,) + jax.grad(loss, (0, 1, 2))(q, k, v)


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_softcap(data, backend, causal):
    q, k, v, dout = data
    ref, dq_r, dk_r, dv_r = _ref(q, k, v, dout, causal)
    mask = MaskArgs(causal=causal, softcap=CAP)

    def loss(q, k, v):
        o, _ = flash_attention(q, k, v, SCALE, mask, backend=backend)
        return jnp.sum(o * dout)

    out, _ = flash_attention(q, k, v, SCALE, mask, backend=backend)
    dq, dk, dv = jax.grad(loss, (0, 1, 2))(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5
    assert jnp.max(jnp.abs(dq - dq_r)) < 1e-4
    assert jnp.max(jnp.abs(dk - dk_r)) < 1e-4
    assert jnp.max(jnp.abs(dv - dv_r)) < 1e-4


@pytest.mark.parametrize("kind", ["ring", "zigzag"])
def test_distributed_softcap(devices8, data, kind):
    mesh = Mesh(devices8, ("sp",))
    q, k, v, dout = data
    ref, dq_r, dk_r, dv_r = _ref(q, k, v, dout, causal=True)

    if kind == "ring":
        fn = lambda q, k, v: ring_attention(
            q, k, v, scale=SCALE, causal=True, axis_name="sp", softcap=CAP
        )
        tolocal = restore = lambda x, w, axis: x
    else:
        fn = lambda q, k, v: zigzag_ring_attention(
            q, k, v, scale=SCALE, axis_name="sp", softcap=CAP
        )
        tolocal, restore = layouts.all_local_zigzag, layouts.restore_zigzag

    ql, kl, vl, doutl = (tolocal(x, W, axis=2) for x in (q, k, v, dout))

    @partial(shard_map, mesh=mesh, in_specs=(SPEC4,) * 3,
             out_specs=(SPEC4, SPEC3), check_vma=False)
    def sharded(q, k, v):
        return fn(q, k, v)

    out, _ = jax.jit(sharded)(ql, kl, vl)

    def loss(q, k, v):
        o, _ = sharded(q, k, v)
        return jnp.sum(o * doutl)

    dq, dk, dv = jax.jit(jax.grad(loss, (0, 1, 2)))(ql, kl, vl)
    rs = lambda x: restore(x, W, axis=2)
    assert jnp.max(jnp.abs(rs(out) - ref)) < 2e-5
    assert jnp.max(jnp.abs(rs(dq) - dq_r)) < 1e-4
    assert jnp.max(jnp.abs(rs(dk) - dk_r)) < 1e-4
    assert jnp.max(jnp.abs(rs(dv) - dv_r)) < 1e-4


def test_api_softcap(data):
    from ring_flash_attn_tpu.api import flash_attn_func

    q, k, v, dout = data
    ref, *_ = _ref(q, k, v, dout, causal=True)
    out = flash_attn_func(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), causal=True, softcap=CAP,
    )
    assert jnp.max(jnp.abs(out.transpose(0, 2, 1, 3) - ref)) < 2e-5
