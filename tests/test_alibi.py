"""ALiBi tests — an EXTENSION over the reference, which supports
alibi_slopes nowhere (asserts None, reference ring_flash_attn.py:176).

Semantics follow flash-attn: bias = -slope_h * (q_pos - kv_pos) when causal,
-slope_h * |q_pos - kv_pos| otherwise, added to the scaled (and softcapped,
if any) logits. Oracle = plain softmax + explicit bias, autodiff gradients.
"""

from functools import partial

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ring_flash_attn_tpu.ops.flash import flash_attention
from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.parallel.ring import ring_attention

B, HQ, HKV, S, D = 1, 4, 2, 256, 64
SCALE = D**-0.5
W = 8
SPEC4 = P(None, None, "sp", None)
SPEC3 = P(None, None, "sp")


def slopes_for(n):
    # geometric slopes as in the ALiBi paper
    return jnp.asarray([2.0 ** (-8.0 * (i + 1) / n) for i in range(n)],
                       jnp.float32)


SLOPES = slopes_for(HQ)


def alibi_attention(q, k, v, causal):
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, s, d)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qf, k.astype(jnp.float32)) * SCALE
    i = jnp.arange(s)
    dist = (i[:, None] - i[None, :]).astype(jnp.float32)
    if not causal:
        dist = jnp.abs(dist)
    logits = logits - SLOPES.reshape(hkv, g, 1, 1) * dist
    if causal:
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


def _ref(q, k, v, dout, causal):
    ref = alibi_attention(q, k, v, causal)

    def loss(q, k, v):
        return jnp.sum(alibi_attention(q, k, v, causal) * dout)

    return (ref,) + jax.grad(loss, (0, 1, 2))(q, k, v)


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_alibi(data, backend, causal):
    q, k, v, dout = data
    ref, dq_r, dk_r, dv_r = _ref(q, k, v, dout, causal)
    mask = MaskArgs(causal=causal, alibi_slopes=SLOPES)

    def loss(q, k, v):
        o, _ = flash_attention(q, k, v, SCALE, mask, backend=backend)
        return jnp.sum(o * dout)

    out, _ = flash_attention(q, k, v, SCALE, mask, backend=backend)
    dq, dk, dv = jax.grad(loss, (0, 1, 2))(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5
    assert jnp.max(jnp.abs(dq - dq_r)) < 1e-4
    assert jnp.max(jnp.abs(dk - dk_r)) < 1e-4
    assert jnp.max(jnp.abs(dv - dv_r)) < 1e-4


@pytest.mark.parametrize("causal", [False, True])
def test_ring_alibi(devices8, data, causal):
    """Ring ALiBi: per-step traced offsets must reproduce the global
    distance matrix exactly."""
    mesh = Mesh(devices8, ("sp",))
    q, k, v, dout = data
    ref, dq_r, dk_r, dv_r = _ref(q, k, v, dout, causal)

    @partial(shard_map, mesh=mesh, in_specs=(SPEC4,) * 3,
             out_specs=(SPEC4, SPEC3), check_vma=False)
    def sharded(q, k, v):
        return ring_attention(
            q, k, v, scale=SCALE, causal=causal, axis_name="sp",
            alibi_slopes=SLOPES,
        )

    out, _ = jax.jit(sharded)(q, k, v)

    def loss(q, k, v):
        o, _ = sharded(q, k, v)
        return jnp.sum(o * dout)

    dq, dk, dv = jax.jit(jax.grad(loss, (0, 1, 2)))(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5
    assert jnp.max(jnp.abs(dq - dq_r)) < 1e-4
    assert jnp.max(jnp.abs(dk - dk_r)) < 1e-4
    assert jnp.max(jnp.abs(dv - dv_r)) < 1e-4


def test_api_alibi(data):
    from ring_flash_attn_tpu.api import flash_attn_func

    q, k, v, dout = data
    ref, *_ = _ref(q, k, v, dout, causal=True)
    out = flash_attn_func(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), causal=True, alibi_slopes=SLOPES,
    )
    assert jnp.max(jnp.abs(out.transpose(0, 2, 1, 3) - ref)) < 2e-5


def test_api_alibi_varlen(data):
    """Varlen ALiBi: distances are within-sequence (positions reset per
    sequence), cross-sequence attention masked."""
    from ring_flash_attn_tpu.api import flash_attn_varlen_func

    q, k, v, dout = data
    cu = jnp.asarray([0, 96, 160, 256], jnp.int32)
    qp = q[0].transpose(1, 0, 2)  # (S, H, D)
    kp = k[0].transpose(1, 0, 2)
    vp = v[0].transpose(1, 0, 2)
    out = flash_attn_varlen_func(
        qp, kp, vp, cu, causal=True, alibi_slopes=SLOPES
    )
    # per-sequence oracle
    for a, b in zip(cu[:-1], cu[1:]):
        ref = alibi_attention(
            q[:, :, a:b], k[:, :, a:b], v[:, :, a:b], causal=True
        )
        got = out[a:b].transpose(1, 0, 2)[None]
        assert jnp.max(jnp.abs(got - ref)) < 2e-5


@pytest.mark.parametrize("kind", ["zigzag", "stripe"])
def test_layout_alibi(devices8, data, kind):
    """Zigzag/stripe ALiBi via the layouts' closed-form global positions."""
    from ring_flash_attn_tpu.parallel import layouts
    from ring_flash_attn_tpu.parallel.stripe import stripe_attention
    from ring_flash_attn_tpu.parallel.zigzag import zigzag_ring_attention

    mesh = Mesh(devices8, ("sp",))
    q, k, v, dout = data
    ref, dq_r, dk_r, dv_r = _ref(q, k, v, dout, causal=True)

    if kind == "zigzag":
        fn = lambda q, k, v: zigzag_ring_attention(
            q, k, v, scale=SCALE, axis_name="sp", alibi_slopes=SLOPES
        )
        tolocal, restore = layouts.all_local_zigzag, layouts.restore_zigzag
    else:
        fn = lambda q, k, v: stripe_attention(
            q, k, v, scale=SCALE, axis_name="sp", alibi_slopes=SLOPES
        )
        tolocal, restore = layouts.all_local_stripe, layouts.restore_stripe

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


def test_ring_varlen_alibi(devices8, data):
    """Varlen ring ALiBi: rotated within-sequence positions give the same
    result as single-device varlen ALiBi."""
    import numpy as np
    from ring_flash_attn_tpu.api import (
        flash_attn_varlen_func,
        ring_flash_attn_varlen_func,
    )
    from ring_flash_attn_tpu.ops import varlen as V

    mesh = Mesh(devices8, ("sp",))
    q, k, v, _ = data
    q1, k1, v1 = (x[0].transpose(1, 0, 2) for x in (q, k, v))
    CU = np.array([0, 96, 160, 256])

    ref = flash_attn_varlen_func(
        q1, k1, v1, jnp.asarray(CU), causal=True, alibi_slopes=SLOPES
    )

    def tolocal(x):
        return jnp.concatenate(
            [jnp.asarray(V.extract_local_ring_varlen(np.asarray(x), CU,
                                                     r, W, axis=0))
             for r in range(W)], axis=0)

    ql, kl, vl = map(tolocal, (q1, k1, v1))
    cu_local = jnp.asarray(CU // W, jnp.int32)

    @partial(shard_map, mesh=mesh, in_specs=(P("sp"),) * 3,
             out_specs=P("sp"), check_vma=False)
    def f(q, k, v):
        return ring_flash_attn_varlen_func(
            q, k, v, cu_local, causal=True, group="sp", alibi_slopes=SLOPES
        )

    out = jax.jit(f)(ql, kl, vl)
    out_g = np.zeros_like(np.asarray(out))
    t_local = 256 // W
    for r in range(W):
        shard = np.asarray(out)[r * t_local:(r + 1) * t_local]
        off = 0
        for i in range(len(CU) - 1):
            li = (CU[i + 1] - CU[i]) // W
            out_g[CU[i] + r * li: CU[i] + (r + 1) * li] = shard[off:off + li]
            off += li
    assert np.max(np.abs(out_g - np.asarray(ref))) < 2e-5
