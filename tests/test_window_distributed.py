"""Sliding-window (SWA) on the distributed batch schedules — an EXTENSION:
the reference merely forwards window_size into its per-step kernels with
local indices (reference ring_flash_attn.py:44-52), which is not globally
consistent; here every step applies the window with true global offsets.
Oracle = banded causal softmax, autodiff gradients.
"""

from functools import partial

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ring_flash_attn_tpu.parallel import layouts
from ring_flash_attn_tpu.parallel.ring import ring_attention
from ring_flash_attn_tpu.parallel.stripe import stripe_attention
from ring_flash_attn_tpu.parallel.zigzag import zigzag_ring_attention

B, HQ, HKV, S, D = 1, 4, 2, 256, 64
SCALE = D**-0.5
WINDOW = 48  # < S/W so even neighbor shards are partially out of window
W = 8
SPEC4 = P(None, None, "sp", None)
SPEC3 = P(None, None, "sp")


def banded_attention(q, k, v):
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, s, d)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qf, k.astype(jnp.float32)) * SCALE
    i = jnp.arange(s)
    dist = i[:, None] - i[None, :]
    allowed = (dist >= 0) & (dist <= WINDOW)
    logits = jnp.where(allowed, logits, -jnp.inf)
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


@pytest.mark.parametrize("kind", ["ring", "zigzag", "stripe"])
def test_window_distributed(devices8, data, kind):
    mesh = Mesh(devices8, ("sp",))
    q, k, v, dout = data
    ref = banded_attention(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(banded_attention(q, k, v) * dout)

    dq_r, dk_r, dv_r = jax.grad(loss_ref, (0, 1, 2))(q, k, v)

    if kind == "ring":
        fn = lambda q, k, v: ring_attention(
            q, k, v, scale=SCALE, causal=True, axis_name="sp",
            window_left=WINDOW,
        )
        tolocal = restore = lambda x, w, axis: x
    elif kind == "zigzag":
        fn = lambda q, k, v: zigzag_ring_attention(
            q, k, v, scale=SCALE, axis_name="sp", window_left=WINDOW
        )
        tolocal, restore = layouts.all_local_zigzag, layouts.restore_zigzag
    else:
        fn = lambda q, k, v: stripe_attention(
            q, k, v, scale=SCALE, axis_name="sp", window_left=WINDOW
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


def bidir_banded_attention(q, k, v, wl, wr):
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, s, d)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qf, k.astype(jnp.float32)) * SCALE
    i = jnp.arange(s)
    dist = i[:, None] - i[None, :]
    allowed = jnp.ones((s, s), bool)
    if wl is not None:
        allowed &= dist <= wl
    if wr is not None:
        allowed &= -dist <= wr
    logits = jnp.where(allowed, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", p, v.astype(jnp.float32))
    return out.reshape(b, hq, s, d)


@pytest.mark.parametrize("wl,wr", [(48, 20), (48, None), (None, 20)])
def test_bidirectional_window_ring(devices8, data, wl, wr):
    """Non-causal (left, right) windows on the distributed ring (r5): the
    reference forwards arbitrary window_size on its batch paths
    (reference ring_flash_attn.py:44-52); here each ring step applies the
    window with true global offsets and prunes fully-out-of-window shards
    with a rank-traced cond."""
    mesh = Mesh(devices8, ("sp",))
    q, k, v, dout = data
    ref = bidir_banded_attention(q, k, v, wl, wr)

    def loss_ref(q, k, v):
        return jnp.sum(bidir_banded_attention(q, k, v, wl, wr) * dout)

    dq_r, dk_r, dv_r = jax.grad(loss_ref, (0, 1, 2))(q, k, v)

    @partial(shard_map, mesh=mesh, in_specs=(SPEC4,) * 3,
             out_specs=(SPEC4, SPEC3), check_vma=False)
    def sharded(q, k, v):
        return ring_attention(
            q, k, v, scale=SCALE, causal=False, axis_name="sp",
            window_left=wl, window_right=wr,
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


def test_bidirectional_window_api(devices8, data):
    import ring_flash_attn_tpu as rfa

    mesh = Mesh(devices8, ("sp",))
    q, k, v, _ = data
    ref = bidir_banded_attention(q, k, v, 48, 20)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, "sp"),) * 3, out_specs=P(None, "sp"),
             check_vma=False)
    def f(q, k, v):
        return rfa.ring_flash_attn_func(
            q, k, v, causal=False, window_size=(48, 20), group="sp"
        )

    out = jax.jit(f)(*(jnp.swapaxes(x, 1, 2) for x in (q, k, v)))
    assert jnp.max(jnp.abs(jnp.swapaxes(out, 1, 2) - ref)) < 2e-5


def test_window_api(devices8, data):
    import ring_flash_attn_tpu as rfa

    mesh = Mesh(devices8, ("sp",))
    q, k, v, _ = data
    ref = banded_attention(q, k, v)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, "sp"),) * 3, out_specs=P(None, "sp"),
             check_vma=False)
    def f(q, k, v):
        return rfa.ring_flash_attn_func(
            q, k, v, causal=True, window_size=(WINDOW, 0), group="sp"
        )

    out = jax.jit(f)(*(jnp.swapaxes(x, 1, 2) for x in (q, k, v)))
    assert jnp.max(jnp.abs(jnp.swapaxes(out, 1, 2) - ref)) < 2e-5
