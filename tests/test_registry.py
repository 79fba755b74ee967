"""Attention registry (the framework-agnostic L5 surface): every registered
impl matches the dense oracle through the uniform (B, S, H, D) contract,
and the NNX layer wrapper works inside a flax NNX module."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import ring_flash_attn_tpu as rfa
from ring_flash_attn_tpu.adapters import registry as R
from ring_flash_attn_tpu.parallel import layouts
from ring_flash_attn_tpu.ops import varlen as V

from oracle import full_attention

W = 8
B, HQ, HKV, S, D = 1, 4, 2, 256, 32
SCALE = D**-0.5


@pytest.fixture(scope="module")
def data():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, HQ, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, HKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, HKV, D), jnp.float32)
    return q, k, v


def _ref(q, k, v, **kw):
    o = full_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        SCALE, **kw,
    )
    return jnp.swapaxes(o, 1, 2)


def test_flash_impl(data):
    q, k, v = data
    out = R.get_attention("flash")(q, k, v, causal=True)
    assert jnp.max(jnp.abs(out - _ref(q, k, v, causal=True))) < 2e-5


@pytest.mark.parametrize("impl", ["ring", "zigzag", "stripe", "llama3",
                                  "ulysses", "fused_ring"])
def test_batch_impls_vs_oracle(devices8, data, impl):
    # ulysses shards heads over the axis: use a 4-device mesh (HQ = 4)
    w = 4 if impl == "ulysses" else W
    mesh = Mesh(devices8[:w] if w != W else devices8, ("sp",))
    q, k, v = data
    ref = _ref(q, k, v, causal=True)

    tolocal = {
        "zigzag": layouts.all_local_zigzag,
        "stripe": layouts.all_local_stripe,
    }.get(impl)
    restore = {
        "zigzag": layouts.restore_zigzag,
        "stripe": layouts.restore_stripe,
    }.get(impl)
    kw = dict(axis_name="sp", causal=True)
    if impl == "fused_ring":
        kw["interpret"] = True

    if tolocal is not None:
        q_, k_, v_ = (
            jnp.swapaxes(tolocal(jnp.swapaxes(x, 1, 2), w, axis=2), 1, 2)
            for x in (q, k, v)
        )
    else:
        q_, k_, v_ = q, k, v

    @partial(shard_map, mesh=mesh, in_specs=(P(None, "sp"),) * 3,
             out_specs=P(None, "sp"), check_vma=False)
    def f(q, k, v):
        return R.get_attention(impl)(q, k, v, **kw)

    out = jax.jit(f)(q_, k_, v_)
    if restore is not None:
        out = jnp.swapaxes(
            restore(jnp.swapaxes(out, 1, 2), w, axis=2), 1, 2
        )
    assert jnp.max(jnp.abs(out - ref)) < 2e-5, impl


def test_varlen_impl(devices8, data):
    mesh = Mesh(devices8, ("sp",))
    q, k, v = data
    cu = np.array([0, 96, S])
    segids = jnp.asarray(
        np.searchsorted(cu, np.arange(S), side="right") - 1, jnp.int32
    )
    ref = _ref(q, k, v, causal=True, segids=segids)

    t_local = S // W
    cu_local = jnp.asarray(cu // W, jnp.int32)
    seg, pos = [], []
    for r in range(W):
        s_, p_ = V.ring_varlen_info(cu_local, t_local, r)
        seg.append(s_)
        pos.append(p_)
    seg, pos = jnp.concatenate(seg), jnp.concatenate(pos)

    def tol(x):
        return jnp.swapaxes(jnp.concatenate(
            [jnp.asarray(V.extract_local_ring_varlen(
                np.asarray(jnp.swapaxes(x, 1, 2)), cu, r, W, axis=2))
             for r in range(W)], axis=2), 1, 2)

    ql, kl, vl = map(tol, (q, k, v))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, "sp"),) * 3 + (P("sp"), P("sp")),
             out_specs=P(None, "sp"), check_vma=False)
    def f(q, k, v, seg, pos):
        return R.get_attention("ring_varlen")(
            q, k, v, axis_name="sp", causal=True,
            segment_ids=seg, positions=pos,
        )

    out = jax.jit(f)(ql, kl, vl, seg, pos)
    # restore ring layout
    outg = np.zeros_like(np.asarray(out))
    for r in range(W):
        shard = np.asarray(out)[:, r * t_local:(r + 1) * t_local]
        off = 0
        for i in range(len(cu) - 1):
            li = (cu[i + 1] - cu[i]) // W
            outg[:, cu[i] + r * li: cu[i] + (r + 1) * li] = (
                shard[:, off:off + li]
            )
            off += li
    assert jnp.max(jnp.abs(jnp.asarray(outg) - ref)) < 2e-5


def test_register_and_errors():
    with pytest.raises(KeyError):
        R.get_attention("nope")
    R.register_attention("custom_test", lambda q, k, v, **kw: q)
    assert "custom_test" in R.list_attention()
    with pytest.raises(ValueError):
        R.register_attention("custom_test", lambda q, k, v, **kw: q)
    assert "zigzag" in rfa.list_attention()


def test_nnx_module(devices8, data):
    """RingAttentionLayer inside a flax NNX module: the layer is static
    (no arrays), so nnx.split/merge round-trips it untouched."""
    from flax import nnx

    mesh = Mesh(devices8, ("sp",))
    q, k, v = data
    ref = _ref(q, k, v, causal=True)

    class Block(nnx.Module):
        def __init__(self):
            self.attn = rfa.RingAttentionLayer("ring", axis_name="sp")

        def __call__(self, q, k, v):
            return self.attn(q, k, v)

    block = Block()
    graphdef, state = nnx.split(block)
    block2 = nnx.merge(graphdef, state)

    @partial(shard_map, mesh=mesh, in_specs=(P(None, "sp"),) * 3,
             out_specs=P(None, "sp"), check_vma=False)
    def f(q, k, v):
        return block2(q, k, v)

    out = jax.jit(f)(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5
