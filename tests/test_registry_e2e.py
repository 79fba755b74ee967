"""Registry end-to-end realism (VERDICT r2 #8): a small NNX llama-style
block holds `RingAttentionLayer` as a submodule, selects the impl by config
string through `get_attention`, and trains one step on the CPU mesh with
packed varlen data — proving the registry contract composes with a real
module tree (params + optimizer + shard_map), not just nnx.split/merge."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

try:
    from flax import nnx
except ImportError:  # pragma: no cover
    nnx = None

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ring_flash_attn_tpu.adapters.registry import RingAttentionLayer
from ring_flash_attn_tpu.ops.varlen import zigzag_varlen_info

WORLD = 4
B, S_LOCAL, E, H, HKV, DH = 1, 64, 64, 4, 2, 16
S = S_LOCAL * WORLD


@pytest.mark.skipif(nnx is None, reason="flax.nnx unavailable")
def test_nnx_block_trains_through_registry():
    mesh = Mesh(np.array(jax.devices()[:WORLD]), ("sp",))

    class LlamaBlock(nnx.Module):
        """Pre-norm attention block, llama-shaped (RMSNorm + GQA attention
        + gated MLP), attention chosen by registry config string."""

        def __init__(self, impl, rngs):
            self.norm1 = nnx.RMSNorm(E, rngs=rngs)
            self.norm2 = nnx.RMSNorm(E, rngs=rngs)
            self.wq = nnx.Linear(E, H * DH, use_bias=False, rngs=rngs)
            self.wk = nnx.Linear(E, HKV * DH, use_bias=False, rngs=rngs)
            self.wv = nnx.Linear(E, HKV * DH, use_bias=False, rngs=rngs)
            self.wo = nnx.Linear(H * DH, E, use_bias=False, rngs=rngs)
            self.w_gate = nnx.Linear(E, 4 * E, use_bias=False, rngs=rngs)
            self.w_up = nnx.Linear(E, 4 * E, use_bias=False, rngs=rngs)
            self.w_down = nnx.Linear(4 * E, E, use_bias=False, rngs=rngs)
            # static (array-free) submodule: NNX treats it as graph metadata
            self.attn = RingAttentionLayer(impl, axis_name="sp")

        def __call__(self, x, seg, pos):
            h = self.norm1(x)
            q = self.wq(h).reshape(B, S, H, DH)
            k = self.wk(h).reshape(B, S, HKV, DH)
            v = self.wv(h).reshape(B, S, HKV, DH)

            @partial(
                shard_map, mesh=mesh,
                in_specs=(P(None, "sp"),) * 3 + (P("sp"), P("sp")),
                out_specs=P(None, "sp"), check_vma=False,
            )
            def sharded_attn(q_, k_, v_, s_, p_):
                return self.attn(q_, k_, v_, segment_ids=s_, positions=p_)

            o = sharded_attn(q, k, v, seg, pos).reshape(B, S, H * DH)
            x = x + self.wo(o)
            h = self.norm2(x)
            return x + self.w_down(jax.nn.silu(self.w_gate(h)) * self.w_up(h))

    # packed varlen data in the grouped zigzag layout
    cu_half = jnp.asarray([0, S_LOCAL // 4, S_LOCAL // 2], jnp.int32)
    seg, pos = [], []
    for r in range(WORLD):
        s_, p_ = zigzag_varlen_info(cu_half, S_LOCAL, r, WORLD)
        seg.append(s_)
        pos.append(p_)
    seg_all, pos_all = jnp.concatenate(seg), jnp.concatenate(pos)

    model = LlamaBlock("zigzag_varlen", nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, E), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (B, S, E), jnp.float32)

    graphdef, state = nnx.split(model)

    @jax.jit
    def train_step(state, x, y):
        def loss_fn(state):
            m = nnx.merge(graphdef, state)
            out = m(x, seg_all, pos_all)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state)
        new_state = jax.tree.map(lambda p, g: p - 1e-2 * g, state, grads)
        return new_state, loss

    with mesh:
        state1, loss1 = train_step(state, x, y)
        state2, loss2 = train_step(state1, x, y)

    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # it actually learns
    # params actually moved
    p0 = jax.tree.leaves(state)[0]
    p1 = jax.tree.leaves(state1)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    # impl swap by config string through the same module tree
    model_ring = LlamaBlock("ring_varlen", nnx.Rngs(0))
    gd_r, st_r = nnx.split(model_ring)
    del gd_r, st_r  # construction + split must simply work
