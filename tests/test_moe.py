"""Expert-parallel MoE tests: the ep-sharded switch block matches the
unsharded computation exactly (capacity high enough that nothing drops),
and gradients flow (all_to_all transposes exactly)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ring_flash_attn_tpu.models.moe import init_moe_layer, moe_mlp

B, S, D, MLP, E, EP = 2, 16, 32, 64, 4, 2


@pytest.fixture(scope="module")
def data():
    layer = init_moe_layer(jax.random.PRNGKey(0), D, MLP, E, jnp.float32)
    norm = jnp.ones((D,), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (EP * B, S, D), jnp.float32)
    dout = jax.random.normal(jax.random.PRNGKey(2), (EP * B, S, D),
                             jnp.float32)
    return layer, norm, x, dout


def test_ep_matches_unsharded(devices8, data):
    layer, norm, x, dout = data
    cap = B * S  # no drops

    ref = moe_mlp(x, layer, norm, cap)

    def loss_ref(layer, x):
        return jnp.sum(moe_mlp(x, layer, norm, cap) * dout)

    gl_ref, gx_ref = jax.grad(loss_ref, (0, 1))(layer, x)

    mesh = Mesh(np.array(devices8[:EP]), ("ep",))
    specs = {
        "router": P(),
        "we_gate": P("ep"), "we_up": P("ep"), "we_down": P("ep"),
    }

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, P("ep"),), out_specs=P("ep"),
             check_vma=False)
    def f(layer, x):
        return moe_mlp(x, layer, norm, cap, ep_axis="ep")

    out = jax.jit(f)(layer, x)
    assert jnp.max(jnp.abs(out - ref)) < 1e-5

    @partial(shard_map, mesh=mesh, in_specs=(specs, P("ep"), P("ep")),
             out_specs=(specs, P("ep")), check_vma=False)
    def grads(layer, x, dout):
        from jax import lax

        def loss(layer, x):
            return jnp.sum(moe_mlp(x, layer, norm, cap, ep_axis="ep") * dout)

        gl, gx = jax.grad(loss, (0, 1))(layer, x)
        # router is replicated: its per-shard grad covers local tokens only
        gl = dict(gl, router=lax.psum(gl["router"], "ep"))
        return gl, gx

    gl, gx = jax.jit(grads)(layer, x, dout)
    assert jnp.max(jnp.abs(gx - gx_ref)) < 1e-4
    for k in gl_ref:
        assert jnp.max(jnp.abs(gl[k] - gl_ref[k])) < 1e-4, k


def test_capacity_drops_are_benign(data):
    """With a tiny capacity, overflowing tokens pass through the residual
    (MoE contribution zero) — no NaNs, output finite, differs from the
    full-capacity result."""
    layer, norm, x, _ = data
    full = moe_mlp(x, layer, norm, B * S)
    tight = moe_mlp(x, layer, norm, 2)
    assert jnp.all(jnp.isfinite(tight))
    assert jnp.max(jnp.abs(full - tight)) > 1e-4


def test_moe_transformer_train_matches_unsharded(devices8):
    """Full MoE-transformer train step on an ep x sp mesh == the unsharded
    computation (capacity ample, so routing is drop-free)."""
    from ring_flash_attn_tpu.models import (
        ModelConfig, init_params, prepare_zigzag_batch, train_step,
    )

    cfg = ModelConfig(
        vocab=128, dim=32, layers=2, heads=4, kv_heads=2, head_dim=8,
        mlp_dim=64, attention="zigzag", dtype="float32",
        moe_experts=4, moe_capacity_factor=8.0,  # drop-free
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    S_, EP_ = 32, 2
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (EP_, S_), 0, cfg.vocab, jnp.int32
    )
    t_l, l_l, pos = prepare_zigzag_batch(tokens, 4)

    # unsharded reference (single shard_map over sp only, batch whole)
    mesh_sp = Mesh(np.array(devices8[:4]), ("sp",))

    @partial(shard_map, mesh=mesh_sp,
             in_specs=(P(), P(None, "sp"), P(None, "sp"), P("sp")),
             out_specs=(P(), P()), check_vma=False)
    def step_ref(params, t, l, pos):
        from ring_flash_attn_tpu.models import train_step as ts
        return ts(params, cfg, t, l, pos, lr=1e-2, axis_name="sp")

    ref_params, ref_loss = jax.jit(step_ref)(params, t_l, l_l, pos)

    mesh = Mesh(np.array(devices8).reshape(2, 4), ("ep", "sp"))
    moe_specs = {
        "router": P(), "we_gate": P("ep"), "we_up": P("ep"),
        "we_down": P("ep"),
    }
    layer_specs = {
        "attn_norm": P(), "wq": P(), "wk": P(), "wv": P(), "wo": P(),
        "mlp_norm": P(), "moe": moe_specs,
    }
    specs = {"embed": P(), "layers": [dict(layer_specs) for _ in range(2)],
             "final_norm": P(), "lm_head": P()}

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, P("ep", "sp"), P("ep", "sp"), P("sp")),
             out_specs=(specs, P()), check_vma=False)
    def step_ep(params, t, l, pos):
        return train_step(params, cfg, t, l, pos, lr=1e-2,
                          axis_name="sp", ep_axis="ep")

    ep_params, ep_loss = jax.jit(step_ep)(params, t_l, l_l, pos)
    assert abs(float(ep_loss) - float(ref_loss)) < 1e-5, (
        float(ep_loss), float(ref_loss),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        ep_params, ref_params,
    )
