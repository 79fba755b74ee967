"""Flagship-model tests: sharded forward parity + training-step sanity."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ring_flash_attn_tpu.models import (
    ModelConfig,
    forward,
    init_params,
    prepare_zigzag_batch,
    train_step,
)
from ring_flash_attn_tpu.parallel import layouts

SP = 4
CFG = ModelConfig(
    vocab=128, dim=64, layers=2, heads=4, kv_heads=2, head_dim=16,
    mlp_dim=128, attention="zigzag", dtype="float32",
)
S = 64


@pytest.fixture(scope="module")
def mesh(devices8):
    return Mesh(np.array(devices8).reshape(2, SP), ("dp", "sp"))


def test_sharded_forward_matches_single_device(mesh):
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (1, S), 0, CFG.vocab, jnp.int32
    )
    # single device
    logits_ref = forward(
        params, CFG, tokens, jnp.arange(S, dtype=jnp.int32), axis_name=None
    )

    t_l = layouts.all_local_zigzag(tokens, SP, axis=1)
    pos = jnp.concatenate(
        [jnp.asarray(layouts.zigzag_position_ids(r, SP, S // SP))
         for r in range(SP)]
    )

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, "sp"), P("sp")),
             out_specs=P(None, "sp"), check_vma=False)
    def f(params, tokens, pos):
        return forward(params, CFG, tokens, pos, axis_name="sp")

    logits = jax.jit(f)(params, t_l, pos)
    logits = layouts.restore_zigzag(logits, SP, axis=1)
    assert jnp.max(jnp.abs(logits - logits_ref)) < 1e-3


def test_train_step_reduces_loss(mesh):
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (2, S), 0, CFG.vocab, jnp.int32
    )
    t_l, l_l, pos = prepare_zigzag_batch(tokens, SP)

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P("dp", "sp"), P("dp", "sp"), P("sp")),
             out_specs=(P(), P()), check_vma=False)
    def step(params, tokens, labels, positions):
        return train_step(
            params, CFG, tokens, labels, positions, lr=5e-2,
            axis_name="sp", data_axis="dp",
        )

    losses = []
    for _ in range(8):
        params, loss = step(params, t_l, l_l, pos)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.3, losses


def test_usp_forward_matches_single_device(devices8):
    """USP (dp-free 2-D: hp x sp) sharded forward == single-device forward
    on the contiguous layout."""
    mesh3 = Mesh(np.array(devices8).reshape(2, 4), ("hp", "sp"))
    cfg = ModelConfig(
        vocab=128, dim=64, layers=2, heads=4, kv_heads=2, head_dim=16,
        mlp_dim=128, attention="usp", dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (1, S), 0, cfg.vocab, jnp.int32
    )
    pos = jnp.arange(S, dtype=jnp.int32)
    logits_ref = forward(params, cfg, tokens, pos, axis_name=None)

    @partial(
        shard_map, mesh=mesh3,
        in_specs=(P(), P(None, ("sp", "hp")), P(("sp", "hp"))),
        out_specs=P(None, ("sp", "hp")), check_vma=False,
    )
    def f(params, tokens, pos):
        return forward(params, cfg, tokens, pos, axis_name="sp",
                       ulysses_axis="hp")

    logits = jax.jit(f)(params, tokens, pos)
    assert jnp.max(jnp.abs(logits - logits_ref)) < 2e-4
