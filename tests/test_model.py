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


def test_tp_forward_matches_single_device(devices8):
    """Megatron TP (tp x sp) sharded-weight forward == single-device."""
    from ring_flash_attn_tpu.models import param_specs

    mesh = Mesh(np.array(devices8).reshape(2, 4), ("tp", "sp"))
    cfg = ModelConfig(
        vocab=128, dim=64, layers=2, heads=4, kv_heads=2, head_dim=16,
        mlp_dim=128, attention="zigzag", dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (1, S), 0, cfg.vocab, jnp.int32
    )
    t_l, l_l, pos = prepare_zigzag_batch(tokens, 4)
    # single-device oracle on the full sequence; compare after restoring
    # the zigzag layout
    pos_full = jnp.arange(S, dtype=jnp.int32)
    ref_full = forward(params, cfg, tokens, pos_full, axis_name=None)

    specs = param_specs(cfg, "tp")

    @partial(
        shard_map, mesh=mesh,
        in_specs=(specs, P(None, "sp"), P("sp")),
        out_specs=P(None, "sp"), check_vma=False,
    )
    def f(params, tokens, pos):
        return forward(params, cfg, tokens, pos, axis_name="sp",
                       tp_axis="tp")

    logits = jax.jit(f)(params, t_l, pos)
    restored = layouts.restore_zigzag(logits, 4, axis=1)
    assert jnp.max(jnp.abs(restored - ref_full)) < 2e-4


def test_tp_train_step_matches_replicated(devices8):
    """One TP train step produces the same updated weights as the
    non-TP (replicated) train step — grads of sharded weights stay local,
    grads of replicated weights get the tp psum."""
    from ring_flash_attn_tpu.models import param_specs

    mesh = Mesh(np.array(devices8).reshape(2, 4), ("tp", "sp"))
    cfg = ModelConfig(
        vocab=128, dim=64, layers=2, heads=4, kv_heads=2, head_dim=16,
        mlp_dim=128, attention="zigzag", dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (1, S), 0, cfg.vocab, jnp.int32
    )
    t_l, l_l, pos = prepare_zigzag_batch(tokens, 4)

    # reference: sp-only mesh, replicated weights
    mesh_sp = Mesh(np.array(devices8[:4]), ("sp",))

    @partial(
        shard_map, mesh=mesh_sp,
        in_specs=(P(), P(None, "sp"), P(None, "sp"), P("sp")),
        out_specs=(P(), P()), check_vma=False,
    )
    def step_ref(params, tokens, labels, pos):
        return train_step(params, cfg, tokens, labels, pos, lr=1e-2,
                          axis_name="sp")

    ref_params, ref_loss = jax.jit(step_ref)(params, t_l, l_l, pos)

    specs = param_specs(cfg, "tp")

    @partial(
        shard_map, mesh=mesh,
        in_specs=(specs, P(None, "sp"), P(None, "sp"), P("sp")),
        out_specs=(specs, P()), check_vma=False,
    )
    def step_tp(params, tokens, labels, pos):
        return train_step(params, cfg, tokens, labels, pos, lr=1e-2,
                          axis_name="sp", tp_axis="tp")

    tp_params, tp_loss = jax.jit(step_tp)(params, t_l, l_l, pos)
    assert abs(float(tp_loss) - float(ref_loss)) < 1e-5
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        tp_params, ref_params,
    )


def test_pipeline_forward_and_train_match(devices8):
    """GPipe pipeline (pp x sp): forward logits and one train step match
    the single-device / replicated computation."""
    from ring_flash_attn_tpu.models.pipeline import (
        pipeline_specs,
        stack_layers,
        train_step_pp,
    )

    mesh = Mesh(np.array(devices8).reshape(2, 4), ("pp", "sp"))
    cfg = ModelConfig(
        vocab=128, dim=64, layers=4, heads=4, kv_heads=2, head_dim=16,
        mlp_dim=128, attention="zigzag", dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    M, BMB = 2, 2  # 2 microbatches of 2 sequences
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (M * BMB, S), 0, cfg.vocab, jnp.int32
    )
    t_l, l_l, pos = prepare_zigzag_batch(tokens, 4)

    # reference: plain train step on the sp-only mesh; parity is checked
    # through the loss and the updated weights (only the last pp stage
    # holds real logits, so a direct forward comparison needs a gather —
    # train_step_pp exercises forward_pp end to end anyway)
    mesh_sp = Mesh(np.array(devices8[:4]), ("sp",))
    stacked = stack_layers(params, 2)
    specs = pipeline_specs(cfg, "pp")

    @partial(shard_map, mesh=mesh_sp,
             in_specs=(P(), P(None, "sp"), P(None, "sp"), P("sp")),
             out_specs=(P(), P()), check_vma=False)
    def step_ref(params, tokens, labels, pos):
        return train_step(params, cfg, tokens, labels, pos, lr=1e-2,
                          axis_name="sp")

    ref_params, ref_loss = jax.jit(step_ref)(params, t_l, l_l, pos)

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, P(None, "sp"), P(None, "sp"), P("sp")),
             out_specs=(specs, P()), check_vma=False)
    def step_pp(params, tokens, labels, pos):
        return train_step_pp(params, cfg, tokens, labels, pos, "pp", M,
                             lr=1e-2, axis_name="sp")

    pp_params, pp_loss = jax.jit(step_pp)(stacked, t_l, l_l, pos)
    assert abs(float(pp_loss) - float(ref_loss)) < 1e-5, (
        float(pp_loss), float(ref_loss),
    )
    # updated stacked weights == stacked updated reference weights
    ref_stacked = stack_layers(ref_params, 2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        pp_params, ref_stacked,
    )
