"""Checkpoint/resume: save mid-training, restore, and continue — losses
must match a run that never stopped (exactness matters for the
deterministic-dropout seed schedule). An aux subsystem the reference lacks
(SURVEY.md §5: 'Checkpoint/resume: none')."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ring_flash_attn_tpu.models import (
    ModelConfig,
    init_params,
    train_step,
)
from ring_flash_attn_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)

pytest.importorskip("orbax.checkpoint")

CFG = ModelConfig(
    vocab=64, dim=32, layers=1, heads=2, kv_heads=1, head_dim=16,
    mlp_dim=64, attention="zigzag", dtype="float32",
)


def _batch(key, s=32):
    tokens = jax.random.randint(key, (1, s + 1), 0, CFG.vocab, jnp.int32)
    return (tokens[:, :-1], tokens[:, 1:],
            jnp.arange(s, dtype=jnp.int32))


def test_save_restore_resume_exact():
    params = init_params(jax.random.PRNGKey(0), CFG)

    def run(params, steps, start=0):
        losses = []
        for i in range(start, start + steps):
            t, l, pos = _batch(jax.random.PRNGKey(100 + i))
            params, loss = train_step(params, CFG, t, l, pos, lr=1e-2)
            losses.append(float(loss))
        return params, losses

    # uninterrupted run: 4 steps
    p_full, losses_full = run(params, 4)

    # interrupted: 2 steps, checkpoint, restore, 2 more
    p_half, losses_a = run(params, 2)
    with tempfile.TemporaryDirectory() as d:
        path = d + "/ckpt"
        save_checkpoint(path, p_half, step=2, metadata={"note": "mid"})
        restored, step, meta = restore_checkpoint(path)
        assert step == 2
        assert meta["note"] == "mid"
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            restored, p_half,
        )
        _, losses_b = run(restored, 2, start=2)

    assert np.allclose(losses_a + losses_b, losses_full, atol=1e-6), (
        losses_a + losses_b, losses_full,
    )


def test_sharded_restore_keeps_metadata(devices8):
    """The abstract_state (sharded-template) restore path must return the
    saved step and user metadata (regression: a template restore used to
    drop them)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ring_flash_attn_tpu.utils.checkpoint import abstract_like

    params = init_params(jax.random.PRNGKey(0), CFG)
    mesh = Mesh(np.array(devices8), ("x",))
    sharding = NamedSharding(mesh, P())
    with tempfile.TemporaryDirectory() as d:
        path = d + "/ckpt"
        save_checkpoint(path, params, step=7,
                        metadata={"seed": 42, "data_pos": 1234})
        restored, step, meta = restore_checkpoint(
            path, abstract_like(params, sharding)
        )
        assert step == 7
        assert meta == {"seed": 42, "data_pos": 1234}
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            restored, params,
        )
