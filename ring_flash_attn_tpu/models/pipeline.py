"""Pipeline parallelism (GPipe schedule) for the flagship model.

An extension beyond the reference's scope (it ships no model stack at all):
layers are stacked into per-stage arrays and sharded over a `pp` mesh axis;
microbatches flow stage -> stage+1 through `lax.ppermute` on the skewed
GPipe schedule (tick t: stage s works on microbatch t - s, so the pipeline
fills and drains in M + P - 1 ticks instead of M*P). Differentiation is
left to JAX: the backward of the scanned ppermute pipeline is the reverse
pipeline (ppermute transposes exactly), so no hand-written schedule is
needed — the same property the ring schedules exploit.

Composes with the sequence axes: each stage's layer body is the standard
`_attention` + `_mlp`, so a (pp, sp) mesh runs pipeline stages of
ring-attention layers. Embedding runs on stage 0; final norm + lm_head +
loss on the last stage (their grads are psum'd over pp in
`train_step_pp`; the stacked per-stage weights' grads stay stage-local).
"""

import jax
import jax.numpy as jnp
from jax import lax

from .transformer import ModelConfig, _attention, _mlp, _rmsnorm
from ..parallel.mesh import psum_exact, ring_rank, ring_size


def stack_layers(params, pp):
    """Stack the per-layer pytrees into (L, ...) arrays for pp sharding.

    Returns a params pytree where params['layers'] is a single dict of
    stacked arrays; shard dim 0 over the pp axis (L % pp == 0)."""
    layers = params["layers"]
    assert len(layers) % pp == 0, (len(layers), pp)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return dict(params, layers=stacked)


def pipeline_specs(cfg, pp_axis):
    """PartitionSpec pytree for stack_layers output: stage dim over pp."""
    from jax.sharding import PartitionSpec as P

    rep = P()
    stage = {
        k: P(pp_axis) for k in (
            "attn_norm", "wq", "wk", "wv", "wo",
            "mlp_norm", "w_gate", "w_up", "w_down",
        )
    }
    return {"embed": rep, "layers": stage, "final_norm": rep,
            "lm_head": rep}


def _stage_body(cfg, stage_layers, x, positions, axis_name):
    """Apply this stage's local layers (scan over the stacked dim)."""

    def one(x, layer):
        x = _attention(cfg, x, layer, positions, axis_name)
        x = _mlp(x, layer)
        return x, None

    x, _ = lax.scan(one, x, stage_layers)
    return x


def forward_pp(params, cfg: ModelConfig, tokens, positions, pp_axis,
               microbatches, axis_name=None):
    """Pipelined forward. tokens (M*B_mb, S_local); params from
    stack_layers (per-stage shard inside shard_map). Returns logits
    (M*B_mb, S_local, vocab) — valid on the LAST stage (replicated zeros
    elsewhere are NOT materialized; consume via loss_fn_pp).
    """
    pp = ring_size(pp_axis)
    stage = ring_rank(pp_axis)
    m = microbatches
    bmb = tokens.shape[0] // m
    s = tokens.shape[1]
    d = cfg.dim

    xs = params["embed"][tokens.reshape(m, bmb, s)]  # (M, B_mb, S, D)
    # non-first stages ignore their embedding output; the pipeline carries
    # activations in
    ticks = m + pp - 1

    def tick(carry, t):
        outs, hold = carry
        # inject: stage 0 picks up microbatch t (when t < M)
        mb_in = jnp.clip(t, 0, m - 1)
        x = jnp.where(stage == 0, xs[mb_in], hold)
        # Every stage executes the body EVERY tick and selects afterwards
        # (standard SPMD masked pipelining): the body contains sequence-
        # axis collectives, which may not sit under control flow whose
        # predicate varies across pp stages — pipeline bubbles do dummy
        # compute instead.
        y_body = _stage_body(cfg, params["layers"], x, positions, axis_name)
        live = jnp.logical_and(t - stage >= 0, t - stage < m)
        y = jnp.where(live, y_body, x)
        # the last stage banks its finished microbatch t - (pp-1)
        mb_out = jnp.clip(t - (pp - 1), 0, m - 1)
        done = jnp.logical_and(stage == pp - 1, t - (pp - 1) >= 0)
        banked = lax.dynamic_update_index_in_dim(outs, y, mb_out, 0)
        outs = jnp.where(done, banked, outs)
        # hand y to the next stage (the wrap to stage 0 is overwritten by
        # the injection there)
        hold = lax.ppermute(
            y, pp_axis, [(i, (i + 1) % pp) for i in range(pp)]
        )
        return (outs, hold), None

    outs0 = jnp.zeros((m, bmb, s, d), xs.dtype)
    hold0 = jnp.zeros((bmb, s, d), xs.dtype)
    (outs, _), _ = lax.scan(tick, (outs0, hold0), jnp.arange(ticks))

    x = outs.reshape(m * bmb, s, d)
    x = _rmsnorm(x, params["final_norm"])
    return (x @ params["lm_head"]).astype(jnp.float32)


def loss_fn_pp(params, cfg, tokens, labels, positions, pp_axis,
               microbatches, axis_name=None):
    """Mean next-token CE of the pipelined forward. Only the last stage
    holds real logits; the loss is computed there and broadcast (exact
    transpose) so every stage returns the same scalar."""
    pp = ring_size(pp_axis)
    stage = ring_rank(pp_axis)
    logits = forward_pp(params, cfg, tokens, positions, pp_axis,
                        microbatches, axis_name)
    valid = labels >= 0
    labels_safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    loss_sum = jnp.sum(jnp.where(valid, -tok_lp, 0.0))
    count = jnp.sum(valid)
    # only the last stage's numbers are real
    loss_sum = jnp.where(stage == pp - 1, loss_sum, 0.0)
    count = jnp.where(stage == pp - 1, count, 0)
    axes = (pp_axis,) + ((axis_name,) if axis_name else ())
    loss_sum = psum_exact(loss_sum, axes)
    count = lax.psum(count, axes)
    return loss_sum / jnp.maximum(count, 1)


def train_step_pp(params, cfg, tokens, labels, positions, pp_axis,
                  microbatches, lr=1e-3, axis_name=None, data_axis=None):
    """One SGD step of the pipelined model (call inside shard_map).

    Stacked per-stage weights' grads are stage-local; the replicated
    embed / final_norm / lm_head (used on one stage each) get the pp psum
    so all stages apply the same update."""
    loss, grads = jax.value_and_grad(loss_fn_pp)(
        params, cfg, tokens, labels, positions, pp_axis, microbatches,
        axis_name,
    )
    seq_axes = tuple(a for a in (axis_name, data_axis) if a is not None)

    def reduce(path, g):
        leaf = getattr(path[0], "key", None)
        axes = seq_axes + ((pp_axis,) if leaf != "layers" else ())
        return lax.psum(g, axes) if axes else g

    grads = jax.tree_util.tree_map_with_path(reduce, grads)
    if data_axis:
        loss = lax.pmean(loss, data_axis)
    new_params = jax.tree.map(
        lambda p, g: (
            p.astype(jnp.float32) - lr * g.astype(jnp.float32)
        ).astype(p.dtype),
        params,
        grads,
    )
    return new_params, loss
