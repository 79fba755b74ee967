"""Flagship model: a llama-style decoder trained with ring attention.

The reference integrates with models by monkeypatching HF transformers
(reference adapters/hf_adapter.py); the TPU-native framework additionally
ships its own SPMD llama-family stack so long-context training works end to
end without external model code: RMSNorm + rotary (layout-aware position
ids) + GQA attention through any of the context-parallel schedules + SwiGLU
MLP, as pure-JAX pytrees designed for shard_map over a ('dp','sp') mesh —
batch over dp, sequence over sp, weights replicated (psum'd grads).

The per-shard forward runs INSIDE shard_map: attention calls the per-shard
schedule directly, everything else is local math, so the only collectives
are the schedule's ppermute/all-gather plus the gradient psum.

Tensor parallelism (megatron-style, an extension beyond the reference's
scope): pass tp_axis and shard the weights with `param_specs` — wq/wk/wv
and w_gate/w_up column-sharded over tp, wo/w_down row-sharded with one
psum each; norms/embeddings replicated. Composes with the sequence axes
(dp x tp x sp meshes): attention runs the ring over the tp shard's local
heads (kv_heads must divide tp).
"""

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel.ring import ring_attention
from ..parallel.stripe import stripe_attention
from ..parallel.zigzag import zigzag_ring_attention
from ..parallel.llama3 import llama3_attention
from ..parallel.ulysses import usp_attention
from ..parallel.mesh import psum_exact
from ..parallel import layouts


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab: int = 32000
    dim: int = 1024
    layers: int = 4
    heads: int = 16
    kv_heads: int = 4
    head_dim: int = 64
    mlp_dim: int = 2816
    rope_theta: float = 10000.0
    dtype: str = "bfloat16"
    attention: str = "zigzag"  # ring | zigzag | stripe | llama3 | usp
    # mixture-of-experts MLP (0 = dense): switch routing, experts sharded
    # over an ep axis (models/moe.py)
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0
    # weight of the switch load-balancing auxiliary loss (prevents expert
    # collapse under top-1 routing; 0 disables)
    moe_aux_weight: float = 0.01

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def init_params(key, cfg: ModelConfig):
    """Replicated parameter pytree."""
    keys = jax.random.split(key, 2 + cfg.layers)
    d, hd = cfg.dim, cfg.head_dim

    def dense(k, shape):
        fan_in = shape[0]
        return (jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5).astype(
            cfg.jdtype
        )

    def layer(k):
        ks = jax.random.split(k, 7)
        out = {
            "attn_norm": jnp.ones((d,), jnp.float32),
            "wq": dense(ks[0], (d, cfg.heads * hd)),
            "wk": dense(ks[1], (d, cfg.kv_heads * hd)),
            "wv": dense(ks[2], (d, cfg.kv_heads * hd)),
            "wo": dense(ks[3], (cfg.heads * hd, d)),
            "mlp_norm": jnp.ones((d,), jnp.float32),
        }
        if cfg.moe_experts:
            from .moe import init_moe_layer

            out["moe"] = init_moe_layer(
                ks[4], d, cfg.mlp_dim, cfg.moe_experts, cfg.jdtype
            )
        else:
            out.update(
                w_gate=dense(ks[4], (d, cfg.mlp_dim)),
                w_up=dense(ks[5], (d, cfg.mlp_dim)),
                w_down=dense(ks[6], (cfg.mlp_dim, d)),
            )
        return out

    return {
        "embed": (
            jax.random.normal(keys[0], (cfg.vocab, d), jnp.float32) * 0.02
        ).astype(cfg.jdtype),
        "layers": [layer(k) for k in keys[2:]],
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": dense(keys[1], (d, cfg.vocab)),
    }


def _tp_copy(x, tp_axis):
    """Megatron's "f" operator: identity forward, tp-psum backward.

    Placed at each block branch's input so the branch's (per-tp-shard
    partial) cotangents are summed exactly once on the way back — after
    which every activation and replicated-weight gradient is the true
    total on every shard, with no end-of-step fixups."""
    if tp_axis is None:
        return x

    @jax.custom_vjp
    def f(x):
        return x

    f.defvjp(lambda x: (x, None),
             lambda _, ct: (lax.psum(ct, tp_axis),))
    return f(x)


def _rmsnorm(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    n = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


def _rope(x, positions, theta):
    """x (B, H, S, D), positions (S,) int32 — explicit positions so sharded
    layouts (zigzag/stripe) rotate by their true global positions."""
    b, h, s, d = x.shape
    half = d // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[:, None] * freqs[None, :]
    cos = jnp.cos(angles)[None, None]
    sin = jnp.sin(angles)[None, None]
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    ).astype(x.dtype)


def _attention(cfg, x, layer, positions, axis_name, ulysses_axis=None,
               tp_axis=None):
    b, s, d = x.shape
    h, hkv, hd = cfg.heads, cfg.kv_heads, cfg.head_dim
    if tp_axis is not None:
        # column-sharded projections: this shard computes h/tp local heads
        tp = lax.psum(1, tp_axis)
        assert h % tp == 0 and hkv % tp == 0, (h, hkv, tp)
        h, hkv = h // tp, hkv // tp
    xn = _tp_copy(_rmsnorm(x, layer["attn_norm"]), tp_axis)
    q = (xn @ layer["wq"]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = (xn @ layer["wk"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    v = (xn @ layer["wv"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    scale = hd**-0.5
    if axis_name is None:
        from ..ops.flash import flash_attention
        from ..ops.mask import MaskArgs

        out, _ = flash_attention(q, k, v, scale, MaskArgs(causal=True))
    elif cfg.attention == "ring":
        out, _ = ring_attention(
            q, k, v, scale=scale, causal=True, axis_name=axis_name
        )
    elif cfg.attention == "zigzag":
        out, _ = zigzag_ring_attention(q, k, v, scale=scale, axis_name=axis_name)
    elif cfg.attention == "stripe":
        out, _ = stripe_attention(q, k, v, scale=scale, axis_name=axis_name)
    elif cfg.attention == "llama3":
        out, _ = llama3_attention(
            q, k, v, None, scale=scale, causal=True, axis_name=axis_name
        )
    elif cfg.attention == "usp":
        # 2-D context parallelism: Ulysses A2A over ulysses_axis composed
        # with a causal KV ring over axis_name; layout = contiguous over
        # (axis_name major, ulysses_axis minor)
        assert ulysses_axis is not None, "usp attention needs ulysses_axis"
        out, _ = usp_attention(
            q, k, v, scale=scale, causal=True, ulysses_axis=ulysses_axis,
            ring_axis=axis_name, variant="ring",
        )
    else:
        raise ValueError(cfg.attention)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
    proj = out @ layer["wo"]
    if tp_axis is not None:
        # row-sharded wo: partial products sum across the tp axis (exact
        # transpose: the branch cotangent must NOT be rescaled — the
        # matching f operator at the branch entry does the reduction)
        proj = psum_exact(proj, tp_axis)
    return x + proj


def _mlp(x, layer, tp_axis=None):
    xn = _tp_copy(_rmsnorm(x, layer["mlp_norm"]), tp_axis)
    y = (jax.nn.silu(xn @ layer["w_gate"]) * (xn @ layer["w_up"])
         ) @ layer["w_down"]
    if tp_axis is not None:
        # column-sharded gate/up, row-sharded down: one exact-transpose
        # psum per block
        y = psum_exact(y, tp_axis)
    return x + y


def forward(params, cfg: ModelConfig, tokens, positions, axis_name=None,
            ulysses_axis=None, tp_axis=None, ep_axis=None):
    """Per-shard forward. tokens (B, S_local) int32, positions (S_local,)
    giving each local token's global position (layout-dependent). Returns
    logits (B, S_local, vocab)."""
    x = params["embed"][tokens]
    counts, probsums = [], []
    for layer in params["layers"]:
        x = _attention(cfg, x, layer, positions, axis_name, ulysses_axis,
                       tp_axis)
        if cfg.moe_experts:
            from .moe import moe_mlp

            t = x.shape[0] * x.shape[1]
            cap = max(1, int(t / cfg.moe_experts * cfg.moe_capacity_factor))
            x, (c_e, p_e) = moe_mlp(x, layer["moe"], layer["mlp_norm"], cap,
                                    ep_axis, return_aux=True)
            counts.append(c_e)
            probsums.append(p_e)
        else:
            x = _mlp(x, layer, tp_axis)
    x = _rmsnorm(x, params["final_norm"])
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    if cfg.moe_experts:
        # per-layer LOCAL router stats; the loss reduces them globally
        return logits, (jnp.stack(counts), jnp.stack(probsums))
    return logits


def loss_fn(params, cfg, tokens, labels, positions, axis_name=None,
            ulysses_axis=None, tp_axis=None, ep_axis=None):
    """Mean next-token CE. labels already shifted + laid out like tokens;
    label -100 = ignore (padding)."""
    out = forward(params, cfg, tokens, positions, axis_name, ulysses_axis,
                  tp_axis, ep_axis)
    logits, aux = out if cfg.moe_experts else (out, 0.0)
    valid = labels >= 0
    labels_safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    loss_sum = jnp.sum(jnp.where(valid, -tok_lp, 0.0))
    count = jnp.sum(valid)
    seq_axes = tuple(
        a for a in (axis_name, ulysses_axis, ep_axis) if a is not None
    )
    if seq_axes:
        # exact-transpose psum: a raw psum here would scale every weight
        # gradient by the axis size (its shard_map transpose is psum)
        loss_sum = psum_exact(loss_sum, seq_axes)
        count = lax.psum(count, seq_axes)  # count carries no gradient
    loss = loss_sum / jnp.maximum(count, 1)
    if cfg.moe_experts and cfg.moe_aux_weight:
        # global switch aux from the per-shard router statistics: the
        # psum'd stats make the sharded aux EXACTLY the unsharded one
        counts_l, probsums_l = aux
        t_local = jnp.float32(tokens.shape[0] * tokens.shape[1])
        if seq_axes:
            counts_l = lax.psum(counts_l, seq_axes)  # no grad path
            probsums_l = psum_exact(probsums_l, seq_axes)
            t_local = lax.psum(t_local, seq_axes)
        f_e = counts_l / t_local  # (L, E)
        p_e = probsums_l / t_local
        aux_val = cfg.moe_experts * jnp.sum(f_e * p_e, axis=-1)  # (L,)
        loss = loss + cfg.moe_aux_weight * jnp.mean(aux_val)
    return loss


def param_specs(cfg, tp_axis):
    """PartitionSpec pytree for megatron-TP weight sharding (shard_map
    in_specs/out_specs for the params argument)."""
    from jax.sharding import PartitionSpec as P

    col, row, rep = P(None, tp_axis), P(tp_axis, None), P()
    layer = {
        "attn_norm": rep, "wq": col, "wk": col, "wv": col, "wo": row,
        "mlp_norm": rep, "w_gate": col, "w_up": col, "w_down": row,
    }
    return {
        "embed": rep,
        "layers": [dict(layer) for _ in range(cfg.layers)],
        "final_norm": rep,
        "lm_head": rep,
    }


_EP_SHARDED = {"we_gate", "we_up", "we_down"}


def train_step(params, cfg, tokens, labels, positions, lr=1e-3,
               axis_name=None, data_axis=None, ulysses_axis=None,
               tp_axis=None, ep_axis=None):
    """One SGD step, per-shard (call inside shard_map). Gradients are
    psum'd over the sequence axes (weights replicated there) and, when
    given, the data axis. Under tp, the _tp_copy operator inside each
    block already all-reduces branch cotangents, so every grad leaf —
    tp-sharded or replicated — is correct with the same uniform
    reduction (no per-leaf tp fixups)."""
    loss, grads = jax.value_and_grad(loss_fn)(
        params, cfg, tokens, labels, positions, axis_name, ulysses_axis,
        tp_axis, ep_axis,
    )
    base_axes = tuple(
        a for a in (axis_name, ulysses_axis, data_axis) if a is not None
    )
    if ep_axis is None:
        if base_axes:
            grads = jax.tree.map(lambda g: lax.psum(g, base_axes), grads)
    else:
        # ep also acts as a data axis for non-expert weights; expert
        # weights are ep-sharded (their a2a'd grads are already complete)
        def _reduce(path, g):
            leaf = getattr(path[-1], "key", None)
            axes = base_axes
            if leaf not in _EP_SHARDED:
                axes = axes + (ep_axis,)
            return lax.psum(g, axes) if axes else g

        grads = jax.tree_util.tree_map_with_path(_reduce, grads)
    if data_axis:
        loss = lax.pmean(loss, data_axis)
    new_params = jax.tree.map(
        lambda p, g: (p.astype(jnp.float32) - lr * g.astype(jnp.float32)).astype(
            p.dtype
        ),
        params,
        grads,
    )
    return new_params, loss


def prepare_zigzag_batch(tokens, world):
    """Host-side: global (B, S) token batch -> (sharded tokens, sharded
    labels, per-rank positions) in the zigzag layout, ready to feed a
    shard_map whose sp axis has `world` devices."""
    labels = jnp.concatenate(
        [tokens[:, 1:], jnp.full_like(tokens[:, :1], -100)], axis=1
    )
    t_l = layouts.all_local_zigzag(tokens, world, axis=1)
    l_l = layouts.all_local_zigzag(labels, world, axis=1)
    s_local = tokens.shape[1] // world
    pos = jnp.concatenate(
        [
            jnp.asarray(layouts.zigzag_position_ids(r, world, s_local))
            for r in range(world)
        ]
    )
    return t_l, l_l, pos
