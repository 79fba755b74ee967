"""Mixture-of-experts MLP with expert parallelism (ep axis).

An extension beyond the reference's scope: top-1 (switch-style) routing
with the Mesh-TensorFlow einsum dispatch, experts sharded over an `ep`
mesh axis and tokens exchanged with `lax.all_to_all` (whose transpose is
the inverse all_to_all — backward is exact without custom VJPs).

Convention: the token/batch dimension is sharded over the SAME ep axis
(the usual dp==ep design). Per shard: route local tokens to all E global
experts, all-to-all so each shard holds its E/ep local experts' queues
from every source shard, run the local expert FFNs, all-to-all back,
combine with the router gate. Capacity C is per (expert, source shard);
overflowing tokens are dropped (their MLP contribution is zero — the
residual passes through), the standard switch behavior.
"""

import jax
import jax.numpy as jnp
from jax import lax

from .transformer import _rmsnorm
from ..parallel.mesh import ring_size


def init_moe_layer(key, dim, mlp_dim, experts, dtype):
    ks = jax.random.split(key, 4)

    def dense(k, shape):
        fan_in = shape[-2]
        return (
            jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5
        ).astype(dtype)

    return {
        "router": dense(ks[0], (dim, experts)).astype(jnp.float32),
        "we_gate": dense(ks[1], (experts, dim, mlp_dim)),
        "we_up": dense(ks[2], (experts, dim, mlp_dim)),
        "we_down": dense(ks[3], (experts, mlp_dim, dim)),
    }


def moe_mlp(x, layer, norm_w, capacity, ep_axis=None, return_aux=False):
    """Switch MoE block: x (B, S, D) -> x + MoE(RMSNorm(x)).

    layer: init_moe_layer params (expert dim sharded over ep_axis when
    given). capacity: per-(expert, source-shard) queue length (static).

    return_aux=True additionally returns the raw statistics of the switch
    load-balancing auxiliary loss, (count_e, probsum_e) over the LOCAL
    tokens — the trainer psums them across shards and forms
    aux = E * sum_e (count_e/T) * (probsum_e/T) globally, so the sharded
    aux is exactly the unsharded one. Without the aux, top-1 routing has
    nothing preventing expert collapse.
    """
    b, s, d = x.shape
    xn = _rmsnorm(x, norm_w).reshape(b * s, d)
    t = b * s
    e = layer["router"].shape[1]
    e_local = layer["we_gate"].shape[0]
    ep = 1 if ep_axis is None else ring_size(ep_axis)
    assert e_local * ep == e, (e_local, ep, e)

    logits = xn.astype(jnp.float32) @ layer["router"]  # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)  # (T,)
    gate = jnp.take_along_axis(probs, expert[:, None], axis=-1)[:, 0]

    onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)  # (T, E)
    pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot  # queue slot per token
    keep = (pos < capacity).astype(jnp.float32) * onehot
    # dispatch/combine tensors (T, E, C) — Mesh-TensorFlow formulation
    slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity, dtype=jnp.float32)
    dispatch = keep[..., None] * slot  # (T, E, C)
    combine = dispatch * gate[:, None, None]

    expert_in = jnp.einsum("tec,td->ecd", dispatch, xn.astype(jnp.float32))
    if ep_axis is not None:
        # (E, C, D) -> each shard keeps its local experts' queues from all
        # source shards: (E_local, ep*C, D)
        expert_in = lax.all_to_all(
            expert_in, ep_axis, split_axis=0, concat_axis=1, tiled=True
        )

    def ffn(acc, ew):
        wg, wu, wd, xi = ew
        y = (jax.nn.silu(xi @ wg.astype(jnp.float32))
             * (xi @ wu.astype(jnp.float32))) @ wd.astype(jnp.float32)
        return acc, y

    _, expert_out = lax.scan(
        ffn, 0,
        (layer["we_gate"], layer["we_up"], layer["we_down"], expert_in),
    )  # (E_local, ep*C, D)

    if ep_axis is not None:
        # route results back to the source shards: (E, C, D) per shard
        expert_out = lax.all_to_all(
            expert_out, ep_axis, split_axis=1, concat_axis=0, tiled=True
        )
    y = jnp.einsum("tec,ecd->td", combine, expert_out)
    out = x + y.reshape(b, s, d).astype(x.dtype)
    if not return_aux:
        return out
    count_e = jnp.sum(onehot, axis=0)  # router decisions (no grad path)
    probsum_e = jnp.sum(probs, axis=0)  # differentiable
    return out, (count_e, probsum_e)
