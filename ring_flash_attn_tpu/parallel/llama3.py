"""Llama-3 all-gather context parallelism (the reference's recommended
varlen path).

Re-design of reference llama3_flash_attn_varlen.py: not a ring — the packed
global sequence is sharded contiguously; each rank all-gathers KV one
KV-head chunk at a time (`heads_k_stride`, the memory knob, reference
:89-93) while computing the previous chunk, then runs ONE full-row flash
call per chunk — no LSE merging needed. Backward all-gathers the same way,
computes gathered-size dk/dv, and reduce-scatters them home
(reference :292-293 -> jax.lax.psum_scatter).

Masking is global-position causal (q offset = rank * L rides into the
kernel as a traced scalar, which also drives KV block clipping — the
reference's clipped cu_seqlens_k, :44-48) plus segment ids for the packed
sequences (all-gathered int32, replacing the asymmetric cu_seqlens_q/k
plumbing). prepare-metadata lives in ops/varlen.py + api.py.

Functions are per-shard: call inside shard_map over `axis_name`.
Internal layout (B, H, S, D); varlen packing means B == 1.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.flash import block_fwd, block_bwd, compute_delta
from ..ops.mask import MaskArgs
from .mesh import ring_rank, ring_size


def _gather_chunk(kv, i, stride, axis_name):
    """All-gather KV heads [i, i+stride) along the token axis."""
    chunk = kv[:, :, i : i + stride]  # (2, B, stride, L, D)
    return lax.all_gather(chunk, axis_name, axis=3, tiled=True)


def _llama3_fwd(q, k, v, q_segids, scale, causal, heads_k_stride,
                axis_name, backend, softcap=None, alibi_slopes=None,
                dropout_p=None, dropout_seed=None, window_left=None):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    b, hq, l, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    offset = rank * l

    if q_segids is not None:
        kv_segids = lax.all_gather(q_segids, axis_name, axis=0, tiled=True)
    else:
        kv_segids = None

    kv = jnp.stack([k, v])
    outs, lses = [], []
    gathered = _gather_chunk(kv, 0, heads_k_stride, axis_name)
    for i in range(0, hkv, heads_k_stride):
        # prefetch the next head-chunk gather; XLA overlaps it with this
        # chunk's kernels (reference's double-buffered async all_gather,
        # :104-115)
        nxt = (
            _gather_chunk(kv, i + heads_k_stride, heads_k_stride, axis_name)
            if i + heads_k_stride < hkv
            else None
        )
        q_i = q[:, i * group : (i + heads_k_stride) * group]
        mask = MaskArgs(
            causal=causal,
            # ALiBi/dropout need the global q offset even when not causal
            # (kv is gathered from global position 0, so kv_offset stays 0)
            offset=offset if (
                causal or alibi_slopes is not None or dropout_p
            ) else None,
            q_segids=q_segids,
            kv_segids=kv_segids,
            softcap=softcap,
            alibi_slopes=(
                alibi_slopes[i * group:(i + heads_k_stride) * group]
                if alibi_slopes is not None else None
            ),
            dropout_p=dropout_p,
            dropout_seed=dropout_seed,
            window_left=window_left,
            # this chunk computes global q heads [i*group, ...): give the
            # dropout hash their global ids
            head_offset=i * group if dropout_p else None,
        )
        o_i, lse_i = block_fwd(
            q_i, gathered[0], gathered[1], scale, mask, backend
        )
        outs.append(o_i)
        lses.append(lse_i)
        gathered = nxt
    return jnp.concatenate(outs, axis=1), jnp.concatenate(lses, axis=1)


def _llama3_bwd(q, k, v, q_segids, out, lse, dout, scale, causal,
                heads_k_stride, axis_name, backend, softcap=None,
                alibi_slopes=None, dropout_p=None, dropout_seed=None,
                window_left=None):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    b, hq, l, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    offset = rank * l

    if q_segids is not None:
        kv_segids = lax.all_gather(q_segids, axis_name, axis=0, tiled=True)
    else:
        kv_segids = None

    delta = compute_delta(dout, out)
    kv = jnp.stack([k, v])
    dqs, dks, dvs = [], [], []
    gathered = _gather_chunk(kv, 0, heads_k_stride, axis_name)
    for i in range(0, hkv, heads_k_stride):
        nxt = (
            _gather_chunk(kv, i + heads_k_stride, heads_k_stride, axis_name)
            if i + heads_k_stride < hkv
            else None
        )
        hs = slice(i * group, (i + heads_k_stride) * group)
        mask = MaskArgs(
            causal=causal,
            # ALiBi/dropout need the global q offset even when not causal
            # (kv is gathered from global position 0, so kv_offset stays 0)
            offset=offset if (
                causal or alibi_slopes is not None or dropout_p
            ) else None,
            q_segids=q_segids,
            kv_segids=kv_segids,
            softcap=softcap,
            alibi_slopes=(
                alibi_slopes[i * group:(i + heads_k_stride) * group]
                if alibi_slopes is not None else None
            ),
            dropout_p=dropout_p,
            dropout_seed=dropout_seed,
            window_left=window_left,
            # this chunk computes global q heads [i*group, ...): give the
            # dropout hash their global ids
            head_offset=i * group if dropout_p else None,
        )
        dq_i, dk_g, dv_g = block_bwd(
            dout[:, hs], q[:, hs], gathered[0], gathered[1],
            lse[:, hs], delta[:, hs], scale, mask, backend,
        )
        # gathered-size fp32 dk/dv -> summed + sharded home
        # (reference dist.reduce_scatter_tensor, :292-293)
        dks.append(lax.psum_scatter(dk_g, axis_name, scatter_dimension=2,
                                    tiled=True))
        dvs.append(lax.psum_scatter(dv_g, axis_name, scatter_dimension=2,
                                    tiled=True))
        dqs.append(dq_i)
        gathered = nxt
    dq = jnp.concatenate(dqs, axis=1)
    dk = jnp.concatenate(dks, axis=1)
    dv = jnp.concatenate(dvs, axis=1)
    return dq, dk, dv


def llama3_attention(q, k, v, q_segids=None, *, scale, causal=True,
                     heads_k_stride=None, axis_name, backend=None,
                     softcap=None, alibi_slopes=None, dropout_p=None,
                     dropout_seed=None, window_left=None):
    """Differentiable llama3 all-gather attention on per-shard (B,H,S,D).

    q/k/v sharded contiguously along S (packed tokens when varlen;
    q_segids (S_local,) int32 with globally-consistent labels). Returns
    (out in q.dtype, lse fp32 (B,H,S)).
    """
    hkv = k.shape[1]
    if heads_k_stride is None:
        heads_k_stride = hkv
    assert hkv % heads_k_stride == 0, (hkv, heads_k_stride)

    # q_segids / the dropout seed may be traced arrays: custom_vjp can't
    # close over tracers, so they ride as explicit zero-cotangent arguments.
    seed = jnp.asarray(
        0 if dropout_seed is None else dropout_seed, jnp.int32
    )

    @jax.custom_vjp
    def f(q, k, v, q_segids, seed):
        out, lse = _llama3_fwd(
            q, k, v, q_segids, scale, causal, heads_k_stride, axis_name,
            backend, softcap, alibi_slopes, dropout_p, seed, window_left,
        )
        return out.astype(q.dtype), lse

    def f_fwd(q, k, v, q_segids, seed):
        out, lse = _llama3_fwd(
            q, k, v, q_segids, scale, causal, heads_k_stride, axis_name,
            backend, softcap, alibi_slopes, dropout_p, seed, window_left,
        )
        out = out.astype(q.dtype)
        return (out, lse), (q, k, v, q_segids, seed, out, lse)

    def f_bwd(res, grads):
        q, k, v, q_segids, seed, out, lse = res
        dout, _ = grads
        dq, dk, dv = _llama3_bwd(
            q, k, v, q_segids, out, lse, dout, scale, causal,
            heads_k_stride, axis_name, backend, softcap, alibi_slopes,
            dropout_p, seed, window_left,
        )
        return (
            dq.astype(q.dtype),
            dk.astype(k.dtype),
            dv.astype(v.dtype),
            None,
            None,
        )

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v, q_segids, seed)
