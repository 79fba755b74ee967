"""Ulysses (DeepSpeed) head-parallel sequence parallelism — an EXTENSION
beyond the reference (SURVEY.md §2 notes it as explicitly absent there).

Instead of rotating KV, Ulysses all-to-alls the activations: sequence-sharded
q/k/v (B, H, S/W, D) become head-sharded full-sequence (B, H/W, S, D), run
ONE dense flash-attention call at full kernel efficiency, and all-to-all
back. Two A2As per direction instead of W-1 ring hops — often the better
trade when H >= W and the interconnect is fast, and it composes with the
ring variants (2D sp x hp meshes) for W > H.

Per-shard, call inside shard_map. GQA: KV heads are repeated up to the
query head count when Hkv < W so every shard keeps whole KV head groups
(standard Ulysses practice).
"""

import jax.numpy as jnp
from jax import lax

from ..ops.flash import flash_attention
from ..ops.mask import MaskArgs
from .mesh import ring_rank, ring_size


def _a2a_seq_to_heads(x, axis_name):
    """(B, H, S_local, D) -> (B, H/W, S_global, D)."""
    return lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                          tiled=True)


def _a2a_heads_to_seq(x, axis_name):
    """(B, H/W, S_global, D) -> (B, H, S_local, D)."""
    return lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                          tiled=True)


def _shard_slopes(alibi_slopes, axis_name, hq, w):
    """Slice the global per-head slopes to this shard's A2A head range."""
    if alibi_slopes is None:
        return None
    rank = ring_rank(axis_name)
    return lax.dynamic_slice(
        jnp.asarray(alibi_slopes, jnp.float32), (rank * (hq // w),),
        (hq // w,),
    )


def ulysses_attention(q, k, v, *, scale, causal, axis_name, backend=None,
                      softcap=None, alibi_slopes=None, dropout_p=None,
                      dropout_seed=None):
    """Differentiable Ulysses attention on per-shard (B, H, S_local, D)
    tensors (sequence-sharded, contiguous layout). Returns
    (out in q.dtype, lse fp32 (B, H, S_local))."""
    w = ring_size(axis_name)
    hq, hkv = q.shape[1], k.shape[1]
    assert hq % w == 0, (
        f"Ulysses needs q heads ({hq}) divisible by the axis size ({w}); "
        "compose with a ring axis otherwise"
    )
    if hkv % w != 0:
        rep = w // hkv if w % hkv == 0 else None
        assert rep, (hkv, w)
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    qh = _a2a_seq_to_heads(q, axis_name)
    kh = _a2a_seq_to_heads(k, axis_name)
    vh = _a2a_seq_to_heads(v, axis_name)
    rank = ring_rank(axis_name)
    out, lse = flash_attention(
        qh, kh, vh, scale,
        MaskArgs(
            causal=causal, softcap=softcap,
            alibi_slopes=_shard_slopes(alibi_slopes, axis_name, hq, w),
            dropout_p=dropout_p, dropout_seed=dropout_seed,
            # after the A2A this shard owns q heads [rank*Hq/W, ...): give
            # the dropout hash global head ids so the pattern matches the
            # unsharded computation exactly
            head_offset=rank * (hq // w),
        ),
        backend,
    )
    out = _a2a_heads_to_seq(out, axis_name)
    # lse (B, H/W, S_global) -> (B, H, S_local): same a2a with a dummy dim
    lse = _a2a_heads_to_seq(lse[..., None], axis_name)[..., 0]
    return out, lse


def usp_attention(q, k, v, *, scale, causal, ulysses_axis, ring_axis,
                  variant="ring", backend=None, softcap=None,
                  alibi_slopes=None, dropout_p=None, dropout_seed=None):
    """2D sequence parallelism (USP, arXiv:2405.07719): Ulysses A2A over one
    mesh axis composed with a KV ring over another — EXTENSION beyond the
    reference. Scales context parallelism past the head count.

    Sequence layout: contiguous over (ring_axis major, ulysses_axis minor);
    the A2A converts the ulysses-axis sequence sharding into head sharding,
    then the ring variant runs over ring_axis per head group.
    q/k/v per-shard (B, H, S_local, D)."""
    from .ring import ring_attention
    from .stripe import stripe_attention
    from .zigzag import zigzag_ring_attention

    w = ring_size(ulysses_axis)
    hq, hkv = q.shape[1], k.shape[1]
    assert hq % w == 0, (hq, w)
    if hkv % w != 0:
        rep = w // hkv if w % hkv == 0 else None
        assert rep, (hkv, w)
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    qh = _a2a_seq_to_heads(q, ulysses_axis)
    kh = _a2a_seq_to_heads(k, ulysses_axis)
    vh = _a2a_seq_to_heads(v, ulysses_axis)
    rank = ring_rank(ulysses_axis)
    extras = dict(
        softcap=softcap,
        alibi_slopes=_shard_slopes(alibi_slopes, ulysses_axis, hq, w),
        dropout_p=dropout_p, dropout_seed=dropout_seed,
        head_offset=rank * (hq // w),
    )
    if variant == "ring":
        out, lse = ring_attention(
            qh, kh, vh, scale=scale, causal=causal, axis_name=ring_axis,
            backend=backend, **extras,
        )
    elif variant == "zigzag":
        assert causal
        out, lse = zigzag_ring_attention(
            qh, kh, vh, scale=scale, axis_name=ring_axis, backend=backend,
            **extras,
        )
    elif variant == "stripe":
        assert causal
        out, lse = stripe_attention(
            qh, kh, vh, scale=scale, axis_name=ring_axis, backend=backend,
            **extras,
        )
    else:
        raise ValueError(variant)
    out = _a2a_heads_to_seq(out, ulysses_axis)
    lse = _a2a_heads_to_seq(lse[..., None], ulysses_axis)[..., 0]
    return out, lse
