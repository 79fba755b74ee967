"""Zigzag ring attention over packed variable-length sequences.

Re-design of reference zigzag_ring_flash_attn_varlen.py with a TPU-first
layout change. The reference interleaves each sequence's two zigzag chunks
per-sequence and gathers "half" KV with data-dependent bool-mask indices
(reference :24-39, :160-180) — dynamic shapes TPU can't tile. We instead use
the *grouped* layout (ops/varlen.py zigzag_varlen_info): rank r packs
[chunk r of every sequence] ++ [chunk 2W-1-r of every sequence], so

  "first half of received kv"  = kv[:, :, :T/2]   (static slice)
  "second half of local q"     = q[:, :, T/2:]    (static slice)

and the 3-case zigzag schedule (see zigzag.py) carries over verbatim with
segment-only masks for steps >= 1 (chunk ordering guarantees the causal
relation block-wise) and positions+segments on the diagonal step. Causal
only, every sequence length divisible by 2W.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.flash import block_fwd, block_bwd, compute_delta
from ..ops.mask import MaskArgs
from ..ops.merge import merge_partials
from ..ops.varlen import local_chunk_info
from .mesh import ring_rotate, ring_size, ring_rank


def _need_pos(extras):
    return (extras.get("alibi_slopes") is not None
            or extras.get("dropout_p")
            or extras.get("window_left") is not None)


def _kpos_fn(segids, need, rank, w, half):
    """step -> resident kv positions for the grouped zigzag layout,
    DERIVED from the local segids instead of communicated: every rank's
    segids are identical (they come only from the shared per-half
    cu_seqlens), and source rank src = (rank - step) mod W packs
    [chunk src] ++ [chunk 2W-1-src], so its positions are
    ``src*lens + off`` / ``(2W-1-src)*lens + off`` (ops.varlen
    local_chunk_info). Round 3: the ring rotates exactly ONE array (kv),
    like the batch zigzag (the r2 schedule paid 2-3 collectives/step)."""
    if not need:
        return lambda step: None
    off, lens = local_chunk_info(segids[:half])

    def kpos(step):
        src = (rank - step) % w
        return jnp.concatenate(
            [src * lens + off, (2 * w - 1 - src) * lens + off]
        )

    return kpos


def _fwd(q, k, v, segids, pos, scale, axis_name, backend, extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    win = extras.get("window_left") is not None
    half = q.shape[2] // 2
    kv = jnp.stack([k, v])
    need_pos = _need_pos(extras)
    kpos_at = _kpos_fn(segids, need_pos, rank, w, half)
    out = lse = None
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        kpos = kpos_at(step)
        if step == 0:
            mask = MaskArgs(
                causal=True, q_segids=segids, kv_segids=segids,
                q_pos=pos, kv_pos=pos,
                packed_self=True,  # diagonal step: q vs its own packing
                **extras,
            )
            b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
            out, lse = merge_partials(None, None, b_out, b_lse)
            kv = kv_next
            continue

        def _earlier(args, kk=kk, vv=vv, kpos=kpos):
            out, lse = args
            mask = MaskArgs(causal=win, q_segids=segids,
                            kv_segids=segids[:half],
                            q_pos=pos if need_pos else None,
                            kv_pos=kpos[:half] if need_pos else None,
                            **extras)
            b_out, b_lse = block_fwd(
                q, kk[:, :, :half], vv[:, :, :half], scale, mask, backend
            )
            return merge_partials(out, lse, b_out, b_lse)

        def _later(args, kk=kk, vv=vv, kpos=kpos):
            out, lse = args
            mask = MaskArgs(causal=win, q_segids=segids[half:],
                            kv_segids=segids,
                            q_pos=pos[half:] if need_pos else None,
                            kv_pos=kpos, **extras)
            b_out, b_lse = block_fwd(
                q[:, :, half:], kk, vv, scale, mask, backend
            )
            m_out, m_lse = merge_partials(
                out[:, :, half:], lse[:, :, half:], b_out, b_lse
            )
            out = lax.dynamic_update_slice_in_dim(out, m_out, half, axis=2)
            lse = lax.dynamic_update_slice_in_dim(lse, m_lse, half, axis=2)
            return out, lse

        out, lse = lax.cond(step <= rank, _earlier, _later, (out, lse))
        kv = kv_next
    return out, lse


def _bwd(q, k, v, segids, pos, out, lse, dout, scale, axis_name, backend,
         extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    win = extras.get("window_left") is not None
    half = q.shape[2] // 2
    delta = compute_delta(dout, out)
    dout1, q1 = dout[:, :, half:], q[:, :, half:]
    lse1, delta1 = lse[:, :, half:], delta[:, :, half:]
    seg1 = segids[half:]

    kv = jnp.stack([k, v])
    need_pos = _need_pos(extras)
    kpos_at = _kpos_fn(segids, need_pos, rank, w, half)
    dq = jnp.zeros(q.shape, jnp.float32)
    dkv = jnp.zeros((2,) + k.shape, jnp.float32)
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        kpos = kpos_at(step)

        if step == 0:
            mask = MaskArgs(
                causal=True, q_segids=segids, kv_segids=segids,
                q_pos=pos, kv_pos=pos,
                packed_self=True,  # diagonal step: q vs its own packing
                **extras,
            )
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale, mask, backend
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
            dkv = ring_rotate(dkv, axis_name)
            kv = kv_next
            continue

        def _earlier(args, kk=kk, vv=vv, kpos=kpos):
            dq, dkv = args
            mask = MaskArgs(causal=win, q_segids=segids,
                            kv_segids=segids[:half],
                            q_pos=pos if need_pos else None,
                            kv_pos=kpos[:half] if need_pos else None,
                            **extras)
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk[:, :, :half], vv[:, :, :half], lse, delta,
                scale, mask, backend,
            )
            dkv_half = dkv[:, :, :, :half] + jnp.stack([b_dk, b_dv])
            dkv = lax.dynamic_update_slice_in_dim(dkv, dkv_half, 0, axis=3)
            return dq + b_dq, dkv

        def _later(args, kk=kk, vv=vv, kpos=kpos):
            dq, dkv = args
            mask = MaskArgs(causal=win, q_segids=seg1, kv_segids=segids,
                            q_pos=pos[half:] if need_pos else None,
                            kv_pos=kpos, **extras)
            b_dq, b_dk, b_dv = block_bwd(
                dout1, q1, kk, vv, lse1, delta1, scale, mask, backend
            )
            dq_half = dq[:, :, half:] + b_dq
            dq = lax.dynamic_update_slice_in_dim(dq, dq_half, half, axis=2)
            return dq, dkv + jnp.stack([b_dk, b_dv])

        dq, dkv = lax.cond(step <= rank, _earlier, _later, (dq, dkv))
        dkv = ring_rotate(dkv, axis_name)
        kv = kv_next
    return dq, dkv[0], dkv[1]


def zigzag_ring_attention_varlen(q, k, v, segids, positions, *, scale,
                                 axis_name, backend=None, softcap=None,
                                 alibi_slopes=None, dropout_p=None,
                                 dropout_seed=None, window_left=None):
    """Differentiable zigzag varlen ring attention (grouped layout).

    segids/positions: (T_local,) int32 per ops.varlen.zigzag_varlen_info.
    Causal only. Call inside shard_map.
    """

    base = dict(softcap=softcap, alibi_slopes=alibi_slopes,
                dropout_p=dropout_p, window_left=window_left)
    seed = jnp.asarray(
        0 if dropout_seed is None else dropout_seed, jnp.int32
    )

    @jax.custom_vjp
    def f(q, k, v, segids, positions, seed):
        out, lse = _fwd(q, k, v, segids, positions, scale, axis_name, backend,
                        dict(base, dropout_seed=seed))
        return out.astype(q.dtype), lse

    def f_fwd(q, k, v, segids, positions, seed):
        out, lse = _fwd(q, k, v, segids, positions, scale, axis_name, backend,
                        dict(base, dropout_seed=seed))
        out = out.astype(q.dtype)
        return (out, lse), (q, k, v, segids, positions, seed, out, lse)

    def f_bwd(res, grads):
        q, k, v, segids, positions, seed, out, lse = res
        dout, _ = grads
        dq, dk, dv = _bwd(
            q, k, v, segids, positions, out, lse, dout, scale, axis_name,
            backend, dict(base, dropout_seed=seed),
        )
        return (
            dq.astype(q.dtype),
            dk.astype(k.dtype),
            dv.astype(v.dtype),
            None,
            None,
            None,
        )

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v, segids, positions, seed)
