"""Ring attention over packed variable-length sequences.

Re-design of reference ring_flash_attn_varlen.py: the same W-step ring as
ring.py, over packed tokens. Layout (reference
test/test_ring_flash_attn_varlen_func.py:9-15): every sequence splits into
W contiguous parts and rank r packs part r of each sequence, so all ranks
share one local cu_seqlens (the reference's single shared cu_seqlens
constraint, README.md:74).

Instead of threading cu_seqlens into the kernel, masks are segment ids +
within-sequence positions (ops/varlen.py):

  step 0:            causal -> positions+segments (the true causal mask);
                     else segments only
  step 1..rank:      the resident kv (from rank j < r) is entirely earlier
                     within every sequence -> segments-only mask
  step > rank:       skipped when causal (lax.cond), segments-only otherwise

NO metadata rotates with kv (round 3): the layout contract makes every
rank's segment ids identical (they derive only from the shared local
cu_seqlens), and the resident kv's positions at step s are closed-form
``src * lens + local`` with src = (rank - s) mod W
(ops.varlen.local_chunk_info) — so the ring rotates exactly ONE array
(kv), matching the batch path's collective count. Positions are only
materialized on the diagonal step — unless ALiBi, deterministic dropout
or sliding windows need per-step coordinates (EXTENSIONS the reference
supports nowhere); those are then derived, not communicated; dropout
stays bit-identical to single-device varlen dropout.
The varlen LSE flatten/unflatten machinery of the reference
(triton_utils.py) does not exist here: LSE is flat (B,H,T) by design.
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


def _kpos_fn(segids, need, rank, w):
    """step -> resident kv positions, derived (never communicated)."""
    if not need:
        return lambda step: None
    local, lens = local_chunk_info(segids)

    def kpos(step):
        src = (rank - step) % w
        return src * lens + local

    return kpos


def _fwd(q, k, v, segids, pos, scale, causal, axis_name, backend, extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    win = extras.get("window_left") is not None
    kv = jnp.stack([k, v])
    need_pos = _need_pos(extras)
    kpos_at = _kpos_fn(segids, need_pos, rank, w)
    out = lse = None
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        kpos = kpos_at(step)
        if step == 0:
            mask = MaskArgs(
                causal=causal, q_segids=segids, kv_segids=segids,
                q_pos=pos if (causal or need_pos) else None,
                kv_pos=pos if (causal or need_pos) else None,
                packed_self=True,  # diagonal step: q vs its own packing
                **extras,
            )
            b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
            out, lse = merge_partials(None, None, b_out, b_lse)
        elif not causal:
            mask = MaskArgs(q_segids=segids, kv_segids=segids,
                            q_pos=pos if need_pos else None,
                            kv_pos=kpos, **extras)
            b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
            out, lse = merge_partials(out, lse, b_out, b_lse)
        else:

            def _compute(args, kk=kk, vv=vv, kpos=kpos):
                out, lse = args
                # a sliding window re-enables the position comparison on
                # off-diagonal steps (qp >= kp holds trivially there, the
                # window upper bound does not)
                mask = MaskArgs(causal=win, q_segids=segids,
                                kv_segids=segids,
                                q_pos=pos if need_pos else None,
                                kv_pos=kpos, **extras)
                b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
                return merge_partials(out, lse, b_out, b_lse)

            out, lse = lax.cond(step <= rank, _compute, lambda a: a, (out, lse))
        kv = kv_next
    return out, lse


def _bwd(q, k, v, segids, pos, out, lse, dout, scale, causal, axis_name,
         backend, extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    win = extras.get("window_left") is not None
    delta = compute_delta(dout, out)
    kv = jnp.stack([k, v])
    need_pos = _need_pos(extras)
    kpos_at = _kpos_fn(segids, need_pos, rank, w)
    dq = jnp.zeros(q.shape, jnp.float32)
    dkv = jnp.zeros((2,) + k.shape, jnp.float32)
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        kpos = kpos_at(step)
        if step == 0:
            mask = MaskArgs(
                causal=causal, q_segids=segids, kv_segids=segids,
                q_pos=pos if (causal or need_pos) else None,
                kv_pos=pos if (causal or need_pos) else None,
                packed_self=True,  # diagonal step: q vs its own packing
                **extras,
            )
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale, mask, backend
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
        elif not causal:
            mask = MaskArgs(q_segids=segids, kv_segids=segids,
                            q_pos=pos if need_pos else None,
                            kv_pos=kpos, **extras)
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale, mask, backend
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
        else:

            def _compute(args, kk=kk, vv=vv, kpos=kpos):
                dq, dkv = args
                mask = MaskArgs(causal=win, q_segids=segids,
                                kv_segids=segids,
                                q_pos=pos if need_pos else None,
                                kv_pos=kpos, **extras)
                b_dq, b_dk, b_dv = block_bwd(
                    dout, q, kk, vv, lse, delta, scale, mask, backend
                )
                return dq + b_dq, dkv + jnp.stack([b_dk, b_dv])

            dq, dkv = lax.cond(step <= rank, _compute, lambda a: a, (dq, dkv))
        dkv = ring_rotate(dkv, axis_name)
        kv = kv_next
    return dq, dkv[0], dkv[1]


def ring_attention_varlen(q, k, v, segids, positions, *, scale, causal,
                          axis_name, backend=None, softcap=None,
                          alibi_slopes=None, dropout_p=None,
                          dropout_seed=None, window_left=None):
    """Differentiable varlen ring attention on per-shard packed (B,H,T,D).

    segids/positions: (T_local,) int32 per ops.varlen.ring_varlen_info.
    Call inside shard_map. Returns (out in q.dtype, lse fp32 (B,H,T)).
    """
    if window_left is not None:
        assert causal, "sliding window requires causal=True"
    base = dict(softcap=softcap, alibi_slopes=alibi_slopes,
                dropout_p=dropout_p, window_left=window_left)
    seed = jnp.asarray(
        0 if dropout_seed is None else dropout_seed, jnp.int32
    )

    @jax.custom_vjp
    def f(q, k, v, segids, positions, seed):
        out, lse = _fwd(
            q, k, v, segids, positions, scale, causal, axis_name, backend,
            dict(base, dropout_seed=seed),
        )
        return out.astype(q.dtype), lse

    def f_fwd(q, k, v, segids, positions, seed):
        out, lse = _fwd(
            q, k, v, segids, positions, scale, causal, axis_name, backend,
            dict(base, dropout_seed=seed),
        )
        out = out.astype(q.dtype)
        return (out, lse), (q, k, v, segids, positions, seed, out, lse)

    def f_bwd(res, grads):
        q, k, v, segids, positions, seed, out, lse = res
        dout, _ = grads
        dq, dk, dv = _bwd(
            q, k, v, segids, positions, out, lse, dout, scale, causal,
            axis_name, backend, dict(base, dropout_seed=seed),
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
