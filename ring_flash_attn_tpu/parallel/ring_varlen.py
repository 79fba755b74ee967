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

Only the kv segment ids rotate with kv; positions are needed only on the
diagonal step. The varlen LSE flatten/unflatten machinery of the reference
(triton_utils.py) does not exist here: LSE is flat (B,H,T) by design.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.flash import block_fwd, block_bwd, compute_delta
from ..ops.mask import MaskArgs
from ..ops.merge import merge_partials
from .mesh import ring_rotate, ring_size, ring_rank


def _fwd(q, k, v, segids, pos, scale, causal, axis_name, backend,
         softcap=None):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    kv = jnp.stack([k, v])
    kseg = segids
    out = lse = None
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kseg_next = ring_rotate(kseg, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        if step == 0:
            mask = MaskArgs(
                softcap=softcap, causal=causal, q_segids=segids, kv_segids=kseg,
                q_pos=pos if causal else None,
                kv_pos=pos if causal else None,
            )
            b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
            out, lse = merge_partials(None, None, b_out, b_lse)
        elif not causal:
            mask = MaskArgs(q_segids=segids, kv_segids=kseg,
                            softcap=softcap)
            b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
            out, lse = merge_partials(out, lse, b_out, b_lse)
        else:

            def _compute(args, kk=kk, vv=vv, kseg=kseg):
                out, lse = args
                mask = MaskArgs(q_segids=segids, kv_segids=kseg,
                            softcap=softcap)
                b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
                return merge_partials(out, lse, b_out, b_lse)

            out, lse = lax.cond(step <= rank, _compute, lambda a: a, (out, lse))
        kv, kseg = kv_next, kseg_next
    return out, lse


def _bwd(q, k, v, segids, pos, out, lse, dout, scale, causal, axis_name,
         backend, softcap=None):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    delta = compute_delta(dout, out)
    kv = jnp.stack([k, v])
    kseg = segids
    dq = jnp.zeros(q.shape, jnp.float32)
    dkv = jnp.zeros((2,) + k.shape, jnp.float32)
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kseg_next = ring_rotate(kseg, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        if step == 0:
            mask = MaskArgs(
                softcap=softcap, causal=causal, q_segids=segids, kv_segids=kseg,
                q_pos=pos if causal else None,
                kv_pos=pos if causal else None,
            )
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale, mask, backend
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
        elif not causal:
            mask = MaskArgs(q_segids=segids, kv_segids=kseg,
                            softcap=softcap)
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale, mask, backend
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
        else:

            def _compute(args, kk=kk, vv=vv, kseg=kseg):
                dq, dkv = args
                mask = MaskArgs(q_segids=segids, kv_segids=kseg,
                            softcap=softcap)
                b_dq, b_dk, b_dv = block_bwd(
                    dout, q, kk, vv, lse, delta, scale, mask, backend
                )
                return dq + b_dq, dkv + jnp.stack([b_dk, b_dv])

            dq, dkv = lax.cond(step <= rank, _compute, lambda a: a, (dq, dkv))
        dkv = ring_rotate(dkv, axis_name)
        kv, kseg = kv_next, kseg_next
    return dq, dkv[0], dkv[1]


def ring_attention_varlen(q, k, v, segids, positions, *, scale, causal,
                          axis_name, backend=None, softcap=None):
    """Differentiable varlen ring attention on per-shard packed (B,H,T,D).

    segids/positions: (T_local,) int32 per ops.varlen.ring_varlen_info.
    Call inside shard_map. Returns (out in q.dtype, lse fp32 (B,H,T)).
    """

    @jax.custom_vjp
    def f(q, k, v, segids, positions):
        out, lse = _fwd(
            q, k, v, segids, positions, scale, causal, axis_name, backend,
            softcap,
        )
        return out.astype(q.dtype), lse

    def f_fwd(q, k, v, segids, positions):
        out, lse = _fwd(
            q, k, v, segids, positions, scale, causal, axis_name, backend,
            softcap,
        )
        out = out.astype(q.dtype)
        return (out, lse), (q, k, v, segids, positions, out, lse)

    def f_bwd(res, grads):
        q, k, v, segids, positions, out, lse = res
        dout, _ = grads
        dq, dk, dv = _bwd(
            q, k, v, segids, positions, out, lse, dout, scale, causal,
            axis_name, backend, softcap,
        )
        return (
            dq.astype(q.dtype),
            dk.astype(k.dtype),
            dv.astype(v.dtype),
            None,
            None,
        )

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v, segids, positions)
