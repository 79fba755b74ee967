"""Stripe attention schedule (arXiv:2311.09431).

Re-design of the reference's stripe_flash_attn.py. Token layout: token t
lives on rank t % W at local index t // W (reference
test/test_stripe_flash_attn_func.py:9-14). At step s the resident kv came
from rank j = (r-s) % W, so global positions satisfy

  q_pos - kv_pos = (r - j) + W*(iq - ik)

  j <= r (step <= rank):  causal iff iq >= ik        — plain local causal
  j >  r (step >  rank):  causal iff iq >= ik + 1    — shifted diagonal

The reference realizes the shifted diagonal by slicing q[:,1:] vs k[:,:-1]
(reference stripe_flash_attn.py:63-93), which breaks TPU tiling; we instead
pass the static mask offset -1 straight into the kernel (ops/mask.py), so
every step is a full-shape, equal-FLOPs causal block — stripe's whole
load-balancing idea. Causal-only (reference asserts, :19-21).

Backward mirrors with the same offset trick (the reference's shifted-buffer
accumulations dq[:,1:] += / dk[:,:-1] +=, reference :168-219) and the
co-rotating fp32 dk/dv accumulator of ring.py.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.flash import block_fwd, block_bwd, compute_delta
from ..ops.mask import MaskArgs
from ..ops.merge import merge_partials
from .mesh import ring_rotate, ring_size, ring_rank


def _stripe_fwd(q, k, v, scale, axis_name, backend, softcap=None):
    M = lambda **kw: MaskArgs(softcap=softcap, **kw)
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    kv = jnp.stack([k, v])
    out = lse = None
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        if step == 0:
            b_out, b_lse = block_fwd(
                q, kk, vv, scale, M(causal=True), backend
            )
            out, lse = merge_partials(None, None, b_out, b_lse)
        else:

            def _behind(args, kk=kk, vv=vv):
                out, lse = args
                b_out, b_lse = block_fwd(
                    q, kk, vv, scale, M(causal=True), backend
                )
                return merge_partials(out, lse, b_out, b_lse)

            def _ahead(args, kk=kk, vv=vv):
                out, lse = args
                b_out, b_lse = block_fwd(
                    q, kk, vv, scale, M(causal=True, offset=-1), backend
                )
                return merge_partials(out, lse, b_out, b_lse)

            out, lse = lax.cond(step <= rank, _behind, _ahead, (out, lse))
        if step < w - 1:
            kv = kv_next
    return out, lse


def _stripe_bwd(q, k, v, out, lse, dout, scale, axis_name, backend,
                softcap=None):
    M = lambda **kw: MaskArgs(softcap=softcap, **kw)
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    delta = compute_delta(dout, out)
    kv = jnp.stack([k, v])
    dq = jnp.zeros(q.shape, jnp.float32)
    dkv = jnp.zeros((2,) + k.shape, jnp.float32)
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]

        if step == 0:
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale,
                M(causal=True), backend,
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
        else:

            def _behind(args, kk=kk, vv=vv):
                dq, dkv = args
                b_dq, b_dk, b_dv = block_bwd(
                    dout, q, kk, vv, lse, delta, scale,
                    M(causal=True), backend,
                )
                return dq + b_dq, dkv + jnp.stack([b_dk, b_dv])

            def _ahead(args, kk=kk, vv=vv):
                dq, dkv = args
                b_dq, b_dk, b_dv = block_bwd(
                    dout, q, kk, vv, lse, delta, scale,
                    M(causal=True, offset=-1), backend,
                )
                return dq + b_dq, dkv + jnp.stack([b_dk, b_dv])

            dq, dkv = lax.cond(step <= rank, _behind, _ahead, (dq, dkv))
        dkv = ring_rotate(dkv, axis_name)
        if step < w - 1:
            kv = kv_next
    return dq, dkv[0], dkv[1]


def stripe_attention(q, k, v, *, scale, axis_name, backend=None,
                     softcap=None):
    """Differentiable stripe attention on per-shard (B,H,S,D) tensors.

    Causal-only. q/k/v must be laid out per extract_local_stripe. Returns
    (out in q.dtype, lse fp32 (B,H,S)).
    """

    @jax.custom_vjp
    def f(q, k, v):
        out, lse = _stripe_fwd(q, k, v, scale, axis_name, backend, softcap)
        return out.astype(q.dtype), lse

    def f_fwd(q, k, v):
        out, lse = _stripe_fwd(q, k, v, scale, axis_name, backend, softcap)
        out = out.astype(q.dtype)
        return (out, lse), (q, k, v, out, lse)

    def f_bwd(res, grads):
        q, k, v, out, lse = res
        dout, _ = grads
        dq, dk, dv = _stripe_bwd(
            q, k, v, out, lse, dout, scale, axis_name, backend, softcap
        )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v)
