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

EXTENSIONS: softcap rides every step; ALiBi and deterministic dropout use
the stripe layout's closed-form global positions (token i of rank r sits at
global i*W + r), passed as explicit q_pos/kv_pos — which also subsumes both
offset variants (positional causal is exact at every step). Distributed
dropout stays bit-identical to single-device dropout (ops/mask.py).
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.flash import block_fwd, block_bwd, compute_delta
from ..ops.mask import MaskArgs
from ..ops.merge import merge_partials
from .mesh import ring_rotate, ring_size, ring_rank


def _stripe_positions(rk, w, l_local):
    """Global positions of rank rk's strided tokens (token i at i*W + rk)."""
    return jnp.arange(l_local, dtype=jnp.int32) * w + rk


def _step_masks(step, rank, w, l_local, extras):
    """(behind_mask, ahead_mask) for this step. With ALiBi/dropout on,
    explicit global positions subsume the offset trick (positional causal
    is exact in both cases)."""
    need_pos = (extras.get("alibi_slopes") is not None
                or extras.get("dropout_p")
                or extras.get("window_left") is not None)
    if not need_pos:
        m = lambda **kw: MaskArgs(
            softcap=extras.get("softcap"), dropout_seed=None, **kw)
        return m(causal=True), m(causal=True, offset=-1)
    qpos = _stripe_positions(rank, w, l_local)
    src = jax.lax.rem(rank - step + w, w)
    kvpos = _stripe_positions(src, w, l_local)
    m = MaskArgs(causal=True, q_pos=qpos, kv_pos=kvpos, **extras)
    return m, m


def _stripe_fwd(q, k, v, scale, axis_name, backend, extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    l_local = q.shape[2]
    kv = jnp.stack([k, v])
    out = lse = None
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        m_behind, m_ahead = _step_masks(step, rank, w, l_local, extras)
        if step == 0:
            b_out, b_lse = block_fwd(q, kk, vv, scale, m_behind, backend)
            out, lse = merge_partials(None, None, b_out, b_lse)
        else:

            def _behind(args, kk=kk, vv=vv, m=m_behind):
                out, lse = args
                b_out, b_lse = block_fwd(q, kk, vv, scale, m, backend)
                return merge_partials(out, lse, b_out, b_lse)

            def _ahead(args, kk=kk, vv=vv, m=m_ahead):
                out, lse = args
                b_out, b_lse = block_fwd(q, kk, vv, scale, m, backend)
                return merge_partials(out, lse, b_out, b_lse)

            out, lse = lax.cond(step <= rank, _behind, _ahead, (out, lse))
        if step < w - 1:
            kv = kv_next
    return out, lse


def _stripe_bwd(q, k, v, out, lse, dout, scale, axis_name, backend,
                extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    l_local = q.shape[2]
    delta = compute_delta(dout, out)
    kv = jnp.stack([k, v])
    dq = jnp.zeros(q.shape, jnp.float32)
    dkv = jnp.zeros((2,) + k.shape, jnp.float32)
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        m_behind, m_ahead = _step_masks(step, rank, w, l_local, extras)

        if step == 0:
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale, m_behind, backend
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
        else:

            def _behind(args, kk=kk, vv=vv, m=m_behind):
                dq, dkv = args
                b_dq, b_dk, b_dv = block_bwd(
                    dout, q, kk, vv, lse, delta, scale, m, backend
                )
                return dq + b_dq, dkv + jnp.stack([b_dk, b_dv])

            def _ahead(args, kk=kk, vv=vv, m=m_ahead):
                dq, dkv = args
                b_dq, b_dk, b_dv = block_bwd(
                    dout, q, kk, vv, lse, delta, scale, m, backend
                )
                return dq + b_dq, dkv + jnp.stack([b_dk, b_dv])

            dq, dkv = lax.cond(step <= rank, _behind, _ahead, (dq, dkv))
        dkv = ring_rotate(dkv, axis_name)
        if step < w - 1:
            kv = kv_next
    return dq, dkv[0], dkv[1]


def stripe_attention(q, k, v, *, scale, axis_name, backend=None,
                     softcap=None, alibi_slopes=None, dropout_p=None,
                     dropout_seed=None, window_left=None,
                     head_offset=None):
    """Differentiable stripe attention on per-shard (B,H,S,D) tensors.

    Causal-only. q/k/v must be laid out per extract_local_stripe. Returns
    (out in q.dtype, lse fp32 (B,H,S)).
    """

    base = dict(softcap=softcap, alibi_slopes=alibi_slopes,
                dropout_p=dropout_p, window_left=window_left,
                head_offset=head_offset)
    seed = jnp.asarray(
        0 if dropout_seed is None else dropout_seed, jnp.int32
    )

    @jax.custom_vjp
    def f(q, k, v, seed):
        out, lse = _stripe_fwd(q, k, v, scale, axis_name, backend,
                               dict(base, dropout_seed=seed))
        return out.astype(q.dtype), lse

    def f_fwd(q, k, v, seed):
        out, lse = _stripe_fwd(q, k, v, scale, axis_name, backend,
                               dict(base, dropout_seed=seed))
        out = out.astype(q.dtype)
        return (out, lse), (q, k, v, seed, out, lse)

    def f_bwd(res, grads):
        q, k, v, seed, out, lse = res
        dout, _ = grads
        dq, dk, dv = _stripe_bwd(
            q, k, v, out, lse, dout, scale, axis_name, backend,
            dict(base, dropout_seed=seed),
        )
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                None)

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v, seed)
