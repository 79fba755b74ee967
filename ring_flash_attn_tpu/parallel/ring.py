"""Basic ring attention schedule (TPU-native).

Re-design of the reference's ring_flash_attn.py: W-step ring where KV
rotates to the next rank each step while the local block is computed
(reference ring_flash_attn.py:26-63). Causal work-skipping: rank r computes
at steps 0..r only, with the diagonal (step 0) as the only causal block
(reference :30,39).

Backward runs the dual-ring scheme: kv rotates forward while the dk/dv
accumulator co-rotates with it, so each kv shard's gradient accumulates in
flight and arrives home after a full circle — the ppermute analog of the
reference's counter-accumulating d_kv_comm (reference :85-152). dk/dv ride
the ring in fp32 (the reference accumulates in the input dtype and documents
the resulting bf16 error, README.md:152; we spend 2x wire bytes for exact
fp32 accumulation).

All functions here are per-shard: call them inside shard_map over the ring
mesh axis, with q/k/v already sequence-sharded (layout: contiguous chunks).
Internal tensor layout is (B, H, S, D).
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.flash import block_fwd, block_bwd, compute_delta
from ..ops.mask import MaskArgs
from ..ops.merge import merge_partials
from .mesh import ring_rotate, ring_size, ring_rank


def _ring_fwd(q, k, v, scale, causal, axis_name, backend, softcap=None,
              alibi_slopes=None):
    M = lambda **kw: MaskArgs(softcap=softcap, alibi_slopes=alibi_slopes, **kw)
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    kv = jnp.stack([k, v])
    out = lse = None
    for step in range(w):
        # Issue the rotation before computing on the resident block: the
        # collective-permute overlaps with this step's kernels (the permuted
        # value is first consumed next step) — the reference's commit()/
        # wait() overlap (reference ring_flash_attn.py:28,61).
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        # global shift of local q positions vs the resident kv shard (from
        # rank (r-step) mod W) — only ALiBi needs it on mask-free steps
        off = (
            (rank - (rank - step) % w) * k.shape[2]
            if alibi_slopes is not None else None
        )
        if step == 0:
            b_out, b_lse = block_fwd(
                q, kk, vv, scale, M(causal=causal), backend
            )
            out, lse = merge_partials(None, None, b_out, b_lse)
        elif not causal:
            b_out, b_lse = block_fwd(q, kk, vv, scale, M(offset=off), backend)
            out, lse = merge_partials(out, lse, b_out, b_lse)
        else:
            # causal: the kv resident at step s came from rank r-s; ranks
            # only attend to earlier shards => compute iff step <= rank
            # (reference :30).
            def _compute(args, kk=kk, vv=vv, off=off):
                out, lse = args
                b_out, b_lse = block_fwd(
                    q, kk, vv, scale, M(offset=off), backend
                )
                return merge_partials(out, lse, b_out, b_lse)

            out, lse = lax.cond(step <= rank, _compute, lambda a: a, (out, lse))
        if kv_next is not None:
            kv = kv_next
    return out, lse


def _ring_bwd(q, k, v, out, lse, dout, scale, causal, axis_name, backend,
              softcap=None, alibi_slopes=None):
    M = lambda **kw: MaskArgs(softcap=softcap, alibi_slopes=alibi_slopes, **kw)
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    delta = compute_delta(dout, out)
    kv = jnp.stack([k, v])
    dq = jnp.zeros(q.shape, jnp.float32)
    # dk/dv accumulator co-rotates with kv: after W rotations it is home
    # with every rank's contribution for that kv shard on board.
    dkv = jnp.zeros((2,) + k.shape, jnp.float32)
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        off = (
            (rank - (rank - step) % w) * k.shape[2]
            if alibi_slopes is not None else None
        )
        if step == 0:
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale,
                M(causal=causal), backend,
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
        elif not causal:
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale, M(offset=off), backend
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
        else:

            def _compute(args, kk=kk, vv=vv, off=off):
                dq, dkv = args
                b_dq, b_dk, b_dv = block_bwd(
                    dout, q, kk, vv, lse, delta, scale, M(offset=off), backend
                )
                return dq + b_dq, dkv + jnp.stack([b_dk, b_dv])

            dq, dkv = lax.cond(step <= rank, _compute, lambda a: a, (dq, dkv))
        # dkv rotates after every step (W total) so each accumulator makes a
        # full circle back to its kv shard's home rank.
        dkv = ring_rotate(dkv, axis_name)
        if kv_next is not None:
            kv = kv_next
    return dq, dkv[0], dkv[1]


def ring_attention(q, k, v, *, scale, causal, axis_name, backend=None,
                   softcap=None, alibi_slopes=None):
    """Differentiable basic ring attention on per-shard (B,H,S,D) tensors.

    Must be called inside shard_map with q/k/v sharded contiguously along S
    over `axis_name`. Returns (out in q.dtype, lse fp32 (B,H,S)).
    """

    @jax.custom_vjp
    def f(q, k, v):
        out, lse = _ring_fwd(q, k, v, scale, causal, axis_name, backend,
                             softcap, alibi_slopes)
        return out.astype(q.dtype), lse

    def f_fwd(q, k, v):
        out, lse = _ring_fwd(q, k, v, scale, causal, axis_name, backend,
                             softcap, alibi_slopes)
        out = out.astype(q.dtype)
        return (out, lse), (q, k, v, out, lse)

    def f_bwd(res, grads):
        q, k, v, out, lse = res
        dout, _ = grads
        dq, dk, dv = _ring_bwd(
            q, k, v, out, lse, dout, scale, causal, axis_name, backend,
            softcap, alibi_slopes,
        )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v)
