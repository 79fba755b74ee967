"""Zigzag ring attention schedule (compute-balanced causal ring).

Re-design of the reference's zigzag_ring_flash_attn.py. Token layout: the
global sequence splits into 2W chunks and rank r holds chunks [r, 2W-1-r]
(reference test/test_zigzag_ring_flash_attn_func.py:9-14). Each step then
does *equal* FLOPs on every rank — the whole load-balancing idea behind
zigzag's ~85-90% roofline vs basic ring's ~52% (reference README.md:82-89):

  step 0:          full local q vs full local kv, plain causal — on the
                   concatenated [chunk r, chunk 2W-1-r] layout this equals
                   the true positional causal mask (reference :64-66)
  1 <= step <= r:  full q vs FIRST half of received kv (all earlier
                   positions), no mask (reference :67-71)
  step > r:        SECOND half of q vs full received kv, no mask, merged
                   into the second half of the accumulator (reference
                   :72-80, the `slice_` merge)

Causal-only (the reference asserts causal, zigzag_ring_flash_attn.py:19).
Backward mirrors the three cases with half-buffer accumulations
(reference :158-195) using the same co-rotating fp32 dk/dv accumulator as
ring.py.

EXTENSIONS: softcap is mask-free and rides every step; ALiBi and
deterministic dropout need true global coordinates, which the zigzag layout
provides in closed form — local token i of rank r sits at global position
r*C + i (first chunk) or (2W-1-r)*C + (i-C) (second chunk), C = L/2. When
either is enabled, every step passes explicit q_pos/kv_pos (of the resident
shard's source rank) so ALiBi distances and the dropout keep-hash are
globally consistent — distributed dropout stays bit-identical to
single-device dropout (see ops/mask.py).
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.flash import block_fwd, block_bwd, compute_delta
from ..ops.mask import MaskArgs
from ..ops.merge import merge_partials
from .mesh import ring_rotate, ring_size, ring_rank


def _zigzag_positions(rk, w, half):
    """Global positions of rank rk's local tokens (chunks [rk, 2W-1-rk])."""
    i = jnp.arange(2 * half, dtype=jnp.int32)
    return jnp.where(i < half, rk * half + i,
                     (2 * w - 1 - rk) * half + (i - half))


def _step_masks(step, rank, w, half, extras):
    """(diag_mask, earlier_mask, later_mask) for this step; explicit global
    positions only when ALiBi/dropout/window demand them."""
    window = extras.get("window_left")
    need_pos = (extras.get("alibi_slopes") is not None
                or extras.get("dropout_p") or window is not None)
    if not need_pos:
        m = lambda **kw: MaskArgs(
            softcap=extras.get("softcap"), dropout_seed=None, **kw)
        return (m(causal=True), m(), m())
    qpos = _zigzag_positions(rank, w, half)
    src = jax.lax.rem(rank - step + w, w)
    kvpos = _zigzag_positions(src, w, half)
    m = lambda **kw: MaskArgs(**extras, **kw)
    # a window must be evaluated on every step; with positions the causal
    # half of the comparison is trivially true off-diagonal, so causal=True
    # there is the identity plus the window bound
    cz = window is not None
    return (
        m(causal=True, q_pos=qpos, kv_pos=qpos),
        m(causal=cz, q_pos=qpos, kv_pos=kvpos[:half]),
        m(causal=cz, q_pos=qpos[half:], kv_pos=kvpos),
    )


def _zigzag_fwd(q, k, v, scale, axis_name, backend, extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    s_local = q.shape[2]
    half = s_local // 2
    kv = jnp.stack([k, v])
    out = lse = None

    for step in range(w):
        # rotate-before-compute: the permute overlaps this step's kernels
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        m_diag, m_earlier, m_later = _step_masks(step, rank, w, half, extras)

        if step == 0:
            b_out, b_lse = block_fwd(q, kk, vv, scale, m_diag, backend)
            out, lse = merge_partials(None, None, b_out, b_lse)
            kv = kv_next
            continue

        def _earlier(args, kk=kk, vv=vv, m=m_earlier):
            # received kv is from an earlier rank: attend full q to its
            # first half (chunk j < chunk r; second half is in the future).
            out, lse = args
            b_out, b_lse = block_fwd(
                q, kk[:, :, :half], vv[:, :, :half], scale, m, backend
            )
            return merge_partials(out, lse, b_out, b_lse)

        def _later(args, kk=kk, vv=vv, m=m_later):
            # received kv is from a later rank: only the second half of q
            # (chunk 2W-1-r, after every received position) attends, to the
            # full received kv; merge into the accumulator's second half.
            out, lse = args
            b_out, b_lse = block_fwd(
                q[:, :, half:], kk, vv, scale, m, backend
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


def _zigzag_bwd(q, k, v, out, lse, dout, scale, axis_name, backend,
                extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    half = q.shape[2] // 2
    delta = compute_delta(dout, out)
    dout1 = dout[:, :, half:]
    q1 = q[:, :, half:]
    lse1 = lse[:, :, half:]
    delta1 = delta[:, :, half:]

    kv = jnp.stack([k, v])
    dq = jnp.zeros(q.shape, jnp.float32)
    dkv = jnp.zeros((2,) + k.shape, jnp.float32)

    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        m_diag, m_earlier, m_later = _step_masks(
            step, rank, w, half, extras
        )

        if step == 0:
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale, m_diag, backend
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
            dkv = ring_rotate(dkv, axis_name)
            kv = kv_next
            continue

        def _earlier(args, kk=kk, vv=vv, m=m_earlier):
            dq, dkv = args
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk[:, :, :half], vv[:, :, :half], lse, delta,
                scale, m, backend,
            )
            dkv_half = dkv[:, :, :, :half] + jnp.stack([b_dk, b_dv])
            dkv = lax.dynamic_update_slice_in_dim(dkv, dkv_half, 0, axis=3)
            return dq + b_dq, dkv

        def _later(args, kk=kk, vv=vv, m=m_later):
            dq, dkv = args
            b_dq, b_dk, b_dv = block_bwd(
                dout1, q1, kk, vv, lse1, delta1, scale, m, backend
            )
            dq_half = dq[:, :, half:] + b_dq
            dq = lax.dynamic_update_slice_in_dim(dq, dq_half, half, axis=2)
            return dq, dkv + jnp.stack([b_dk, b_dv])

        dq, dkv = lax.cond(step <= rank, _earlier, _later, (dq, dkv))
        dkv = ring_rotate(dkv, axis_name)
        kv = kv_next
    return dq, dkv[0], dkv[1]


def zigzag_ring_attention(q, k, v, *, scale, axis_name, backend=None,
                          softcap=None, alibi_slopes=None, dropout_p=None,
                          dropout_seed=None, window_left=None,
                          head_offset=None):
    """Differentiable zigzag ring attention on per-shard (B,H,S,D) tensors.

    Causal-only. q/k/v must be laid out per extract_local_zigzag. Returns
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
        out, lse = _zigzag_fwd(q, k, v, scale, axis_name, backend,
                               dict(base, dropout_seed=seed))
        return out.astype(q.dtype), lse

    def f_fwd(q, k, v, seed):
        out, lse = _zigzag_fwd(q, k, v, scale, axis_name, backend,
                               dict(base, dropout_seed=seed))
        out = out.astype(q.dtype)
        return (out, lse), (q, k, v, seed, out, lse)

    def f_bwd(res, grads):
        q, k, v, seed, out, lse = res
        dout, _ = grads
        dq, dk, dv = _zigzag_bwd(
            q, k, v, out, lse, dout, scale, axis_name, backend,
            dict(base, dropout_seed=seed),
        )
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                None)

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v, seed)
