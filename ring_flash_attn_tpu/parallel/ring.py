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

EXTENSIONS over the reference carried by the mask spec: softcap, ALiBi, and
deterministic dropout. ALiBi/dropout need true global coordinates, so those
steps pass absolute offsets (q at rank*L, resident kv at src*L where
src = (rank - step) mod W) — which makes distributed dropout bit-identical
to single-device dropout (the reference documents dropout as unsupported,
README.md:158).

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


def _step_mask(step, rank, w, l_kv, causal, extras):
    """MaskArgs for ring step `step`. Position-dependent extras (ALiBi,
    dropout, sliding window) force global coordinates; otherwise offsets
    stay None so the diagonal step keeps its static triangular grid.

    A causal sliding window needs the position comparison on EVERY step
    (the resident shard may be partially out of window), so those steps
    carry causal=True with the step's global offset — the causal half of
    the mask is then trivially true (all resident kv is earlier) and only
    the window bound bites. A NON-causal window (r5: the reference
    forwards arbitrary window_size on its batch paths, reference
    ring_flash_attn.py:44-52) needs both absolute offsets so the kernel
    sees the true signed q-kv distance of the resident shard."""
    kw = dict(extras)
    wl = kw.pop("window_left", None)
    wr = kw.pop("window_right", None)
    need_abs = kw.get("alibi_slopes") is not None or kw.get("dropout_p")
    if need_abs or (not causal and (wl is not None or wr is not None)):
        qo = rank * l_kv
        # diagonal step: pass the SAME traced object for both offsets so
        # mask_info proves rel == 0 and keeps the triangular causal grid
        ko = qo if step == 0 else ((rank - step) % w) * l_kv
        kw.update(offset=qo, kv_offset=ko)
    if wl is not None or wr is not None:
        if causal:
            kw.update(window_left=wl)
            if not need_abs and step > 0:
                kw.update(offset=(rank - (rank - step) % w) * l_kv)
            return MaskArgs(causal=True, **kw)
        kw.update(window_left=wl, window_right=wr)
        return MaskArgs(causal=False, **kw)
    return MaskArgs(causal=causal and step == 0, **kw)


def _window_skip(step, l_kv, causal, extras):
    """True when ring step `step`'s resident shard is entirely outside a
    CAUSAL sliding window (min q-kv distance = step*L - (L-1)) — static,
    so the whole block call is pruned at trace time (rotations still
    run). Non-causal windows skip via `_window_need` instead (the signed
    shard distance depends on the traced rank: steps past the rank hold
    kv from LATER shards, so the step index alone says nothing)."""
    wl = extras.get("window_left")
    return (
        causal and wl is not None and step > 0
        and step * l_kv - (l_kv - 1) > wl
    )


def _window_need(step, rank, w, l_kv, extras):
    """Traced predicate: does the resident shard at ring step `step`
    intersect a non-causal (left, right) window? The shard's signed
    offset is (rank - src)*L with src = (rank - step) % w — rank-traced,
    so out-of-window steps prune via lax.cond at run time."""
    wl = extras.get("window_left")
    wr = extras.get("window_right")
    if (wl is None and wr is None) or step == 0:
        return None  # statically needed
    rel = (rank - (rank - step) % w) * l_kv
    need = True
    if wl is not None:
        need = jnp.logical_and(need, rel - (l_kv - 1) <= wl)
    if wr is not None:
        need = jnp.logical_and(need, rel + (l_kv - 1) >= -wr)
    return None if need is True else need


def _ring_fwd(q, k, v, scale, causal, axis_name, backend, extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    l_kv = k.shape[2]
    kv = jnp.stack([k, v])
    out = lse = None
    for step in range(w):
        # Issue the rotation before computing on the resident block: the
        # collective-permute overlaps with this step's kernels (the permuted
        # value is first consumed next step) — the reference's commit()/
        # wait() overlap (reference ring_flash_attn.py:28,61).
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        if _window_skip(step, l_kv, causal, extras):
            if kv_next is not None:
                kv = kv_next
            continue
        mask = _step_mask(step, rank, w, l_kv, causal, extras)
        if step == 0:
            b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
            out, lse = merge_partials(None, None, b_out, b_lse)
        elif not causal:
            need = _window_need(step, rank, w, l_kv, extras)
            if need is None:
                b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
                out, lse = merge_partials(out, lse, b_out, b_lse)
            else:
                # non-causal window: prune shards whose signed distance
                # is rank-dependent (traced) at run time
                def _compute(args, kk=kk, vv=vv, mask=mask):
                    out, lse = args
                    b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
                    return merge_partials(out, lse, b_out, b_lse)

                out, lse = lax.cond(need, _compute, lambda a: a, (out, lse))
        else:
            # causal: the kv resident at step s came from rank r-s; ranks
            # only attend to earlier shards => compute iff step <= rank
            # (reference :30).
            def _compute(args, kk=kk, vv=vv, mask=mask):
                out, lse = args
                b_out, b_lse = block_fwd(q, kk, vv, scale, mask, backend)
                return merge_partials(out, lse, b_out, b_lse)

            out, lse = lax.cond(step <= rank, _compute, lambda a: a, (out, lse))
        if kv_next is not None:
            kv = kv_next
    return out, lse


def _ring_bwd(q, k, v, out, lse, dout, scale, causal, axis_name, backend,
              extras):
    w = ring_size(axis_name)
    rank = ring_rank(axis_name)
    l_kv = k.shape[2]
    delta = compute_delta(dout, out)
    kv = jnp.stack([k, v])
    dq = jnp.zeros(q.shape, jnp.float32)
    # dk/dv accumulator co-rotates with kv: after W rotations it is home
    # with every rank's contribution for that kv shard on board.
    dkv = jnp.zeros((2,) + k.shape, jnp.float32)
    for step in range(w):
        kv_next = ring_rotate(kv, axis_name) if step < w - 1 else None
        kk, vv = kv[0], kv[1]
        if _window_skip(step, l_kv, causal, extras):
            # out-of-window shard: no gradient contribution, but the dkv
            # accumulator must still make its full circle
            dkv = ring_rotate(dkv, axis_name)
            if kv_next is not None:
                kv = kv_next
            continue
        mask = _step_mask(step, rank, w, l_kv, causal, extras)
        need = None if causal else _window_need(step, rank, w, l_kv, extras)
        if step == 0 or (not causal and need is None):
            b_dq, b_dk, b_dv = block_bwd(
                dout, q, kk, vv, lse, delta, scale, mask, backend
            )
            dq = dq + b_dq
            dkv = dkv + jnp.stack([b_dk, b_dv])
        elif not causal:

            def _compute_w(args, kk=kk, vv=vv, mask=mask):
                dq, dkv = args
                b_dq, b_dk, b_dv = block_bwd(
                    dout, q, kk, vv, lse, delta, scale, mask, backend
                )
                return dq + b_dq, dkv + jnp.stack([b_dk, b_dv])

            dq, dkv = lax.cond(need, _compute_w, lambda a: a, (dq, dkv))
        else:

            def _compute(args, kk=kk, vv=vv, mask=mask):
                dq, dkv = args
                b_dq, b_dk, b_dv = block_bwd(
                    dout, q, kk, vv, lse, delta, scale, mask, backend
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
                   softcap=None, alibi_slopes=None, dropout_p=None,
                   dropout_seed=None, window_left=None, window_right=None,
                   head_offset=None):
    """Differentiable basic ring attention on per-shard (B,H,S,D) tensors.

    Must be called inside shard_map with q/k/v sharded contiguously along S
    over `axis_name`. Returns (out in q.dtype, lse fp32 (B,H,S)).

    Windows: causal paths take window_left (window_right is capped at 0 by
    causality); non-causal paths take the full (left, right) pair — the
    reference forwards arbitrary window_size on its batch ring
    (ring_flash_attn.py:44-52).
    """
    if window_right is not None and causal:
        window_right = None  # causality already caps the right side at 0
    base = dict(softcap=softcap, alibi_slopes=alibi_slopes,
                dropout_p=dropout_p, window_left=window_left,
                window_right=window_right, head_offset=head_offset)
    # the seed may be a tracer (per-step training seeds), which custom_vjp
    # can't close over — it rides as an explicit zero-cotangent argument
    seed = jnp.asarray(
        0 if dropout_seed is None else dropout_seed, jnp.int32
    )

    @jax.custom_vjp
    def f(q, k, v, seed):
        out, lse = _ring_fwd(q, k, v, scale, causal, axis_name, backend,
                             dict(base, dropout_seed=seed))
        return out.astype(q.dtype), lse

    def f_fwd(q, k, v, seed):
        out, lse = _ring_fwd(q, k, v, scale, causal, axis_name, backend,
                             dict(base, dropout_seed=seed))
        out = out.astype(q.dtype)
        return (out, lse), (q, k, v, seed, out, lse)

    def f_bwd(res, grads):
        q, k, v, seed, out, lse = res
        dout, _ = grads
        dq, dk, dv = _ring_bwd(
            q, k, v, out, lse, dout, scale, causal, axis_name, backend,
            dict(base, dropout_seed=seed),
        )
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                None)

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v, seed)
