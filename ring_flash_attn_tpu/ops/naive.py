"""Pure-jnp (XLA) block attention fwd/bwd with the flash (out, lse) contract.

This is the portable backend: it computes the same quantities as the Pallas
TPU kernels — fp32 accumulation, per-row log-sum-exp, NEG_INF sentinel
masking — with O(Sq*Skv) memory, which is fine for the CPU-mesh tests and
small shapes. Interface mirrors the reference's use of flash-attn's private
entry points: fwd returns ``(out_f32, lse_f32)``
(reference ring_flash_attn.py:53-58), bwd takes ``(dout, q, k, v, lse,
delta)`` and returns per-block ``(dq, dk, dv)`` in fp32
(reference ring_flash_attn.py:103-131; delta = rowsum(dout*out) is
recomputed once by the caller instead of per flash-bwd call).

Shapes (internal layout, MXU-friendly):
  q:    (B, Hq,  Sq,  D)
  k, v: (B, Hkv, Skv, D)   with Hq % Hkv == 0 (GQA)
  out:  (B, Hq,  Sq,  D) fp32
  lse:  (B, Hq,  Sq)     fp32
"""

import jax.numpy as jnp
from jax import lax

from .mask import (
    MaskArgs,
    NEG_INF,
    alibi_bias,
    dropout_keep,
    dropout_row_hash,
    dropout_threshold,
    mask_logits,
    positions,
)


def _dropout_keep_dense(mask: MaskArgs, b, hkv, g, sq, skv):
    """(b, hkv, g, sq, skv) bool keep-mask, or None — bit-identical to the
    Pallas kernels' in-block hash (same ops, same inputs)."""
    if not mask.dropout_p:
        return None
    qp, kp = positions(mask, sq, skv)
    seed = jnp.asarray(
        0 if mask.dropout_seed is None else mask.dropout_seed, jnp.int32
    )
    heads = lax.iota(jnp.int32, hkv * g).reshape(hkv, g)
    if mask.head_offset is not None:
        heads = heads + mask.head_offset
    batches = lax.iota(jnp.int32, b)
    qseg = None if mask.q_segids is None else jnp.asarray(
        mask.q_segids, jnp.int32
    )
    rh = dropout_row_hash(
        qp[None, None, None, :],
        None if qseg is None else qseg[None, None, None, :],
        heads[None, :, :, None],
        batches[:, None, None, None],
        seed,
    )  # (b, hkv, g, sq) uint32
    return dropout_keep(
        rh[..., None], kp[None, None, None, None, :],
        dropout_threshold(mask.dropout_p),
    )


def _grouped(q, hkv):
    b, hq, sq, d = q.shape
    return q.reshape(b, hkv, hq // hkv, sq, d)


def naive_block_fwd(q, k, v, scale, mask: MaskArgs):
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    qf = _grouped(q.astype(jnp.float32), hkv)
    s = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qf, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    if mask.softcap:
        s = mask.softcap * jnp.tanh(s / mask.softcap)
    bias = alibi_bias(mask, hkv, hq // hkv, sq, skv)
    if bias is not None:
        s = s + bias
    s = mask_logits(s, mask)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    keep = _dropout_keep_dense(mask, b, hkv, hq // hkv, sq, skv)
    p_v = p
    if keep is not None:
        # dropout on the normalized probabilities: l stays undropped
        p_v = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - mask.dropout_p))
    out = jnp.einsum(
        "bhgqk,bhkd->bhgqd", p_v, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / l
    lse = (m + jnp.log(l)).squeeze(-1)
    # Rows whose every key is masked ("dead" rows, e.g. stripe's shifted row
    # 0) are normalized to out=0 / lse=NEG_INF so all backends agree bit-wise
    # on a value that merge_partials treats as weight-zero.
    dead = m <= NEG_INF / 2
    out = jnp.where(dead, 0.0, out)
    lse = jnp.where(dead.squeeze(-1), NEG_INF, lse)
    return out.reshape(b, hq, sq, d), lse.reshape(b, hq, sq)


def naive_block_bwd(dout, q, k, v, lse, delta, scale, mask: MaskArgs):
    """Returns (dq, dk, dv) fp32; dk/dv already reduced over the GQA group.

    p is recomputed from the *merged* lse (flash backward recomputation):
    p = exp(q@k^T * scale - lse); dv = p^T dout; ds = p*(dp - delta)*scale;
    dq = ds@k; dk = ds^T@q. Matches the per-block contract of
    reference _flash_attn_backward (ring_flash_attn.py:103-131).
    """
    b, hq, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    g = hq // hkv
    qf = _grouped(q.astype(jnp.float32), hkv)
    doutf = _grouped(dout.astype(jnp.float32), hkv)
    # Dead rows carry lse = NEG_INF; clamping to NEG_INF/2 makes
    # p = exp(NEG_INF - NEG_INF/2) underflow to 0 so they contribute no
    # gradient (instead of exp(0)=1 garbage). Live rows are unaffected.
    lse = jnp.maximum(lse, NEG_INF / 2)
    lsef = lse.astype(jnp.float32).reshape(b, hkv, g, sq, 1)
    deltaf = delta.astype(jnp.float32).reshape(b, hkv, g, sq, 1)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    s = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qf, kf, preferred_element_type=jnp.float32
    ) * scale
    if mask.softcap:
        # s_cap = cap * tanh(s / cap); d s_cap/d s = 1 - tanh^2 = 1 - (s_cap/cap)^2
        t = jnp.tanh(s / mask.softcap)
        s = mask.softcap * t
        dcap = 1.0 - t * t
    bias = alibi_bias(mask, hkv, g, sq, skv)
    if bias is not None:
        # additive bias: p is recomputed with it; ds is unchanged
        s = s + bias
    s = mask_logits(s, mask)
    p = jnp.exp(s - lsef)
    keep = _dropout_keep_dense(mask, b, hkv, g, sq, skv)
    p_v = p
    if keep is not None:
        inv = 1.0 / (1.0 - mask.dropout_p)
        p_v = jnp.where(keep, p, 0.0) * inv
    dv = jnp.einsum("bhgqk,bhgqd->bhkd", p_v, doutf, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhgqd,bhkd->bhgqk", doutf, vf, preferred_element_type=jnp.float32)
    if keep is not None:
        dp = jnp.where(keep, dp, 0.0) * inv
    ds = p * (dp - deltaf) * scale
    if mask.softcap:
        ds = ds * dcap
    dq = jnp.einsum("bhgqk,bhkd->bhgqd", ds, kf, preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhgqk,bhgqd->bhkd", ds, qf, preferred_element_type=jnp.float32)
    return dq.reshape(b, hq, sq, d), dk, dv
