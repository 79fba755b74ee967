"""Attention-mask specification shared by all block-kernel backends.

The reference library never owns a mask: it drives flash-attn's `causal`
flag per ring step and realizes the zigzag/stripe/llama3 geometry by slicing
tensors (e.g. stripe's off-by-one `q[:,1:]` vs `k[:,:-1]`,
reference stripe_flash_attn.py:63-93, or llama3's clipped `cu_seqlens_k`,
reference llama3_flash_attn_varlen.py:44-48). On TPU, slicing to odd shapes
breaks tiling, so we instead parameterize the kernel's mask:

- ``causal``        (static bool): enable position comparison at all.
- ``offset``        (static int or traced scalar): attend iff
                    ``iq + offset >= ik``. offset=0 is plain causal;
                    offset=-1 is stripe's shifted diagonal; offset=rank*L is
                    llama3's global-position causal vs a gathered KV.
- ``q_pos/kv_pos``  ((Sq,)/(Skv,) int32): explicit global positions; attend
                    iff ``q_pos[iq] >= kv_pos[ik]``. Subsumes `offset` for
                    varlen layouts where per-token positions are irregular
                    (zigzag-varlen chunk interleaving).
- ``q_segids/kv_segids`` ((Sq,)/(Skv,) int32): varlen packing — attend only
                    within the same segment. Replaces the reference's
                    cu_seqlens plumbing at the kernel boundary
                    (reference ring_flash_attn_varlen.py:56-59).

All fields are optional and combinable; `None` means "no constraint".

MaskArgs also carries the static logit transform ``softcap`` (Gemma-2 style
tanh capping, ``s -> softcap * tanh(s / softcap)`` applied after the softmax
scale, before masking). flash-attn supports softcap natively; the reference
forcibly zeroes it (reference utils.py:19-20) — supporting it here is a
capability extension.
"""

from typing import NamedTuple, Optional, Any

import jax.numpy as jnp
from jax import lax

# Sentinel for masked logits. NOT -inf: fully-masked rows then yield
# lse ≈ NEG_INF + log(n), which merge_partials() treats as weight-zero
# without ever producing NaNs (sigmoid/exp underflow to exactly 0).
NEG_INF = -1e30


class MaskArgs(NamedTuple):
    causal: bool = False
    offset: Optional[Any] = None  # int (static) or traced int32 scalar
    q_segids: Optional[Any] = None
    kv_segids: Optional[Any] = None
    q_pos: Optional[Any] = None
    kv_pos: Optional[Any] = None
    # sliding window: attend only kv with q_position - kv_position <
    # window_left (static int, None = unlimited). flash-attn's
    # window_size[0]; combined with `causal`.
    window_left: Optional[int] = None
    # tanh logit capping: s -> softcap * tanh(s / softcap) (static float,
    # None/0 = disabled). Applied to scaled logits before masking.
    softcap: Optional[float] = None
    # ALiBi per-query-head slopes ((Hq,) f32 array, None = disabled): adds
    # bias -slope * (q_pos - kv_pos) (causal) / -slope * |q_pos - kv_pos|
    # (non-causal) to the capped logits. Positions come from q_pos/kv_pos
    # when given, else iota + offset — so the same `offset` that encodes a
    # ring step's global shift also makes ALiBi globally consistent across
    # ring steps. (The reference asserts alibi_slopes is None,
    # reference ring_flash_attn.py:176 — this is a capability extension.)
    alibi_slopes: Optional[Any] = None

    @property
    def has_position_mask(self):
        return self.causal

    @property
    def has_segment_mask(self):
        return self.q_segids is not None


def allowed_mask(mask: MaskArgs, sq: int, skv: int):
    """Dense bool (Sq, Skv) mask, or None if unconstrained. XLA-backend path."""
    allowed = None
    if mask.causal:
        if mask.q_pos is not None:
            qp = mask.q_pos.astype(jnp.int32)
            kp = mask.kv_pos.astype(jnp.int32)
        else:
            qp = lax.iota(jnp.int32, sq)
            kp = lax.iota(jnp.int32, skv)
            if mask.offset is not None:
                qp = qp + mask.offset
        allowed = qp[:, None] >= kp[None, :]
        if mask.window_left is not None:
            allowed &= (qp[:, None] - kp[None, :]) <= mask.window_left
    if mask.q_segids is not None:
        seg = mask.q_segids.astype(jnp.int32)[:, None] == mask.kv_segids.astype(
            jnp.int32
        )[None, :]
        allowed = seg if allowed is None else (allowed & seg)
    return allowed


def mask_logits(scores, mask: MaskArgs):
    """Apply the mask to a (..., Sq, Skv) score tensor with the NEG_INF sentinel."""
    allowed = allowed_mask(mask, scores.shape[-2], scores.shape[-1])
    if allowed is None:
        return scores
    return jnp.where(allowed, scores, NEG_INF)


def position_diff(mask: MaskArgs, sq: int, skv: int):
    """(Sq, Skv) int32 q_pos - kv_pos matrix per the mask's position model."""
    if mask.q_pos is not None:
        qp = mask.q_pos.astype(jnp.int32)
        kp = mask.kv_pos.astype(jnp.int32)
    else:
        qp = lax.iota(jnp.int32, sq)
        kp = lax.iota(jnp.int32, skv)
        if mask.offset is not None:
            qp = qp + mask.offset
    return qp[:, None] - kp[None, :]


def alibi_bias(mask: MaskArgs, hkv: int, group: int, sq: int, skv: int):
    """(Hkv, G, Sq, Skv) f32 ALiBi bias, or None. XLA-backend path."""
    if mask.alibi_slopes is None:
        return None
    dist = position_diff(mask, sq, skv).astype(jnp.float32)
    if not mask.causal:
        dist = jnp.abs(dist)
    slopes = jnp.asarray(mask.alibi_slopes, jnp.float32).reshape(
        hkv, group, 1, 1
    )
    return -slopes * dist
