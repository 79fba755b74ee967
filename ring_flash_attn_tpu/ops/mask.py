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
    # absolute position of kv index 0 (int or traced int32; None = 0). The
    # causal comparison only sees offset - kv_offset, but dropout and any
    # future absolute-position feature need true coordinates: a ring step
    # passes offset=rank*L, kv_offset=src*L.
    kv_offset: Optional[Any] = None
    q_segids: Optional[Any] = None
    kv_segids: Optional[Any] = None
    q_pos: Optional[Any] = None
    kv_pos: Optional[Any] = None
    # sliding window: attend only kv with q_position - kv_position <=
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
    # Deterministic dropout on the attention probabilities (an EXTENSION —
    # the reference documents dropout as unsupported because torch rng
    # states are hard to carry across ring steps, reference README.md:158).
    # The keep decision for element (i, j) is a pure stateless hash of
    # (absolute q position, absolute kv position, q segment, head, batch,
    # seed), so it is identical across block shapes, forward and backward
    # kernels, backends, and ring steps — which is what makes distributed
    # dropout == single-device dropout, exactly.
    dropout_p: Optional[float] = None  # static; None/0 = disabled
    dropout_seed: Optional[Any] = None  # int or traced int32 scalar
    # global index of q head 0 (int or traced; None = 0). Head-sharded
    # schedules (Ulysses A2A) pass rank * Hq/W so the dropout hash and
    # ALiBi slope indexing see GLOBAL head ids.
    head_offset: Optional[Any] = None
    # STATIC layout hint for causal varlen: q and kv are the SAME packed
    # array (self-attention) and positions strictly increase along packed
    # order WITHIN each segment (runs need not be contiguous — the grouped
    # zigzag halves qualify). Then any allowed pair
    # (q_pos >= kv_pos AND same segment) satisfies packed-index i >= j, so
    # the kernels may enumerate the (q-block, kv-block) pair space
    # triangularly — the varlen analog of the static-offset causal grid.
    # Every layout this framework constructs from cu_seqlens qualifies
    # (single-chip packing, ring/zigzag-grouped diagonal steps). Purely an
    # optimization hint: results are identical, but a layout violating the
    # contract (e.g. q and kv packed differently) would silently drop
    # blocks — the *_varlen_info helpers and the api layer set it only
    # where the contract holds by construction.
    packed_self: bool = False
    # right half of a bidirectional sliding window (flash-attn's
    # window_size[1] for causal=False): attend only kv with
    # kv_position - q_position <= window_right (static int, None =
    # unlimited). Ignored when causal=True (causality already bounds the
    # right side at 0). Non-causal windows are a single-device-path
    # feature, matching flash-attn's (l, r) semantics
    # (reference ring_flash_attn.py:44-52 forwards window_size verbatim).
    window_right: Optional[int] = None

    @property
    def has_position_mask(self):
        return self.causal

    @property
    def has_window(self):
        return self.window_left is not None or (
            self.window_right is not None and not self.causal
        )

    @property
    def has_segment_mask(self):
        return self.q_segids is not None


def allowed_mask(mask: MaskArgs, sq: int, skv: int):
    """Dense bool (Sq, Skv) mask, or None if unconstrained. XLA-backend path."""
    allowed = None
    if mask.causal or mask.has_window:
        qp, kp = positions(mask, sq, skv)
        diff = qp[:, None] - kp[None, :]
        if mask.causal:
            allowed = diff >= 0
        if mask.window_left is not None:
            c = diff <= mask.window_left
            allowed = c if allowed is None else (allowed & c)
        if mask.window_right is not None and not mask.causal:
            c = diff >= -mask.window_right
            allowed = c if allowed is None else (allowed & c)
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


def positions(mask: MaskArgs, sq: int, skv: int):
    """((Sq,), (Skv,)) int32 absolute positions per the mask's model."""
    if mask.q_pos is not None:
        return mask.q_pos.astype(jnp.int32), mask.kv_pos.astype(jnp.int32)
    qp = lax.iota(jnp.int32, sq)
    kp = lax.iota(jnp.int32, skv)
    if mask.offset is not None:
        qp = qp + mask.offset
    if mask.kv_offset is not None:
        kp = kp + mask.kv_offset
    return qp, kp


def position_diff(mask: MaskArgs, sq: int, skv: int):
    """(Sq, Skv) int32 q_pos - kv_pos matrix per the mask's position model."""
    qp, kp = positions(mask, sq, skv)
    return qp[:, None] - kp[None, :]


# xxhash-style 32-bit avalanche + multipliers for the dropout hash. Not
# cryptographic — just well-mixed, cheap on the VPU (int32 mul/xor/shift),
# and implementable identically in jnp (XLA backend / tests) and Pallas.
_H_Q = 0x9E3779B1
_H_K = 0x85EBCA77
_H_HEAD = 0xC2B2AE35
_H_BATCH = 0x27D4EB2F
_H_SEG = 0x165667B1


def _mix32(x):
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> jnp.uint32(16))


def dropout_row_hash(qp, qseg, head, batch, seed):
    """Per-q-row hash (any shape). qp int32 positions; head/batch/seed
    scalars; qseg int32 per-row segment ids or None."""
    x = qp.astype(jnp.uint32) * jnp.uint32(_H_Q)
    x = x + (
        jnp.uint32(0xDEADBEEF)
        + seed.astype(jnp.uint32)
        + head.astype(jnp.uint32) * jnp.uint32(_H_HEAD)
        + batch.astype(jnp.uint32) * jnp.uint32(_H_BATCH)
    )
    if qseg is not None:
        x = x + qseg.astype(jnp.uint32) * jnp.uint32(_H_SEG)
    return _mix32(x)


def dropout_keep(row_hash, kp, threshold):
    """keep mask: broadcast(row_hash, kp) — row_hash from dropout_row_hash
    (broadcastable against kp), kp int32 kv positions, threshold uint32
    (= dropout_p * 2^32)."""
    x = row_hash ^ (kp.astype(jnp.uint32) * jnp.uint32(_H_K))
    return _mix32(x) >= threshold


def dropout_threshold(dropout_p):
    import numpy as _np

    return jnp.uint32(_np.uint32(min(int(dropout_p * 2**32), 2**32 - 1)))


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
