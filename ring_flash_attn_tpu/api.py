"""Public API: the reference's 18 attention entry points, TPU-native.

Signature parity with the reference (reference ring_flash_attn/__init__.py):
6 algorithms x {func, kvpacked_func, qkvpacked_func}, flash-attn keyword
surface (dropout_p, softmax_scale, causal, window_size, alibi_slopes,
deterministic, return_attn_probs, group) — with `group` being a mesh axis
*name* (the jax.sharding analog of a torch.distributed process group). All
distributed functions are per-shard: call them inside `shard_map` over that
axis, exactly as the reference's are called per torchrun rank.

Layout follows flash-attn: batch API q (B, S, H, D); varlen API packed
q (T, H, D) + cu_seqlens. Internally everything runs (B, H, S, D).

Feature matrix (EXTENSIONS over the reference on every row): softcap
(Gemma-2 tanh capping) is supported everywhere (the reference forces
softcap=0.0, utils.py:19-20); ALiBi slopes are supported everywhere (the
reference asserts alibi_slopes is None, ring_flash_attn.py:176);
deterministic position-hashed dropout is supported everywhere via
dropout_p + the dropout_seed kwarg, bitwise-identical between distributed
and single-device runs (the reference documents dropout as unsupported,
README.md:158); causal sliding windows (window_size=(left, 0|-1)) are
supported on the single-device path and all batch distributed paths, and
the single-device path additionally supports flash-attn's full
bidirectional/non-causal (left, right) window semantics (round 4).
Causal sliding windows are also supported on all varlen paths (ring,
zigzag, llama3) — the reference has a documented hole there
(README.md:159). `deterministic` is accepted and ignored — every path
here is always deterministic.
"""

import jax.numpy as jnp
import numpy as np
from jax import lax

from .ops.flash import flash_attention as _flash_attention
from .ops.mask import MaskArgs
from .ops.varlen import (
    cu_seqlens_to_positions,
    cu_seqlens_to_segids,
    ring_varlen_info,
    zigzag_varlen_info,
)
from .parallel.llama3 import llama3_attention
from .parallel.ring import ring_attention
from .parallel.ring_varlen import ring_attention_varlen
from .parallel.stripe import stripe_attention
from .parallel.zigzag import zigzag_ring_attention
from .parallel.zigzag_varlen import zigzag_ring_attention_varlen

_DEFAULT_AXIS = "sp"


def set_default_axis_name(name):
    """Set the mesh axis used when group=None (the reference's 'default
    process group')."""
    global _DEFAULT_AXIS
    _DEFAULT_AXIS = name


def _axis(group):
    return _DEFAULT_AXIS if group is None else group


def _check_unsupported(dropout_p, window_size, alibi_slopes,
                       allow_window=False, allow_alibi=False,
                       allow_dropout=True):
    del dropout_p, allow_dropout  # dropout is supported on every path
    window_left = None
    if tuple(window_size) != (-1, -1):
        if (
            allow_window
            and window_size[0] >= 0
            and window_size[1] in (0, -1)
        ):
            window_left = int(window_size[0])
        else:
            raise NotImplementedError(
                "window_size: only causal sliding windows (left, 0) are "
                "supported (flash and batch distributed paths)"
            )
    if alibi_slopes is not None and not allow_alibi:
        raise NotImplementedError(
            "alibi_slopes is not supported on this path (it is an EXTENSION "
            "elsewhere — the reference supports it nowhere, "
            "ring_flash_attn.py:176)"
        )
    return window_left


def _bshd_to_bhsd(x):
    return jnp.swapaxes(x, 1, 2)


def _bhsd_to_bshd(x):
    return jnp.swapaxes(x, 1, 2)


def _ret(out_bhsd, lse, return_attn_probs):
    out = _bhsd_to_bshd(out_bhsd)
    if return_attn_probs:
        # (out, lse, p) with p always None — the reference returns the same
        # (dropout-free) triple shape.
        return out, lse, None
    return out


def _scale(softmax_scale, d):
    return softmax_scale if softmax_scale is not None else d**-0.5


def _cap(softcap):
    # flash-attn convention: 0.0 disables capping
    return float(softcap) if softcap else None


# ---------------------------------------------------------------------------
# Single-device flash attention (the oracle / L1 API)
# ---------------------------------------------------------------------------


def flash_attn_func(
    q, k, v,
    dropout_p=0.0, softmax_scale=None, causal=False,
    window_size=(-1, -1), softcap=0.0, alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False, dropout_seed=None,
):
    """Single-device flash attention, q/k/v (B, S, H, D). Supports full
    flash-attn window semantics — causal sliding windows
    window_size=(left, 0) and bidirectional/non-causal windows
    window_size=(left, right) with causal=False (either side -1 =
    unlimited; the reference forwards window_size to flash-attn verbatim,
    reference ring_flash_attn.py:44-52) — plus softcap, ALiBi, and
    deterministic dropout (pass dropout_seed; see ops/mask.py).
    Distributed paths remain causal-window-only."""
    window_left = window_right = None
    if tuple(window_size) != (-1, -1):
        if window_size[0] >= 0:
            window_left = int(window_size[0])
        # flash-attn convention: with causal=True causality already caps
        # the right side at 0, so window_size[1] is a no-op there
        if window_size[1] >= 0 and not causal:
            window_right = int(window_size[1])
    out, lse = _flash_attention(
        _bshd_to_bhsd(q), _bshd_to_bhsd(k), _bshd_to_bhsd(v),
        _scale(softmax_scale, q.shape[-1]),
        MaskArgs(causal=causal, window_left=window_left,
                 window_right=window_right,
                 softcap=_cap(softcap), alibi_slopes=alibi_slopes,
                 dropout_p=dropout_p or None, dropout_seed=dropout_seed),
    )
    return _ret(out, lse, return_attn_probs)


def flash_attn_kvpacked_func(q, kv, **kw):
    return flash_attn_func(q, kv[:, :, 0], kv[:, :, 1], **kw)


def flash_attn_qkvpacked_func(qkv, **kw):
    return flash_attn_func(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], **kw)


def flash_attn_varlen_func(
    q, k, v, cu_seqlens, max_seqlen=None,
    dropout_p=0.0, softmax_scale=None, causal=False,
    window_size=(-1, -1), softcap=0.0, alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False, dropout_seed=None,
):
    """Single-device varlen flash attention, q/k/v packed (T, H, D).

    Causal sliding windows via window_size=(left, 0) are an EXTENSION: the
    reference inherits flash-attn varlen's window support but its ring
    paths do not (reference README.md:159)."""
    window_left = _check_unsupported(dropout_p, window_size, alibi_slopes,
                                     allow_window=True, allow_alibi=True,
                                     allow_dropout=True)
    if window_left is not None and not causal:
        raise NotImplementedError("sliding window requires causal=True")
    t = q.shape[0]
    seg = cu_seqlens_to_segids(cu_seqlens, t)
    pos = cu_seqlens_to_positions(cu_seqlens, t)
    need_pos = causal or alibi_slopes is not None or dropout_p
    mask = MaskArgs(
        causal=causal, q_segids=seg, kv_segids=seg,
        q_pos=pos if need_pos else None, kv_pos=pos if need_pos else None,
        window_left=window_left,
        softcap=_cap(softcap), alibi_slopes=alibi_slopes,
        dropout_p=dropout_p or None, dropout_seed=dropout_seed,
        # positions come from cu_seqlens_to_positions on one packing:
        # the packed-self triangle contract holds by construction
        packed_self=True,
    )
    out, lse = _flash_attention(
        q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
        v.transpose(1, 0, 2)[None],
        _scale(softmax_scale, q.shape[-1]), mask,
    )
    out = out[0].transpose(1, 0, 2)
    if return_attn_probs:
        return out, lse[0], None
    return out


def flash_attn_varlen_kvpacked_func(q, kv, cu_seqlens, max_seqlen=None, **kw):
    return flash_attn_varlen_func(
        q, kv[:, 0], kv[:, 1], cu_seqlens, max_seqlen, **kw
    )


def flash_attn_varlen_qkvpacked_func(qkv, cu_seqlens, max_seqlen=None, **kw):
    return flash_attn_varlen_func(
        qkv[:, 0], qkv[:, 1], qkv[:, 2], cu_seqlens, max_seqlen, **kw
    )


# ---------------------------------------------------------------------------
# Batch-API distributed variants (reference ring_flash_attn.py:223-301,
# zigzag_ring_flash_attn.py:244-346, stripe_flash_attn.py:276-378)
# ---------------------------------------------------------------------------


def _batch_variant(schedule_kw):
    def func(
        q, k, v,
        dropout_p=0.0, softmax_scale=None, causal=False,
        window_size=(-1, -1), softcap=0.0, alibi_slopes=None,
        deterministic=False,
        return_attn_probs=False, group=None, dropout_seed=None,
    ):
        kind = schedule_kw["kind"]
        if kind == "ring":
            # ring forwards FULL flash-attn window semantics (r5): causal
            # (left, 0) and non-causal (left, right), either side -1 =
            # unlimited — matching the reference's batch ring, which hands
            # window_size to flash-attn verbatim (ring_flash_attn.py:44-52)
            window_left = window_right = None
            if tuple(window_size) != (-1, -1):
                if window_size[0] >= 0:
                    window_left = int(window_size[0])
                if window_size[1] >= 0 and not causal:
                    window_right = int(window_size[1])
        else:
            window_left = _check_unsupported(
                dropout_p, window_size, alibi_slopes,
                allow_window=True, allow_alibi=True, allow_dropout=True,
            )
            if window_left is not None and not causal:
                raise NotImplementedError(
                    "sliding window requires causal=True"
                )
        scale = _scale(softmax_scale, q.shape[-1])
        qi, ki, vi = map(_bshd_to_bhsd, (q, k, v))
        axis = _axis(group)
        if kind == "ring":
            out, lse = ring_attention(
                qi, ki, vi, scale=scale, causal=causal, axis_name=axis,
                softcap=_cap(softcap), alibi_slopes=alibi_slopes,
                dropout_p=dropout_p or None, dropout_seed=dropout_seed,
                window_left=window_left, window_right=window_right,
            )
        elif kind == "zigzag":
            if not causal:
                raise ValueError(
                    "zigzag ring attention is causal-only (the reference "
                    "asserts the same, zigzag_ring_flash_attn.py:19)"
                )
            out, lse = zigzag_ring_attention(
                qi, ki, vi, scale=scale, axis_name=axis,
                softcap=_cap(softcap), alibi_slopes=alibi_slopes,
                dropout_p=dropout_p or None, dropout_seed=dropout_seed,
                window_left=window_left,
            )
        elif kind == "stripe":
            if not causal:
                raise ValueError(
                    "stripe attention is causal-only (the reference asserts "
                    "the same, stripe_flash_attn.py:19-21)"
                )
            out, lse = stripe_attention(
                qi, ki, vi, scale=scale, axis_name=axis,
                softcap=_cap(softcap), alibi_slopes=alibi_slopes,
                dropout_p=dropout_p or None, dropout_seed=dropout_seed,
                window_left=window_left,
            )
        else:
            raise AssertionError(kind)
        return _ret(out, lse, return_attn_probs)

    return func


ring_flash_attn_func = _batch_variant({"kind": "ring"})
zigzag_ring_flash_attn_func = _batch_variant({"kind": "zigzag"})
stripe_flash_attn_func = _batch_variant({"kind": "stripe"})


def _kvpacked(func):
    def wrapper(q, kv, *args, **kw):
        return func(q, kv[:, :, 0], kv[:, :, 1], *args, **kw)

    return wrapper


def _qkvpacked(func):
    def wrapper(qkv, *args, **kw):
        return func(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], *args, **kw)

    return wrapper


ring_flash_attn_kvpacked_func = _kvpacked(ring_flash_attn_func)
ring_flash_attn_qkvpacked_func = _qkvpacked(ring_flash_attn_func)
zigzag_ring_flash_attn_kvpacked_func = _kvpacked(zigzag_ring_flash_attn_func)
zigzag_ring_flash_attn_qkvpacked_func = _qkvpacked(zigzag_ring_flash_attn_func)
stripe_flash_attn_kvpacked_func = _kvpacked(stripe_flash_attn_func)
stripe_flash_attn_qkvpacked_func = _qkvpacked(stripe_flash_attn_func)


# ---------------------------------------------------------------------------
# Varlen distributed variants
# ---------------------------------------------------------------------------


def ring_flash_attn_varlen_func(
    q, k, v, cu_seqlens, max_seqlen=None,
    dropout_p=0.0, softmax_scale=None, causal=False,
    window_size=(-1, -1), softcap=0.0, alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False, group=None, dropout_seed=None,
):
    """Varlen ring attention. q/k/v (T_local, H, D) packed; cu_seqlens is
    the shared LOCAL cu_seqlens (= global // world, identical on every
    rank — the reference's single-cu_seqlens constraint, README.md:74).
    Layout: rank r holds part r of every sequence. Causal sliding windows
    (window_size=(left, 0)) are an EXTENSION over the reference
    (README.md:159 documents varlen windows as unsupported there)."""
    window_left = _check_unsupported(dropout_p, window_size, alibi_slopes,
                                     allow_window=True, allow_alibi=True,
                                     allow_dropout=True)
    if window_left is not None and not causal:
        raise NotImplementedError("sliding window requires causal=True")
    axis = _axis(group)
    t = q.shape[0]
    rank = lax.axis_index(axis)
    seg, pos = ring_varlen_info(cu_seqlens, t, rank)
    out, lse = ring_attention_varlen(
        q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
        v.transpose(1, 0, 2)[None], seg, pos,
        scale=_scale(softmax_scale, q.shape[-1]), causal=causal,
        axis_name=axis, softcap=_cap(softcap), alibi_slopes=alibi_slopes,
        dropout_p=dropout_p or None, dropout_seed=dropout_seed,
        window_left=window_left,
    )
    out = out[0].transpose(1, 0, 2)
    if return_attn_probs:
        return out, lse[0], None
    return out


def ring_flash_attn_varlen_kvpacked_func(q, kv, cu_seqlens, max_seqlen=None,
                                         **kw):
    return ring_flash_attn_varlen_func(
        q, kv[:, 0], kv[:, 1], cu_seqlens, max_seqlen, **kw
    )


def ring_flash_attn_varlen_qkvpacked_func(qkv, cu_seqlens, max_seqlen=None,
                                          **kw):
    return ring_flash_attn_varlen_func(
        qkv[:, 0], qkv[:, 1], qkv[:, 2], cu_seqlens, max_seqlen, **kw
    )


def zigzag_ring_flash_attn_varlen_func(
    q, k, v, cu_seqlens, max_seqlen=None,
    dropout_p=0.0, softmax_scale=None, causal=True,
    window_size=(-1, -1), softcap=0.0, alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False, group=None, dropout_seed=None,
):
    """Zigzag varlen ring attention (grouped layout — see
    parallel/zigzag_varlen.py and ops/varlen.py for the layout change vs
    the reference). cu_seqlens is the shared local cu_seqlens
    (= global // world); every sequence length divisible by 2*world.
    Causal sliding windows (window_size=(left, 0)) are an EXTENSION over
    the reference (README.md:159)."""
    window_left = _check_unsupported(dropout_p, window_size, alibi_slopes,
                                     allow_window=True, allow_alibi=True,
                                     allow_dropout=True)
    if not causal:
        raise ValueError("zigzag varlen is causal-only")
    axis = _axis(group)
    t = q.shape[0]
    rank = lax.axis_index(axis)
    world = lax.axis_size(axis)
    cu_half = jnp.asarray(cu_seqlens, jnp.int32) // 2
    seg, pos = zigzag_varlen_info(cu_half, t, rank, world)
    out, lse = zigzag_ring_attention_varlen(
        q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
        v.transpose(1, 0, 2)[None], seg, pos,
        scale=_scale(softmax_scale, q.shape[-1]), axis_name=axis,
        softcap=_cap(softcap), alibi_slopes=alibi_slopes,
        dropout_p=dropout_p or None, dropout_seed=dropout_seed,
        window_left=window_left,
    )
    out = out[0].transpose(1, 0, 2)
    if return_attn_probs:
        return out, lse[0], None
    return out


def zigzag_ring_flash_attn_varlen_kvpacked_func(q, kv, cu_seqlens,
                                                max_seqlen=None, **kw):
    return zigzag_ring_flash_attn_varlen_func(
        q, kv[:, 0], kv[:, 1], cu_seqlens, max_seqlen, **kw
    )


def zigzag_ring_flash_attn_varlen_qkvpacked_func(qkv, cu_seqlens,
                                                 max_seqlen=None, **kw):
    return zigzag_ring_flash_attn_varlen_func(
        qkv[:, 0], qkv[:, 1], qkv[:, 2], cu_seqlens, max_seqlen, **kw
    )


# ---------------------------------------------------------------------------
# llama3 all-gather context parallelism (reference
# llama3_flash_attn_varlen.py)
# ---------------------------------------------------------------------------


def llama3_flash_attn_prepare_cu_seqlens(cu_seqlens, causal, rank, world_size):
    """Host-side sharding metadata, exactly the reference's semantics
    (reference llama3_flash_attn_varlen.py:10-60).

    Args: cu_seqlens — GLOBAL packed cu_seqlens (numpy/int array).
    Returns: (cu_seqlens_q, cu_seqlens_k, max_seqlen_q, max_seqlen_k,
    local_k_slice)."""
    cu = np.asarray(cu_seqlens, np.int64)
    total = int(cu[-1])
    assert total % world_size == 0, (total, world_size)
    lpr = total // world_size
    left = int(np.searchsorted(cu, rank * lpr))
    right = int(np.searchsorted(cu, (rank + 1) * lpr))
    if cu[left] != rank * lpr:
        left -= 1

    cu_q = cu[left : right + 1].copy()
    cu_q -= rank * lpr
    cu_q[0] = 0
    cu_q[-1] = lpr

    cu_k = cu[left : right + 1].copy()
    if causal:
        slice_right = (rank + 1) * lpr
        cu_k[-1] = slice_right
    else:
        slice_right = int(cu[right])
    slice_left = int(cu[left])
    cu_k -= slice_left

    max_q = int((cu_q[1:] - cu_q[:-1]).max())
    max_k = int((cu_k[1:] - cu_k[:-1]).max())
    return (
        cu_q.astype(np.int32),
        cu_k.astype(np.int32),
        max_q,
        max_k,
        slice(slice_left, slice_right),
    )


def llama3_flash_attn_varlen_func(
    q, k, v, cu_seqlens_q, cu_seqlens_k, max_seqlen_q=None, max_seqlen_k=None,
    heads_k_stride=None, local_k_slice=None,
    dropout_p=0.0, softmax_scale=None, causal=True,
    window_size=(-1, -1), softcap=0.0, alibi_slopes=None,
    deterministic=False,
    return_attn_probs=False, group=None, dropout_seed=None,
):
    """Llama-3 all-gather context parallelism over packed sequences.

    q/k/v (T_local, H, D); metadata from
    llama3_flash_attn_prepare_cu_seqlens. Sharding is contiguous: rank r
    holds global tokens [r*L, (r+1)*L). Internally the asymmetric
    cu_seqlens_q/k become globally-consistent segment labels (each
    sequence's global start position) + a rank*L causal offset — see
    parallel/llama3.py. Causal sliding windows (window_size=(left, 0))
    are an EXTENSION over the reference (README.md:159): within a packed
    segment, global-position distance equals within-sequence distance, so
    the window rides the same global offsets the causal mask uses."""
    window_left = _check_unsupported(dropout_p, window_size, alibi_slopes,
                                     allow_window=True, allow_alibi=True,
                                     allow_dropout=True)
    if window_left is not None and not causal:
        raise NotImplementedError("sliding window requires causal=True")
    axis = _axis(group)
    t = q.shape[0]
    if local_k_slice is None:
        slice_left = 0
    elif isinstance(local_k_slice, slice):
        slice_left = local_k_slice.start
    else:
        slice_left = local_k_slice[0]
    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    cu_k = jnp.asarray(cu_seqlens_k, jnp.int32)
    seg_local = cu_seqlens_to_segids(cu_q, t)
    # globally-consistent segment label = the sequence's global start token
    q_segids = (slice_left + cu_k[seg_local]).astype(jnp.int32)
    out, lse = llama3_attention(
        q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
        v.transpose(1, 0, 2)[None], q_segids,
        scale=_scale(softmax_scale, q.shape[-1]), causal=causal,
        heads_k_stride=heads_k_stride, axis_name=axis,
        softcap=_cap(softcap), alibi_slopes=alibi_slopes,
        dropout_p=dropout_p or None, dropout_seed=dropout_seed,
        window_left=window_left,
    )
    out = out[0].transpose(1, 0, 2)
    if return_attn_probs:
        return out, lse[0], None
    return out


def llama3_flash_attn_varlen_kvpacked_func(q, kv, *args, **kw):
    return llama3_flash_attn_varlen_func(q, kv[:, 0], kv[:, 1], *args, **kw)


def llama3_flash_attn_varlen_qkvpacked_func(qkv, *args, **kw):
    return llama3_flash_attn_varlen_func(
        qkv[:, 0], qkv[:, 1], qkv[:, 2], *args, **kw
    )


__all__ = [
    "set_default_axis_name",
    "flash_attn_func",
    "flash_attn_kvpacked_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_varlen_func",
    "flash_attn_varlen_kvpacked_func",
    "flash_attn_varlen_qkvpacked_func",
    "ring_flash_attn_func",
    "ring_flash_attn_kvpacked_func",
    "ring_flash_attn_qkvpacked_func",
    "ring_flash_attn_varlen_func",
    "ring_flash_attn_varlen_kvpacked_func",
    "ring_flash_attn_varlen_qkvpacked_func",
    "zigzag_ring_flash_attn_func",
    "zigzag_ring_flash_attn_kvpacked_func",
    "zigzag_ring_flash_attn_qkvpacked_func",
    "zigzag_ring_flash_attn_varlen_func",
    "zigzag_ring_flash_attn_varlen_kvpacked_func",
    "zigzag_ring_flash_attn_varlen_qkvpacked_func",
    "stripe_flash_attn_func",
    "stripe_flash_attn_kvpacked_func",
    "stripe_flash_attn_qkvpacked_func",
    "llama3_flash_attn_prepare_cu_seqlens",
    "llama3_flash_attn_varlen_func",
    "llama3_flash_attn_varlen_kvpacked_func",
    "llama3_flash_attn_varlen_qkvpacked_func",
]
