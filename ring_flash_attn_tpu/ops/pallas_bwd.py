"""Pallas TPU flash-attention backward kernels.

The L1 backward boundary — the role flash-attn's `_flash_attn_backward`
plays for the reference (reference ring_flash_attn.py:103-131): given
(dout, q, k, v, lse, delta) produce per-block (dq, dk, dv).

TPU-first split into two atomics-free kernels (dq iterates KV inside a
q-block; dk/dv iterate q inside a KV-block), each accumulating in VMEM
scratch — the standard TPU decomposition (no scatter/atomics on TPU):

  dq kernel   grid (B, Hq, q-block x kv-block):
      p' = exp(s - (lse - log scale)) = p * scale
      dp = dout @ v^T ;  ds' = p' * (dp - delta) ;  dq += ds' @ k
  dkv kernel  grid (B, Hkv, kv-block x (group x q-block)):
      (transposed orientation, GQA group accumulated in-kernel)
      s^T = k @ qs^T ;  p^T = exp(s^T - lse)
      dv += p^T @ dout ;  dp^T = v @ dout^T
      ds^T = p^T * (dp^T - delta) ;  dk += ds^T @ qs

The softmax scale is folded into q (qs = q*scale) for the logits; the dq
kernel additionally folds the scale needed by ds into the LSE
(lse' = lse - log scale), so no full-tensor scale passes remain. See
pallas_fwd.py for the triangular causal grid and mask-mode notes shared
with the forward kernel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mask import (
    MaskArgs,
    NEG_INF,
    dropout_keep,
    dropout_row_hash,
    dropout_threshold,
)
from .pallas_fwd import _LN2, _LOG2E, _pick_block, mask_info

# Measured on v5e at the headline shape (tools/tune_bwd_split.py sweeps
# the dq and dkv kernels separately): square 1024 blocks win for both
# (dq 6.9ms / dkv 8.3ms vs 7.6/9.2 at kv=512), ~49% of chip peak fwd+bwd.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_KV = 1024


# ---------------------------------------------------------------------------
# dq kernel
# ---------------------------------------------------------------------------


def _dq_kernel(
    info_ref,
    iq_map_ref,
    ikv_map_ref,
    qmeta_ref,  # (6, n_q) int32 block bounds (pallas_fwd.block_meta)
    kvmeta_ref,  # (6, n_kv) int32 block bounds (kv_sub == blk_kv here)
    *refs,
    causal,
    use_positions,
    use_segments,
    triangular,
    static_offset,
    window_left,
    window_right,
    softcap,
    use_alibi,
    dropout_p,
    blk_q,
    blk_kv,
    num_kv_blocks,
):
    it = iter(refs)
    qs_ref = next(it)  # (1, 1, blk_q, D) pre-scaled q
    k_ref = next(it)  # (1, 1, blk_kv, D)
    v_ref = next(it)  # (1, 1, blk_kv, D)
    dout_ref = next(it)  # (1, 1, blk_q, D)
    lse_ref = next(it)  # (1, 1, blk_q, 1) f32 (already shifted by -log scale)
    delta_ref = next(it)  # (1, 1, blk_q, 1) f32
    qseg_ref = next(it) if use_segments else None
    kseg_ref = next(it) if use_segments else None
    qpos_ref = next(it) if use_positions else None
    kpos_ref = next(it) if use_positions else None
    slopes_ref = next(it) if use_alibi else None  # (Hq,) f32 SMEM
    dq_ref = next(it)  # (1, 1, blk_q, D) f32
    dq_s = next(it)  # (blk_q, D) f32

    b_id = pl.program_id(0)
    h_id = pl.program_id(1)
    rel = info_ref[0] - info_ref[1]
    if triangular:
        p = pl.program_id(2)
        iq = iq_map_ref[p]
        ikv = ikv_map_ref[p]
        nkv_needed = jnp.clip(
            ((iq + 1) * blk_q - 1 + static_offset) // blk_kv + 1,
            1,
            num_kv_blocks,
        )
        is_last = ikv == nkv_needed - 1
    else:
        iq = pl.program_id(2)
        ikv = pl.program_id(3)
        is_last = ikv == num_kv_blocks - 1

    @pl.when(ikv == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    def _qp_kp():
        if use_positions:
            qp = qpos_ref[0, :].reshape(blk_q, 1)
            kp = kpos_ref[0, :].reshape(1, blk_kv)
        else:
            qp = (
                iq * blk_q + info_ref[0]
                + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0)
            )
            kp = (
                ikv * blk_kv + info_ref[1]
                + jax.lax.broadcasted_iota(jnp.int32, (1, blk_kv), 1)
            )
        return qp, kp

    def _keep(qp, kp, qseg):
        rh = dropout_row_hash(
            qp, qseg, h_id + info_ref[3], b_id, info_ref[2]
        )
        return dropout_keep(rh, kp, dropout_threshold(dropout_p))

    use_window = window_left is not None or window_right is not None

    def _allowed():
        allowed = None
        if causal or use_window:
            qp, kp = _qp_kp()
            if causal:
                allowed = qp >= kp
            if window_left is not None:
                c = (qp - kp) <= window_left
                allowed = c if allowed is None else (allowed & c)
            if window_right is not None:
                c = (kp - qp) <= window_right
                allowed = c if allowed is None else (allowed & c)
        if use_segments:
            qs_ = qseg_ref[0, :].reshape(blk_q, 1)
            ks_ = kseg_ref[0, :].reshape(1, blk_kv)
            seg = qs_ == ks_
            allowed = seg if allowed is None else (allowed & seg)
        return allowed

    def _body(masked):
        s = jax.lax.dot_general(
            qs_ref[0, 0],
            k_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, blk_kv) base-2 logits (scale * log2e folded into qs)
        if softcap:
            cap2 = jnp.float32(softcap * _LOG2E)
            t = jnp.tanh(s * (1.0 / cap2))
            s = cap2 * t
        if use_alibi:
            qp, kp = _qp_kp()
            dist = (qp - kp).astype(jnp.float32)
            if not causal:
                dist = jnp.abs(dist)
            s = s - slopes_ref[h_id] * dist
        if masked:
            s = jnp.where(_allowed(), s, NEG_INF)
        pr = jnp.exp2(s - lse_ref[0, 0])  # = p * scale (lse pre-shifted)
        dp = jax.lax.dot_general(
            dout_ref[0, 0],
            v_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_p:
            qp_, kp_ = _qp_kp()
            qseg_ = qseg_ref[0, :].reshape(blk_q, 1) if use_segments else None
            dp = jnp.where(_keep(qp_, kp_, qseg_), dp, 0.0) * jnp.float32(
                1.0 / (1.0 - dropout_p)
            )
        ds = pr * (dp - delta_ref[0, 0])
        if softcap:
            # chain rule through the cap: d s_cap/d s = 1 - tanh^2
            ds = ds * (1.0 - t * t)
        dq_s[...] += jax.lax.dot_general(
            ds.astype(k_ref.dtype),
            k_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Block-granular three-way dispatch (skip / mask-free / masked) from
    # scalar block bounds — see _fwd_kernel for the derivation. Skipped
    # blocks contribute exactly zero to dq, so omitting them is exact.
    if causal or use_segments or use_window:
        skip = None
        free = None
        if causal or use_window:
            if use_positions:
                lo = qmeta_ref[2, iq] - kvmeta_ref[3, ikv]
                hi = qmeta_ref[3, iq] - kvmeta_ref[2, ikv]
            else:
                lo = iq * blk_q + rel - ((ikv + 1) * blk_kv - 1)
                hi = iq * blk_q + blk_q - 1 + rel - ikv * blk_kv
            if causal:
                skip = hi < 0
                free = lo >= 0
            if window_left is not None:
                c_s = lo > window_left
                c_f = hi <= window_left
                skip = c_s if skip is None else (skip | c_s)
                free = c_f if free is None else (free & c_f)
            if window_right is not None:
                c_s = hi < -window_right
                c_f = lo >= -window_right
                skip = c_s if skip is None else (skip | c_s)
                free = c_f if free is None else (free & c_f)
        if use_segments:
            qsmin = qmeta_ref[0, iq]
            qsmax = qmeta_ref[1, iq]
            ksmin = kvmeta_ref[0, ikv]
            ksmax = kvmeta_ref[1, ikv]
            sd = (qsmax < ksmin) | (ksmax < qsmin)
            sf = (qsmin == qsmax) & (ksmin == ksmax) & (qsmin == ksmin)
            skip = sd if skip is None else (skip | sd)
            free = sf if free is None else (free & sf)

        @pl.when(jnp.logical_not(skip) & free)
        def _unmasked():
            _body(False)

        @pl.when(jnp.logical_not(skip) & jnp.logical_not(free))
        def _masked():
            _body(True)

    else:
        _body(False)

    @pl.when(is_last)
    def _flush():
        dq_ref[0, 0] = dq_s[...]


# ---------------------------------------------------------------------------
# dkv kernel
# ---------------------------------------------------------------------------


def _dkv_kernel(
    info_ref,
    g_map_ref,  # (P,) pair -> GQA group member
    iq_map_ref,  # (P,) pair -> q block
    ikv_map_ref,  # (P,) pair -> kv block
    first_map_ref,  # (P,) 1 iff first pair of this kv block
    last_map_ref,  # (P,) 1 iff last pair of this kv block
    qmeta_ref,  # (6, n_q) int32 block bounds (pallas_fwd.block_meta)
    kvmeta_ref,  # (6, n_kv) int32 block bounds (kv_sub == blk_kv here)
    *refs,
    causal,
    use_positions,
    use_segments,
    window_left,
    window_right,
    softcap,
    use_alibi,
    dropout_p,
    group,
    blk_q,
    blk_kv,
):
    it = iter(refs)
    qs_ref = next(it)  # (1, 1, blk_q, D) pre-scaled q (head = hkv*G + g)
    k_ref = next(it)  # (1, 1, blk_kv, D)
    v_ref = next(it)  # (1, 1, blk_kv, D)
    dout_ref = next(it)  # (1, 1, blk_q, D)
    lse_ref = next(it)  # (1, 1, blk_q, 1) f32
    delta_ref = next(it)  # (1, 1, blk_q, 1) f32
    qseg_ref = next(it) if use_segments else None
    kseg_ref = next(it) if use_segments else None
    qpos_ref = next(it) if use_positions else None
    kpos_ref = next(it) if use_positions else None
    slopes_ref = next(it) if use_alibi else None  # (Hq,) f32 SMEM
    dk_ref = next(it)  # (1, 1, blk_kv, D) f32
    dv_ref = next(it)  # (1, 1, blk_kv, D) f32
    dk_s = next(it)  # (blk_kv, D) f32
    dv_s = next(it)  # (blk_kv, D) f32

    b_id = pl.program_id(0)
    p = pl.program_id(2)
    iq = iq_map_ref[p]
    ikv = ikv_map_ref[p]
    rel = info_ref[0] - info_ref[1]
    h_id = (
        pl.program_id(1) * group + g_map_ref[p]
        if (use_alibi or dropout_p) else None
    )

    @pl.when(first_map_ref[p] == 1)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    def _qp_kp_t():
        """Transposed-orientation positions: qp (1, blk_q), kp (blk_kv, 1)."""
        if use_positions:
            qp = qpos_ref[0, :].reshape(1, blk_q)
            kp = kpos_ref[0, :].reshape(blk_kv, 1)
        else:
            qp = (
                iq * blk_q + info_ref[0]
                + jax.lax.broadcasted_iota(jnp.int32, (1, blk_q), 1)
            )
            kp = (
                ikv * blk_kv + info_ref[1]
                + jax.lax.broadcasted_iota(jnp.int32, (blk_kv, 1), 0)
            )
        return qp, kp

    def _keep_t():
        """Transposed-orientation keep mask — elementwise identical to the
        forward kernel's (pure function of absolute coordinates)."""
        qp, kp = _qp_kp_t()
        qseg = qseg_ref[0, :].reshape(1, blk_q) if use_segments else None
        rh = dropout_row_hash(
            qp, qseg, h_id + info_ref[3], b_id, info_ref[2]
        )
        return dropout_keep(rh, kp, dropout_threshold(dropout_p))

    use_window = window_left is not None or window_right is not None

    def _allowed_t():
        """(blk_kv, blk_q) transposed mask."""
        allowed = None
        if causal or use_window:
            qp, kp = _qp_kp_t()
            if causal:
                allowed = qp >= kp
            if window_left is not None:
                c = (qp - kp) <= window_left
                allowed = c if allowed is None else (allowed & c)
            if window_right is not None:
                c = (kp - qp) <= window_right
                allowed = c if allowed is None else (allowed & c)
        if use_segments:
            qs_ = qseg_ref[0, :].reshape(1, blk_q)
            ks_ = kseg_ref[0, :].reshape(blk_kv, 1)
            seg = qs_ == ks_
            allowed = seg if allowed is None else (allowed & seg)
        return allowed

    def _body(masked):
        s_t = jax.lax.dot_general(
            k_ref[0, 0],
            qs_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_kv, blk_q) base-2 logits^T
        if softcap:
            cap2 = jnp.float32(softcap * _LOG2E)
            t = jnp.tanh(s_t * (1.0 / cap2))
            s_t = cap2 * t
        if use_alibi:
            qp, kp = _qp_kp_t()
            dist = (qp - kp).astype(jnp.float32)
            if not causal:
                dist = jnp.abs(dist)
            s_t = s_t - slopes_ref[h_id] * dist
        if masked:
            s_t = jnp.where(_allowed_t(), s_t, NEG_INF)
        p_t = jnp.exp2(s_t - lse_ref[0, 0].reshape(1, blk_q))
        if dropout_p:
            keep_t = _keep_t()
            inv = jnp.float32(1.0 / (1.0 - dropout_p))
            p_v = jnp.where(keep_t, p_t, 0.0) * inv
        else:
            p_v = p_t
        dv_s[...] += jax.lax.dot_general(
            p_v.astype(dout_ref.dtype),
            dout_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp_t = jax.lax.dot_general(
            v_ref[0, 0],
            dout_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_p:
            dp_t = jnp.where(keep_t, dp_t, 0.0) * inv
        ds_t = p_t * (dp_t - delta_ref[0, 0].reshape(1, blk_q))
        if softcap:
            ds_t = ds_t * (1.0 - t * t)
        dk_s[...] += jax.lax.dot_general(
            ds_t.astype(qs_ref.dtype),
            qs_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Block-granular three-way dispatch — see _fwd_kernel. Skipped blocks
    # contribute exactly zero to dk/dv, so omitting them is exact. (The
    # kv-major pair enumeration already prunes above-diagonal pairs for
    # static offsets; the predicates also cover traced-offset rings.)
    if causal or use_segments or use_window:
        skip = None
        free = None
        if causal or use_window:
            if use_positions:
                lo = qmeta_ref[2, iq] - kvmeta_ref[3, ikv]
                hi = qmeta_ref[3, iq] - kvmeta_ref[2, ikv]
            else:
                lo = iq * blk_q + rel - ((ikv + 1) * blk_kv - 1)
                hi = iq * blk_q + blk_q - 1 + rel - ikv * blk_kv
            if causal:
                skip = hi < 0
                free = lo >= 0
            if window_left is not None:
                c_s = lo > window_left
                c_f = hi <= window_left
                skip = c_s if skip is None else (skip | c_s)
                free = c_f if free is None else (free & c_f)
            if window_right is not None:
                c_s = hi < -window_right
                c_f = lo >= -window_right
                skip = c_s if skip is None else (skip | c_s)
                free = c_f if free is None else (free & c_f)
        if use_segments:
            qsmin = qmeta_ref[0, iq]
            qsmax = qmeta_ref[1, iq]
            ksmin = kvmeta_ref[0, ikv]
            ksmax = kvmeta_ref[1, ikv]
            sd = (qsmax < ksmin) | (ksmax < qsmin)
            sf = (qsmin == qsmax) & (ksmin == ksmax) & (qsmin == ksmin)
            skip = sd if skip is None else (skip | sd)
            free = sf if free is None else (free & sf)

        @pl.when(jnp.logical_not(skip) & free)
        def _unmasked():
            _body(False)

        @pl.when(jnp.logical_not(skip) & jnp.logical_not(free))
        def _masked():
            _body(True)

    else:
        _body(False)

    @pl.when(last_map_ref[p] == 1)
    def _flush():
        dk_ref[0, 0] = dk_s[...]
        dv_ref[0, 0] = dv_s[...]


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


def _triangular_pairs(n_q, n_kv, blk_q, blk_kv, static_offset):
    pairs = []
    for iq in range(n_q):
        nkv_needed = min(
            n_kv, max(1, ((iq + 1) * blk_q - 1 + static_offset) // blk_kv + 1)
        )
        pairs.extend((iq, ikv) for ikv in range(nkv_needed))
    return pairs


def _dq(dout, qs, k, v, lse_adj, delta, mask, blk_q, blk_kv, interpret):
    b, hq, sq, d = qs.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    n_q, n_kv = sq // blk_q, skv // blk_kv

    causal = bool(mask.causal)
    use_positions = mask.q_pos is not None
    use_segments = mask.q_segids is not None
    use_alibi = mask.alibi_slopes is not None
    info, offset_static, static_offset = mask_info(mask)
    if use_positions:
        triangular = causal and mask.packed_self
        static_offset = 0
    else:
        triangular = causal and offset_static

    use_meta = use_segments or use_positions
    if use_meta:
        from .pallas_fwd import block_meta

        # numpy (host) metadata stays numpy: jnp would eagerly commit
        # device constants per call (see pallas_fwd's static_meta path)
        static_meta = all(
            x is None or isinstance(x, np.ndarray)
            for x in (mask.q_segids, mask.kv_segids, mask.q_pos, mask.kv_pos)
        )
        q_meta, kv_meta = block_meta(
            mask, blk_q, blk_kv, blk_kv, n_q, n_kv,
            xp=np if static_meta else jnp,
        )
    else:
        q_meta = np.zeros((6, 1), np.int32)  # unused
        kv_meta = np.zeros((6, 1), np.int32)

    def _meta_clamp(qi, ki, qm):
        if use_meta:
            ki = jnp.clip(ki, qm[4, qi], qm[5, qi])
        return ki

    if triangular:
        pairs = _triangular_pairs(n_q, n_kv, blk_q, blk_kv, static_offset)
        iq_map = np.asarray([x[0] for x in pairs], np.int32)
        ikv_map = np.asarray([x[1] for x in pairs], np.int32)
        grid = (b, hq, len(pairs))

        def q_index(bi, hi, p, info_ref, iqm, ikvm, qm, km):
            return (bi, hi, iqm[p], 0)

        def kv_index(bi, hi, p, info_ref, iqm, ikvm, qm, km):
            return (bi, hi // group, _meta_clamp(iqm[p], ikvm[p], qm), 0)

        def lse_index(bi, hi, p, info_ref, iqm, ikvm, qm, km):
            return (bi, hi, iqm[p], 0)

        def qvec_index(bi, hi, p, info_ref, iqm, ikvm, qm, km):
            return (0, iqm[p])

        def kvec_index(bi, hi, p, info_ref, iqm, ikvm, qm, km):
            return (0, _meta_clamp(iqm[p], ikvm[p], qm))

        dim_semantics = ("parallel", "parallel", "arbitrary")
    else:
        iq_map = np.zeros((1,), np.int32)
        ikv_map = np.zeros((1,), np.int32)
        grid = (b, hq, n_q, n_kv)

        def _clamp_kv(qi, ki, info_ref, qm):
            if causal and not use_positions:
                # info[0]-info[1] = the relative q-vs-kv shift
                last_needed = jnp.maximum(
                    ((qi + 1) * blk_q - 1 + info_ref[0] - info_ref[1])
                    // blk_kv, 0
                )
                ki = jnp.minimum(ki, jnp.minimum(last_needed, n_kv - 1))
            return _meta_clamp(qi, ki, qm)

        def q_index(bi, hi, qi, ki, info_ref, iqm, ikvm, qm, km):
            return (bi, hi, qi, 0)

        def kv_index(bi, hi, qi, ki, info_ref, iqm, ikvm, qm, km):
            return (bi, hi // group, _clamp_kv(qi, ki, info_ref, qm), 0)

        def lse_index(bi, hi, qi, ki, info_ref, iqm, ikvm, qm, km):
            return (bi, hi, qi, 0)

        def qvec_index(bi, hi, qi, ki, info_ref, iqm, ikvm, qm, km):
            return (0, qi)

        def kvec_index(bi, hi, qi, ki, info_ref, iqm, ikvm, qm, km):
            return (0, _clamp_kv(qi, ki, info_ref, qm))

        dim_semantics = ("parallel", "parallel", "parallel", "arbitrary")

    in_specs = [
        pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q, 1), lse_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q, 1), lse_index, memory_space=pltpu.VMEM),
    ]
    inputs = [qs, k, v, dout, lse_adj, delta]

    def _vec(x, blk, idx_fn):
        if x is not None:
            in_specs.append(
                pl.BlockSpec((1, blk), idx_fn, memory_space=pltpu.VMEM)
            )
            inputs.append(jnp.asarray(x, jnp.int32).reshape(1, -1))

    _vec(mask.q_segids if use_segments else None, blk_q, qvec_index)
    _vec(mask.kv_segids if use_segments else None, blk_kv, kvec_index)
    _vec(mask.q_pos if use_positions else None, blk_q, qvec_index)
    _vec(mask.kv_pos if use_positions else None, blk_kv, kvec_index)
    if use_alibi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(mask.alibi_slopes, jnp.float32) * _LOG2E)

    kernel = functools.partial(
        _dq_kernel,
        causal=causal,
        use_positions=use_positions,
        use_segments=use_segments,
        triangular=triangular,
        static_offset=static_offset,
        window_left=mask.window_left,
        window_right=None if causal else mask.window_right,
        softcap=mask.softcap,
        use_alibi=use_alibi,
        dropout_p=mask.dropout_p,
        blk_q=blk_q,
        blk_kv=blk_kv,
        num_kv_blocks=n_kv,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
    )

    (dq,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, hq, sq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics,
            # headroom over Mosaic's default 16MB scoped-vmem: softcap's
            # extra tanh intermediate tips large blocks past the default
            # (caught by tools/verify_tpu.py on hardware)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(info, iq_map, ikv_map, q_meta, kv_meta, *inputs)
    return dq


def _dkv(dout, qs, k, v, lse, delta, mask, blk_q, blk_kv, interpret):
    b, hq, sq, d = qs.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    n_q, n_kv = sq // blk_q, skv // blk_kv

    causal = bool(mask.causal)
    use_positions = mask.q_pos is not None
    use_segments = mask.q_segids is not None
    use_alibi = mask.alibi_slopes is not None
    info, offset_static, static_offset = mask_info(mask)
    # Pair enumeration (kv-major); causal+static-offset skips q blocks
    # entirely above the diagonal.
    if use_positions:
        tri = causal and mask.packed_self
        static_offset = 0
    else:
        tri = causal and offset_static
    pairs = []  # (g, iq, ikv)
    for ikv in range(n_kv):
        if tri:
            # need (iq+1)*blk_q - 1 + offset >= ikv*blk_kv
            lo = ikv * blk_kv - static_offset + 1 - blk_q
            first_iq = min(n_q - 1, max(0, -((-lo) // blk_q)))
        else:
            first_iq = 0
        for g in range(group):
            pairs.extend((g, iq, ikv) for iq in range(first_iq, n_q))
    g_map = np.asarray([x[0] for x in pairs], np.int32)
    iq_map = np.asarray([x[1] for x in pairs], np.int32)
    ikv_map = np.asarray([x[2] for x in pairs], np.int32)
    first = np.zeros(len(pairs), np.int32)
    last = np.zeros(len(pairs), np.int32)
    prev_kv = None
    for i, (g, iq, ikv) in enumerate(pairs):
        if ikv != prev_kv:
            first[i] = 1
            if i > 0:
                last[i - 1] = 1
            prev_kv = ikv
    last[-1] = 1
    first_map = first
    last_map = last

    use_meta = use_segments or use_positions
    if use_meta:
        from .pallas_fwd import block_meta

        # numpy (host) metadata stays numpy: jnp would eagerly commit
        # device constants per call (see pallas_fwd's static_meta path)
        static_meta = all(
            x is None or isinstance(x, np.ndarray)
            for x in (mask.q_segids, mask.kv_segids, mask.q_pos, mask.kv_pos)
        )
        q_meta, kv_meta = block_meta(
            mask, blk_q, blk_kv, blk_kv, n_q, n_kv,
            xp=np if static_meta else jnp,
        )
    else:
        q_meta = np.zeros((6, 1), np.int32)  # unused
        kv_meta = np.zeros((6, 1), np.int32)

    def _meta_clamp_q(qi, ki, km):
        # kv-major kernel: skipped Q blocks revisit a boundary block
        # (no DMA); compute is skipped in-kernel by the same predicate
        if use_meta:
            qi = jnp.clip(qi, km[4, ki], km[5, ki])
        return qi

    grid = (b, hkv, len(pairs))

    def q_index(bi, hk, p, info_ref, gm, iqm, ikvm, fm, lm, qm, km):
        return (bi, hk * group + gm[p],
                _meta_clamp_q(iqm[p], ikvm[p], km), 0)

    def kv_index(bi, hk, p, info_ref, gm, iqm, ikvm, fm, lm, qm, km):
        return (bi, hk, ikvm[p], 0)

    def lse_index(bi, hk, p, info_ref, gm, iqm, ikvm, fm, lm, qm, km):
        return (bi, hk * group + gm[p],
                _meta_clamp_q(iqm[p], ikvm[p], km), 0)

    def qvec_index(bi, hk, p, info_ref, gm, iqm, ikvm, fm, lm, qm, km):
        return (0, _meta_clamp_q(iqm[p], ikvm[p], km))

    def kvec_index(bi, hk, p, info_ref, gm, iqm, ikvm, fm, lm, qm, km):
        return (0, ikvm[p])

    in_specs = [
        pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q, 1), lse_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q, 1), lse_index, memory_space=pltpu.VMEM),
    ]
    inputs = [qs, k, v, dout, lse, delta]

    def _vec(x, blk, idx_fn):
        if x is not None:
            in_specs.append(
                pl.BlockSpec((1, blk), idx_fn, memory_space=pltpu.VMEM)
            )
            inputs.append(jnp.asarray(x, jnp.int32).reshape(1, -1))

    _vec(mask.q_segids if use_segments else None, blk_q, qvec_index)
    _vec(mask.kv_segids if use_segments else None, blk_kv, kvec_index)
    _vec(mask.q_pos if use_positions else None, blk_q, qvec_index)
    _vec(mask.kv_pos if use_positions else None, blk_kv, kvec_index)
    if use_alibi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(mask.alibi_slopes, jnp.float32) * _LOG2E)

    kernel = functools.partial(
        _dkv_kernel,
        causal=causal,
        use_positions=use_positions,
        use_segments=use_segments,
        window_left=mask.window_left,
        window_right=None if causal else mask.window_right,
        softcap=mask.softcap,
        use_alibi=use_alibi,
        dropout_p=mask.dropout_p,
        group=group,
        blk_q=blk_q,
        blk_kv=blk_kv,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_kv, d), jnp.float32),
            pltpu.VMEM((blk_kv, d), jnp.float32),
        ],
    )

    dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, skv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(info, g_map, iq_map, ikv_map, first_map, last_map, q_meta, kv_meta,
      *inputs)
    return dk, dv


def pallas_block_bwd(dout, q, k, v, lse, delta, scale, mask: MaskArgs,
                     interpret=False, blk_q=None, blk_kv=None, fused=None,
                     dq_dtype=None, out=None, dkv_dtype=None):
    """Block backward. Returns (dq, dk, dv) fp32; dk/dv per KV head.

    lse/delta: (B, Hq, Sq) fp32 from the (merged) forward.

    dq is fp32 (the ring schedules accumulate it across steps) unless
    dq_dtype narrows it — single-call paths pass q.dtype so the fused
    kernel writes the final dtype directly, saving a cast pass over HBM.

    fused=None auto-selects the single-pass fused kernel (5 matmuls/block
    pair, inputs streamed once) when the resident dk/dv accumulators fit
    VMEM; the split dq/dkv kernels below are the fallback for long KV.
    """
    b, hq, sq, d = q.shape
    skv = k.shape[2]
    if fused is None:
        from .pallas_bwd_fused import fused_bwd_supported

        fused = fused_bwd_supported(skv, d)
    if fused:
        from .pallas_bwd_fused import pallas_block_bwd_fused

        return pallas_block_bwd_fused(
            dout, q, k, v, lse, delta, scale, mask,
            interpret=interpret, blk_q=blk_q, blk_kv=blk_kv,
            dq_dtype=dq_dtype, out=out if delta is None else None,
            dkv_dtype=dkv_dtype,
        )
    if delta is None:
        # the split kernels stream delta as an input; compute it here
        delta = jnp.sum(
            dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
        )
    blk_q = blk_q or _pick_block(sq, DEFAULT_BLOCK_Q)
    blk_kv = blk_kv or _pick_block(skv, DEFAULT_BLOCK_KV)
    assert sq % blk_q == 0 and skv % blk_kv == 0, (sq, blk_q, skv, blk_kv)

    # Base-2 regime throughout (see pallas_fwd): scale*log2e folded into q,
    # lse converted to base-2 units, native exp2 on the VPU.
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    # Dead rows carry lse = NEG_INF; clamp to NEG_INF/2 so masked logits give
    # p = exp2(NEG_INF - NEG_INF/2) -> 0 instead of exp2(0) = 1 garbage.
    lse2 = jnp.maximum(lse.astype(jnp.float32) * _LOG2E, NEG_INF / 2)
    lse4 = lse2[..., None]
    delta4 = delta.astype(jnp.float32)[..., None]
    # dq kernel: fold the ds scale into the LSE (p' = p * scale).
    lse_adj = lse4 - jnp.log2(jnp.float32(scale))

    dq = _dq(dout, qs, k, v, lse_adj, delta4, mask, blk_q, blk_kv, interpret)
    # dk = ds^T @ qs picks up the log2e folded into qs; cancel it by folding
    # ln2 into the (dp - delta) factor: scale v and delta by ln2. dv uses
    # only p^T @ dout and stays exact.
    v_dkv = (v.astype(jnp.float32) * _LN2).astype(v.dtype)
    dk, dv = _dkv(
        dout, qs, k, v_dkv, lse4, delta4 * _LN2, mask, blk_q, blk_kv,
        interpret,
    )
    if dq_dtype is not None:
        dq = dq.astype(dq_dtype)
    if dkv_dtype is not None:
        dk = dk.astype(dkv_dtype)
        dv = dv.astype(dkv_dtype)
    return dq, dk, dv
