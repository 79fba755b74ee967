"""Pallas TPU flash-attention forward kernel.

This is the framework's L1 kernel — the role the external flash-attn CUDA
`_flash_attn_forward` plays for the reference (reference ring_flash_attn.py:3,
53-58). Contract upward: returns ``(out f32, lse f32)`` so schedules can
merge partials across ring steps with fp32 LSE rescaling.

Design (TPU-first):
- Grid iterates (batch, q-head, q-block × kv-block); online-softmax state
  (m, l, acc) lives in VMEM scratch and is flushed on each q-block's last
  KV step.
- For causal masks with a *static* diagonal offset the (q-block, kv-block)
  pair space is enumerated **triangularly**: a scalar-prefetched pair->block
  mapping drives the BlockSpec index maps, so blocks above the diagonal are
  never fetched, never iterated — zero wasted grid steps (this is where the
  reference's `step <= rank` causal skipping lives at kernel granularity,
  reference ring_flash_attn.py:30).
- For traced offsets (llama3's rank*L inside shard_map) the grid stays
  rectangular but the kv index map clamps out-of-range blocks to the last
  needed block (revisit = no DMA) and `pl.when` skips their compute.
- GQA is expressed in the k/v BlockSpec index maps (q head -> kv head).
- The causal mask pass itself runs only on diagonal-crossing blocks;
  interior blocks take a mask-free fast path (VPU savings).
- varlen is segment-ids + optional per-token positions (MaskArgs), masked
  element-wise with the NEG_INF sentinel — same semantics as ops.naive.
- softmax_scale is folded into k once in the wrapper (one fused HBM pass,
  group-x smaller than q under GQA) instead of a per-block VPU multiply.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mask import MaskArgs, NEG_INF

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_KV = 1024

_LOG2E = 1.4426950408889634  # log2(e): folded into q so the kernel uses exp2
_LN2 = 0.6931471805599453


def _pick_block(s, preferred):
    """Largest power-of-two block <= preferred that divides s."""
    b = min(preferred, s)
    while s % b != 0:
        b //= 2
    return max(b, 1)


def _static_int(x):
    return x is None or isinstance(x, (int, np.integer))


def mask_info(mask):
    """Scalar-prefetch info for the kernels: (4,) int32
    [q offset, kv offset, dropout seed, head offset], plus whether the
    RELATIVE offset (what the causal grid logic needs) is static, and its
    static value."""
    def scalar(x):
        # np scalar when static: jnp here would eagerly commit a device
        # constant whose lowering round-trips the tunnel (~12s each)
        return np.int32(0) if x is None else (
            np.int32(x) if _static_int(x) else jnp.asarray(x, jnp.int32)
        )

    if mask.offset is not None and mask.offset is mask.kv_offset:
        # identical traced objects => relative shift is provably 0 (ring
        # diagonal steps pass the same rank*L for both): the triangular
        # causal grid stays available
        rel_static, static_rel = True, 0
    else:
        rel_static = _static_int(mask.offset) and _static_int(mask.kv_offset)
        static_rel = (
            int(mask.offset or 0) - int(mask.kv_offset or 0)
            if rel_static else 0
        )
    vals = [scalar(mask.offset), scalar(mask.kv_offset),
            scalar(mask.dropout_seed), scalar(mask.head_offset)]
    stack = (
        np.stack if all(isinstance(v, np.int32) for v in vals) else jnp.stack
    )
    info = stack(vals)
    return info, rel_static, static_rel


def _block_bounds(x, blk, xp=jnp):
    xb = xp.asarray(x, xp.int32).reshape(-1, blk)
    return xp.min(xb, axis=1), xp.max(xb, axis=1)


def _needed_range(needed, axis, xp=jnp):
    """first/last True index along `axis` of a 2-D bool matrix (0 if none)."""
    n = needed.shape[axis]
    any_ = needed.any(axis=axis)
    first = xp.where(any_, xp.argmax(needed, axis=axis), 0)
    last = xp.where(
        any_, n - 1 - xp.argmax(xp.flip(needed, axis=axis), axis=axis), 0
    )
    return first.astype(xp.int32), last.astype(xp.int32)


def block_meta(mask: "MaskArgs", blk_q, blk_kv, kv_sub, n_q, n_kv, xp=jnp):
    """Scalar-prefetch block bounds for segment/position-aware skipping.

    Returns (q_meta (6, n_q), kv_meta (6, n_kv * blk_kv // kv_sub)) int32:
      q_meta rows:  [seg_min, seg_max, pos_min, pos_max,
                     first_needed_kv_macro, last_needed_kv_macro]
      kv_meta rows (per KV SUB-tile): [seg_min, seg_max, pos_min, pos_max,
                     first_needed_q_block, last_needed_q_block]

    Rows 0-3 drive the kernels' per-sub-tile three-way dispatch; rows 4/5
    are the same skip predicate aggregated into contiguous DMA ranges so
    the index maps never fetch provably-masked blocks (q-major kernels
    clamp kv by q_meta[4:6]; the kv-major dkv kernel clamps q by
    kv_meta[4:6]). Ranges are conservative: interior "holes" are fetched
    but compute-skipped.
    """
    use_segments = mask.q_segids is not None
    use_positions = mask.q_pos is not None
    z_q = xp.zeros((n_q,), xp.int32)
    n_kv_sub = n_kv * (blk_kv // kv_sub)
    z_kv = xp.zeros((n_kv_sub,), xp.int32)
    qsmin = qsmax = z_q
    ksmin = ksmax = z_kv
    qpmin = qpmax = z_q
    kpmin = kpmax = z_kv
    if use_segments:
        qsmin, qsmax = _block_bounds(mask.q_segids, blk_q, xp)
        ksmin, ksmax = _block_bounds(mask.kv_segids, kv_sub, xp)
    if use_positions:
        qpmin, qpmax = _block_bounds(mask.q_pos, blk_q, xp)
        kpmin, kpmax = _block_bounds(mask.kv_pos, kv_sub, xp)

    # (n_q, n_kv_sub) skip matrix == the kernels' scalar predicate,
    # vectorized (causal-by-iota handled by the kernels' block arithmetic
    # and the existing causal index-map clamp, not here)
    skip = xp.zeros((n_q, n_kv_sub), bool)
    if use_segments:
        skip |= (qsmax[:, None] < ksmin[None, :]) | (
            ksmax[None, :] < qsmin[:, None]
        )
    if mask.causal and use_positions:
        skip |= qpmax[:, None] < kpmin[None, :]
        if mask.window_left is not None:
            skip |= (qpmin[:, None] - kpmax[None, :]) > mask.window_left
    needed = xp.logical_not(skip)
    kv_first, kv_last = _needed_range(
        needed.reshape(n_q, n_kv, -1).any(axis=2), axis=1, xp=xp
    )
    q_first, q_last = _needed_range(needed, axis=0, xp=xp)
    q_meta = xp.stack([qsmin, qsmax, qpmin, qpmax, kv_first, kv_last])
    kv_meta = xp.stack([ksmin, ksmax, kpmin, kpmax, q_first, q_last])
    return q_meta, kv_meta


def _fwd_kernel(
    # scalar prefetch
    info_ref,  # (4,) int32: [q offset, kv offset, dropout seed, head off]
    iq_map_ref,  # (P,) int32: pair -> q block (triangular) or None-like
    ikv_map_ref,  # (P,) int32: pair -> kv block
    qmeta_ref,  # (6, n_q) int32 block bounds (see block_meta) or dummy
    kvmeta_ref,  # (6, n_kv_sub) int32 sub-tile bounds or dummy
    *refs,  # q, k, v, [qseg, kseg], [qpos, kpos], out, lse, m_s, l_s, acc_s
    causal,
    use_positions,
    use_segments,
    triangular,
    compact,
    static_offset,
    window_left,
    window_right,
    softcap,
    use_alibi,
    dropout_p,
    blk_q,
    blk_kv,
    sub,
    fine,
    num_kv_blocks,
    spec,
):
    it = iter(refs)
    q_ref = next(it)  # (1, 1, blk_q, D)
    k_ref = next(it)  # (1, 1, blk_kv, D)
    v_ref = next(it)  # (1, 1, blk_kv, D)
    qseg_ref = next(it) if use_segments else None  # (1, blk_q) int32
    kseg_ref = next(it) if use_segments else None  # (1, blk_kv) int32
    qpos_ref = next(it) if use_positions else None  # (1, blk_q) int32
    kpos_ref = next(it) if use_positions else None  # (1, blk_kv) int32
    slopes_ref = next(it) if use_alibi else None  # (Hq,) f32 SMEM (x log2e)
    out_ref = next(it)  # (1, 1, blk_q, D) f32
    lse_ref = next(it)  # (1, 1, blk_q, 1) f32
    m_s = next(it)  # (blk_q, 128) f32
    l_s = next(it)  # (blk_q, 128) f32
    acc_s = next(it)  # (blk_q, D) f32

    # blk_kv is the DMA/grid macro block; the kernel iterates n_sub
    # sub-tiles of width `sub` inside it. Larger macro blocks amortize
    # per-grid-step bookkeeping (measured: mask-free 67.4% at 2048 vs
    # 59.8% at 1024 on v5e) while sub-tile-granular causal skipping and
    # masking keep the diagonal waste of small blocks.
    n_sub = blk_kv // sub

    b_id = pl.program_id(0)
    h_id = pl.program_id(1)
    # the causal/grid logic only ever sees the RELATIVE shift; absolute
    # coordinates (info[0], info[1] separately) matter to dropout/ALiBi
    rel = info_ref[0] - info_ref[1]
    if triangular:
        p = pl.program_id(2)
        iq = iq_map_ref[p]
        ikv = ikv_map_ref[p]
        if compact:
            # compact enumeration runs [row4, row5] per q block (wrapper
            # clamps the rows to the enumerated range)
            is_last = ikv == qmeta_ref[5, iq]
            init_kv = qmeta_ref[4, iq]
        else:
            # #kv blocks this q block needs (static offset => scalar
            # arithmetic)
            nkv_needed = jnp.clip(
                ((iq + 1) * blk_q - 1 + static_offset) // blk_kv + 1,
                1,
                num_kv_blocks,
            )
            is_last = ikv == nkv_needed - 1
            init_kv = 0
    else:
        iq = pl.program_id(2)
        ikv = pl.program_id(3)
        is_last = ikv == num_kv_blocks - 1
        init_kv = 0

    @pl.when(ikv == init_kv)
    def _init():
        # only lane 0 of m/l is ever read; narrow stores save VPU cycles
        # spec modes seed m with TRUE -inf (not the finite sentinel): it
        # marks "reference not yet set" unambiguously — fully-skipped
        # q-blocks flush dead off l == 0, and setonce rows promote off
        # the -inf marker at their first live tile.
        init_m = -jnp.inf if spec else NEG_INF
        m_s[:, :1] = jnp.full((blk_q, 1), init_m, jnp.float32)
        l_s[:, :1] = jnp.zeros((blk_q, 1), jnp.float32)
        acc_s[...] = jnp.zeros_like(acc_s)

    def _qp_kp(start, width):
        if use_positions:
            qp = qpos_ref[0, :].reshape(blk_q, 1)
            kp = kpos_ref[0, start:start + width].reshape(1, width)
        else:
            qp = (
                iq * blk_q + info_ref[0]
                + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0)
            )
            kp = (
                ikv * blk_kv + start + info_ref[1]
                + jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
            )
        return qp, kp

    def _keep(start, width):
        """Deterministic dropout keep-mask from absolute coordinates —
        identical across block shapes, fwd/bwd kernels, backends, and ring
        steps (see ops/mask.py)."""
        from .mask import dropout_keep, dropout_row_hash, dropout_threshold

        qp, kp = _qp_kp(start, width)
        qseg = qseg_ref[0, :].reshape(blk_q, 1) if use_segments else None
        rh = dropout_row_hash(
            qp, qseg, h_id + info_ref[3], b_id, info_ref[2]
        )
        return dropout_keep(rh, kp, dropout_threshold(dropout_p))

    use_window = window_left is not None or window_right is not None

    def _allowed(start, width):
        allowed = None
        if causal or use_window:
            qp, kp = _qp_kp(start, width)
            if causal:
                allowed = qp >= kp
            if window_left is not None:
                c = (qp - kp) <= window_left
                allowed = c if allowed is None else (allowed & c)
            if window_right is not None:
                c = (kp - qp) <= window_right
                allowed = c if allowed is None else (allowed & c)
        if use_segments:
            qs = qseg_ref[0, :].reshape(blk_q, 1)
            ks = kseg_ref[0, start:start + width].reshape(1, width)
            seg = qs == ks
            allowed = seg if allowed is None else (allowed & seg)
        return allowed

    def _logits(start, width):
        # k arrives pre-scaled by softmax_scale * log2e. Feed the MXU its
        # native input dtype (bf16 in, f32 accumulate); casting inputs to
        # f32 first would quarter the matmul rate.
        s = jax.lax.dot_general(
            q_ref[0, 0],
            k_ref[0, 0, start:start + width, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, width) f32
        if softcap:
            # Logits are in base-2 units (log2e folded into q), so the cap
            # scales the same way: cap2 * tanh(s2 / cap2) == log2e * the
            # natural-units capped logit.
            cap2 = jnp.float32(softcap * _LOG2E)
            s = cap2 * jnp.tanh(s * (1.0 / cap2))
        if use_alibi:
            qp, kp = _qp_kp(start, width)
            dist = (qp - kp).astype(jnp.float32)
            if not causal:
                dist = jnp.abs(dist)
            # slope arrives pre-multiplied by log2e (base-2 regime)
            s = s - slopes_ref[h_id] * dist
        return s

    def _update(start, width, masked, maybe_first=False):
        """Online-softmax state update with the logits of kv span
        [start, start+width) — (blk_q, width).

        Logits arrive in base-2 units (log2(e) folded into the k pre-scale),
        so the VPU runs native exp2 instead of exp (= exp2 + a multiply per
        element); m/l are tracked base-2 and converted at flush.

        spec mode (r5, tools/exp_fwd_r5.py): the per-sub-tile max-reduce +
        alpha + acc rescale chain is THE forward's binding VPU cost (its
        deletion moves the mask-free kernel 78.8 -> 92.9% of peak — the
        max/rescale serializes the acc read-modify-write; exp2 and the row
        sum are hidden under the MXU). spec fixes m ONCE per q-block from
        the first computed sub-tile's row max and pure-accumulates after —
        mathematically exact (softmax is shift-invariant; f32 is
        scale-invariant) unless a later tile's logits exceed m_ref by
        ~2^100, which the flush flags as lse=+inf and the wrapper repairs
        with the exact online-softmax path (lax.cond fallback)."""
        if spec == "first" and maybe_first:
            # The m_ref set must NOT sit as a conditional region between
            # the QK matmul and the exp2 of the always-taken path — that
            # stalls Mosaic's pipelining on EVERY grid step (measured:
            # 80.4% vs 92.9% of peak mask-free). Instead the whole
            # first-vs-rest update is duplicated into two pl.when
            # branches, each straight-line (matmul included).
            @pl.when(ikv == init_kv)
            def _first_tile():
                _update_body(start, width, masked, True)

            @pl.when(ikv != init_kv)
            def _later_tile():
                _update_body(start, width, masked, False)

            return
        _update_body(start, width, masked, False)

    def _update_body(start, width, masked, first):
        s = _logits(start, width)
        if masked:
            s = jnp.where(_allowed(start, width), s, NEG_INF)
        if spec == "first":
            if first:
                rowmax = jnp.max(s, axis=1, keepdims=True)
                # Rows fully masked in their first computed tile get a
                # +inf reference, so every later pr underflows to exactly
                # 0 and the row flushes dead (l stays 0). That is EXACT
                # for this mode's gate (plain causal, e.g. stripe's
                # static -1 offset): a row dead at the leftmost kv tile
                # is dead at every later tile too. Live rows always carry
                # l >= 1 (their tile-0 argmax contributes exp2(0)).
                m_ref = jnp.where(rowmax > NEG_INF / 2, rowmax, jnp.inf)
                m_s[:, :1] = m_ref
            else:
                m_ref = m_s[:, :1]
            pr = jnp.exp2(s - m_ref)
            l_new = l_s[:, :1] + jnp.sum(pr, axis=1, keepdims=True)
        elif spec == "setonce":
            # varlen/window spec: rows become live at different tiles
            # (segment starts, window edges), so the reference max is set
            # per-row at its FIRST live tile — a per-tile row max plus two
            # (blk_q,1) selects, still no alpha and no acc rescale. Rows
            # not yet live use +inf so their (all-masked) probabilities
            # underflow to exactly 0.
            rowmax = jnp.max(s, axis=1, keepdims=True)
            m_prev = m_s[:, :1]
            m_ref = jnp.where(
                (m_prev == -jnp.inf) & (rowmax > NEG_INF / 2),
                rowmax, m_prev,
            )
            m_s[:, :1] = m_ref
            m_eff = jnp.where(m_ref == -jnp.inf, jnp.inf, m_ref)
            pr = jnp.exp2(s - m_eff)
            l_new = l_s[:, :1] + jnp.sum(pr, axis=1, keepdims=True)
        else:
            m_prev = m_s[:, :1]  # (blk_q, 1)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_new)
            pr = jnp.exp2(s - m_new)
            l_new = l_s[:, :1] * alpha + jnp.sum(pr, axis=1, keepdims=True)
        if dropout_p:
            # dropout on the (normalized-at-flush) probabilities: the l
            # statistic stays undropped, only the PV operand is masked
            pr_v = jnp.where(_keep(start, width), pr, 0.0) * jnp.float32(
                1.0 / (1.0 - dropout_p)
            )
        else:
            pr_v = pr
        # pr is cast to the V dtype for the PV matmul (flash-attention's
        # standard trick; the fp32 row statistics keep the result accurate).
        pv = jax.lax.dot_general(
            pr_v.astype(v_ref.dtype),
            v_ref[0, 0, start:start + width, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if spec:
            acc_s[...] = acc_s[...] + pv
        else:
            acc_s[...] = acc_s[...] * alpha + pv
            m_s[:, :1] = m_new
        l_s[:, :1] = l_new

    # Per-sub-tile three-way dispatch: SKIP (fully masked — no compute, and
    # for out-of-range macro blocks no DMA either, via the index-map clamp),
    # mask-free fast path (fully allowed), or the masked pass (diagonal /
    # segment-boundary / window-edge tiles). Decided at scalar level from
    # per-block bounds: implicit positions use block arithmetic, explicit
    # varlen positions/segments use the prefetched block_meta bounds — the
    # Pallas analog of flash-attn varlen's cu_seqlens block skipping
    # (reference ring_flash_attn_varlen.py:56-59 relies on it in CUDA).
    # pl.when predication (Mosaic branches poorly through lax.cond).
    # Mixed granularity (round 4): a MASKED sub-tile re-dispatches in
    # `fine`-wide strips with the same skip/free/masked predicate (kvmeta
    # is at fine granularity), so mostly-dead boundary tiles — varlen
    # segment edges, window edges — pay ~fine/sub of the masked work.
    # fine == sub disables the strip pass (fully-allowed tiles always keep
    # the `sub`-wide fast path either way).
    if use_segments or use_positions:
        qsmin = qmeta_ref[0, iq]
        qsmax = qmeta_ref[1, iq]
        qpmin = qmeta_ref[2, iq]
        qpmax = qmeta_ref[3, iq]

    def _bounds(start, width):
        """(skip, free) traced scalars for kv span [start, start+width)."""
        skip = None  # None = statically false
        free = None  # None = statically true
        if use_segments or ((causal or use_window) and use_positions):
            j0 = ikv * (blk_kv // fine) + start // fine

            def agg(row, op):
                val = kvmeta_ref[row, j0]
                for s_ in range(1, width // fine):
                    val = op(val, kvmeta_ref[row, j0 + s_])
                return val

        if causal or use_window:
            # lo/hi = bounds of (q position - kv position) on this span
            if use_positions:
                lo = qpmin - agg(3, jnp.maximum)
                hi = qpmax - agg(2, jnp.minimum)
            else:
                sub_start = ikv * blk_kv + start
                lo = iq * blk_q + rel - (sub_start + width - 1)
                hi = iq * blk_q + blk_q - 1 + rel - sub_start
            if causal:
                skip = hi < 0  # every pair above the diagonal
                free = lo >= 0  # every pair at/below the diagonal
            if window_left is not None:
                c_s = lo > window_left  # every pair left of window
                c_f = hi <= window_left  # every pair inside window
                skip = c_s if skip is None else (skip | c_s)
                free = c_f if free is None else (free & c_f)
            if window_right is not None:
                c_s = hi < -window_right  # every pair right of window
                c_f = lo >= -window_right  # every pair inside window
                skip = c_s if skip is None else (skip | c_s)
                free = c_f if free is None else (free & c_f)
        if use_segments:
            # disjoint segment-id RANGES => no pair can match (ranges
            # are conservative: overlap without equality just takes the
            # masked pass)
            ksmin = agg(0, jnp.minimum)
            ksmax = agg(1, jnp.maximum)
            sd = (qsmax < ksmin) | (ksmax < qsmin)
            sf = (qsmin == qsmax) & (ksmin == ksmax) & (qsmin == ksmin)
            skip = sd if skip is None else (skip | sd)
            free = sf if free is None else (free & sf)
        return skip, free

    def _dispatch(start, width, maybe_first=False):
        skip, free = _bounds(start, width)

        @pl.when(jnp.logical_not(skip) & free)
        def _unmasked():
            _update(start, width, False, maybe_first)

        @pl.when(jnp.logical_not(skip) & jnp.logical_not(free))
        def _masked():
            if width > fine:
                for s_ in range(width // fine):
                    _dispatch(start + s_ * fine, fine, maybe_first and s_ == 0)
            else:
                _update(start, width, True, maybe_first)

    for t in range(n_sub):
        if causal or use_segments or use_window:
            _dispatch(t * sub, sub, maybe_first=t == 0)
        else:
            _update(t * sub, sub, False, maybe_first=t == 0)

    @pl.when(is_last)
    def _flush():
        l = l_s[:, :1]
        if spec:
            m = m_s[:, :1]
            # dead row = nothing ever accumulated: l exactly 0 (live rows
            # always have l >= 1 — the reference-setting tile's argmax
            # contributes exp2(0) — and +inf-poisoned rows only ever add
            # 0) -> out=0 / lse=NEG_INF as in online mode. Overflow (l
            # inf or nan, or l so large that acc = l*max|v| may have
            # overflowed before l did) -> lse=+inf, the flag the
            # wrapper's fallback cond reads.
            dead = l == 0.0
            log2l = jnp.log2(jnp.where(dead, 1.0, l))
            bad = jnp.logical_or(
                jnp.logical_not(l < jnp.inf), log2l >= 100.0
            )
            bad = jnp.logical_and(bad, jnp.logical_not(dead))
            l_safe = jnp.where(l == 0.0, 1.0, l)
            out_ref[0, 0] = jnp.where(
                dead | bad, 0.0, acc_s[...] / l_safe
            ).astype(out_ref.dtype)
            lse_ref[0, 0] = jnp.where(
                dead, NEG_INF,
                jnp.where(bad, jnp.inf, (m + log2l) * jnp.float32(_LN2)),
            )
            return
        # "Dead" rows (every key masked, m still at the sentinel) normalize
        # to out=0 / lse=NEG_INF — identical across backends, weight-zero in
        # merge_partials.
        dead = jnp.logical_or(l == 0.0, m_s[:, :1] <= NEG_INF / 2)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = jnp.where(dead, 0.0, acc_s[...] / l_safe).astype(
            out_ref.dtype
        )
        # m is in base-2 units; emit lse in natural-log units
        lse_ref[0, 0] = jnp.where(
            dead, NEG_INF,
            (m_s[:, :1] + jnp.log2(l_safe)) * jnp.float32(_LN2),
        )


def pallas_block_fwd(q, k, v, scale, mask: MaskArgs, interpret=False,
                     blk_q=None, blk_kv=None, out_dtype=None, kv_sub=None,
                     kv_fine=None, softmax_mode="auto"):
    """q (B,Hq,Sq,D), k/v (B,Hkv,Skv,D) -> (out (B,Hq,Sq,D), lse f32 (B,Hq,Sq)).

    out_dtype defaults to fp32 (the merge-ready contract the schedules
    need); single-call paths pass q.dtype so the kernel writes the final
    dtype directly, saving a full HBM round-trip for the cast.

    blk_kv is the DMA/grid macro block; kv_sub the in-kernel sub-tile
    width for masking/causal-skipping granularity (defaults per measured
    v5e optima; see _fwd_kernel).

    softmax_mode: "auto" picks "spec" (fixed per-q-block max reference,
    see _update — mask-free 78.8 -> 92.9% of peak) on the batch paths it
    is measured-safe for, with an exact lax.cond fallback to "online"
    (classic running-max online softmax) on the in-kernel overflow flag;
    "online" forces the classic path (also what the interpreter and the
    fallback use)."""
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    assert hq % hkv == 0, (hq, hkv)
    group = hq // hkv

    # Fold the softmax scale AND log2(e) into k up front (fp32 multiply,
    # cast back): one fused HBM pass over k — group-x smaller than q under
    # GQA — vs. a VPU multiply over every logit block, and base-2 logits
    # for native exp2 in the kernel.
    k_unscaled = k  # the spec-overflow fallback re-enters with raw k
    k = (k.astype(jnp.float32) * (scale * _LOG2E)).astype(k.dtype)

    causal = bool(mask.causal)
    blk_q = blk_q or _pick_block(sq, DEFAULT_BLOCK_Q)
    blk_kv = blk_kv or _pick_block(skv, 2048)
    # sub-tile: causal skipping/masking at 1024 granularity inside the
    # 2048 macro block (measured best on v5e; see docs/DESIGN.md §7)
    kv_sub = kv_sub or min(blk_kv, 1024)
    while blk_kv % kv_sub:
        kv_sub //= 2
    assert sq % blk_q == 0 and skv % blk_kv == 0, (sq, blk_q, skv, blk_kv)
    n_q = sq // blk_q
    n_kv = skv // blk_kv

    use_positions = mask.q_pos is not None
    use_segments = mask.q_segids is not None
    # masked-strip width (mixed granularity, see _fwd_kernel). Default:
    # DISABLED (== kv_sub) for the forward — measured a consistent loss on
    # every packing (r4 sweep: 1-seg 60.5% -> 47.8% at fine=256, 5-seg
    # 31.8% -> 23.7% at 512): each strip repeats the full-width
    # online-softmax VPU chain (m/l/acc rescale over (blk_q, D)), which
    # the bwd does not pay. Available as an explicit opt-in.
    kv_fine = kv_fine or kv_sub
    while kv_sub % kv_fine:
        kv_fine //= 2
    use_alibi = mask.alibi_slopes is not None
    info, offset_static, static_offset = mask_info(mask)
    # Triangular pair enumeration needs the diagonal position at trace
    # time: static relative offsets qualify, and so do packed_self varlen
    # layouts (allowed pairs provably lie in the packed-index triangle;
    # see MaskArgs.packed_self).
    if use_positions:
        triangular = causal and mask.packed_self
        static_offset = 0
    else:
        triangular = causal and offset_static

    use_meta = use_segments or use_positions
    # Static (numpy) metadata unlocks COMPACT pair enumeration: the grid
    # runs over only the needed (q, kv-macro) pairs, so provably-masked
    # blocks cost zero grid steps — the full analog of flash-attn varlen's
    # dynamic launch config. Traced metadata (training with changing
    # packings) keeps the static triangular grid with clamp/compute
    # skipping. Callers opt in by passing np.ndarray segids/positions.
    static_meta = use_meta and all(
        x is None or isinstance(x, np.ndarray)
        for x in (mask.q_segids, mask.kv_segids, mask.q_pos, mask.kv_pos)
    )
    if use_meta:
        # kv bounds at kv_fine granularity (the strip dispatch needs them;
        # sub-tile bounds aggregate in-kernel from the strips)
        q_meta, kv_meta = block_meta(
            mask, blk_q, blk_kv, kv_fine, n_q, n_kv,
            xp=np if static_meta else jnp,
        )
    else:
        q_meta = np.zeros((6, 1), np.int32)  # unused
        kv_meta = np.zeros((6, 1), np.int32)

    def _meta_clamp(qi, ki, qmeta_ref):
        # skipped macro blocks revisit a boundary block: no DMA is issued
        # for blocks the segment/position bounds fully exclude
        if use_meta:
            ki = jnp.clip(ki, qmeta_ref[4, qi], qmeta_ref[5, qi])
        return ki

    compact = triangular and static_meta
    if triangular:
        pairs = []
        if compact:
            # clamp the needed ranges to the causal triangle and write them
            # back so the kernel's init/flush predicates (ikv == row4/row5)
            # see exactly the enumerated range
            q_meta = np.array(q_meta)
            for iq in range(n_q):
                diag = min(
                    n_kv - 1,
                    max(0, ((iq + 1) * blk_q - 1 + static_offset) // blk_kv),
                )
                end = min(diag, int(q_meta[5, iq]))
                start = min(int(q_meta[4, iq]), end)
                q_meta[4, iq], q_meta[5, iq] = start, end
                pairs.extend((iq, ikv) for ikv in range(start, end + 1))
        else:
            for iq in range(n_q):
                nkv_needed = min(
                    n_kv,
                    max(1, ((iq + 1) * blk_q - 1 + static_offset) // blk_kv + 1),
                )
                pairs.extend((iq, ikv) for ikv in range(nkv_needed))
        iq_map = np.asarray([p[0] for p in pairs], np.int32)
        ikv_map = np.asarray([p[1] for p in pairs], np.int32)
        grid = (b, hq, len(pairs))

        def q_index(bi, hi, p, info_ref, iq_map_ref, ikv_map_ref, qm, km):
            return (bi, hi, iq_map_ref[p], 0)

        def kv_index(bi, hi, p, info_ref, iq_map_ref, ikv_map_ref, qm, km):
            ki = _meta_clamp(iq_map_ref[p], ikv_map_ref[p], qm)
            return (bi, hi // group, ki, 0)

        def qvec_index(bi, hi, p, info_ref, iq_map_ref, ikv_map_ref, qm, km):
            return (0, iq_map_ref[p])

        def kvec_index(bi, hi, p, info_ref, iq_map_ref, ikv_map_ref, qm, km):
            return (0, _meta_clamp(iq_map_ref[p], ikv_map_ref[p], qm))

        def out_index(bi, hi, p, info_ref, iq_map_ref, ikv_map_ref, qm, km):
            return (bi, hi, iq_map_ref[p], 0)

        def lse_index(bi, hi, p, info_ref, iq_map_ref, ikv_map_ref, qm, km):
            return (bi, hi, iq_map_ref[p], 0)

        dim_semantics = ("parallel", "parallel", "arbitrary")
    else:
        iq_map = np.zeros((1,), np.int32)  # unused
        ikv_map = np.zeros((1,), np.int32)
        grid = (b, hq, n_q, n_kv)

        def q_index(bi, hi, qi, ki, info_ref, iq_map_ref, ikv_map_ref,
                    qm, km):
            return (bi, hi, qi, 0)

        def _clamp_kv(qi, ki, info_ref, qm):
            if causal and not use_positions:
                # out-of-diagonal steps revisit the last in-range block: no
                # DMA is issued for blocks the causal mask fully excludes.
                # (info[0]-info[1] = the relative q-vs-kv shift)
                last_needed = jnp.maximum(
                    ((qi + 1) * blk_q - 1 + info_ref[0] - info_ref[1])
                    // blk_kv, 0
                )
                ki = jnp.minimum(ki, jnp.minimum(last_needed, n_kv - 1))
            return _meta_clamp(qi, ki, qm)

        def kv_index(bi, hi, qi, ki, info_ref, iq_map_ref, ikv_map_ref,
                     qm, km):
            return (bi, hi // group, _clamp_kv(qi, ki, info_ref, qm), 0)

        def qvec_index(bi, hi, qi, ki, info_ref, iq_map_ref, ikv_map_ref,
                       qm, km):
            return (0, qi)

        def kvec_index(bi, hi, qi, ki, info_ref, iq_map_ref, ikv_map_ref,
                       qm, km):
            return (0, _clamp_kv(qi, ki, info_ref, qm))

        def out_index(bi, hi, qi, ki, info_ref, iq_map_ref, ikv_map_ref,
                      qm, km):
            return (bi, hi, qi, 0)

        def lse_index(bi, hi, qi, ki, info_ref, iq_map_ref, ikv_map_ref,
                      qm, km):
            return (bi, hi, qi, 0)

        dim_semantics = ("parallel", "parallel", "parallel", "arbitrary")

    in_specs = [
        pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
    ]
    inputs = [q, k, v]

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
        # per-head slopes ride in SMEM (indexed by the head grid id in the
        # kernel), pre-multiplied by log2e for the base-2 regime
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(mask.alibi_slopes, jnp.float32) * _LOG2E)

    # spec softmax (fixed per-row max reference, tools/exp_fwd_r5.py):
    # "first" on the plain batch paths (reference set once per q-block
    # from the first sub-tile — zero per-tile max work), "setonce" when
    # segments/positions/windows mean rows go live at different tiles
    # (per-tile row max + select, still no rescale). ALiBi stays online:
    # its distance bias puts the first-tile max ~slope*S below the true
    # max, which would bounce big-slope heads off the overflow fallback
    # every call. Dropout and softcap compose fine (softcap overflow at
    # huge caps is caught by the flag). The interpreter keeps the online
    # path (it is a test-only mode and inf/NaN sentinel semantics differ
    # subtly there).
    if softmax_mode == "online" or use_alibi or interpret:
        spec = False
    elif use_meta or mask.window_left is not None or (
        not causal and mask.window_right is not None
    ):
        spec = "setonce"
    else:
        spec = "first"

    kernel = functools.partial(
        _fwd_kernel,
        causal=causal,
        use_positions=use_positions,
        use_segments=use_segments,
        triangular=triangular,
        compact=compact,
        static_offset=static_offset,
        window_left=mask.window_left,
        window_right=None if causal else mask.window_right,
        softcap=mask.softcap,
        use_alibi=use_alibi,
        dropout_p=mask.dropout_p,
        blk_q=blk_q,
        blk_kv=blk_kv,
        sub=kv_sub,
        fine=kv_fine,
        num_kv_blocks=n_kv,
        spec=spec,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, blk_q, d), out_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q, 1), lse_index, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sq, d), out_dtype or jnp.float32),
            jax.ShapeDtypeStruct((b, hq, sq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_semantics,
            # headroom over the default 16MB scoped-vmem for 2048 macro
            # blocks + feature-path intermediates
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * sq * skv * hq * d * (0.5 if causal else 1.0)),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + b * hq * sq * d * 4,
            transcendentals=b * hq * sq * skv,
        ),
        interpret=interpret,
    )(info, iq_map, ikv_map, q_meta, kv_meta, *inputs)
    lse = lse.squeeze(-1)

    if spec and softmax_mode != "spec":
        # Exact repair of the (data-pathological) spec overflow: the flush
        # encodes it as lse=+inf (or NaN propagation); scan over lse is a
        # ~1MB pass. The online branch only executes when the flag fires —
        # never on sane data — so the headline pays one scalar reduce +
        # cond dispatch. (softmax_mode="spec" skips the fallback: the
        # experiment/bench mode where a silent +inf is acceptable.)
        bad = jnp.any(jnp.logical_not(lse < jnp.inf))  # +inf or NaN

        def _repair(_):
            return pallas_block_fwd(
                q, k_unscaled, v, scale, mask, interpret=interpret,
                blk_q=blk_q, blk_kv=blk_kv, out_dtype=out_dtype,
                kv_sub=kv_sub, kv_fine=kv_fine, softmax_mode="online",
            )

        out, lse = jax.lax.cond(bad, _repair, lambda _: (out, lse), None)
    return out, lse
