"""Fused Pallas TPU flash-attention backward kernel (dq + dk + dv).

The split kernels in pallas_bwd.py recompute the probability block in both
orientations: the dq kernel does (s, dp, dq) and the dkv kernel does
(s^T, dv, dp^T, dk) — 7 MXU matmuls per block pair where the math needs 5.
This kernel computes the block once and feeds all three gradients:

    s  = q @ ks^T              (ks = k * scale * log2e, base-2 logits;
                                prescaling K instead of Q costs a 4x
                                smaller HBM pass under GQA)
    p  = exp2(s - lse2)        (exact probabilities; lse2 unshifted)
    dp = dout @ vs^T           (vs = v * scale  =>  dp = scale * dout@v^T)
    ds = p * (dp - delta_s)    (delta_s = delta * scale)
    dq += ds @ ks, rescaled by ln2/scale at the per-q-block flush
               (ds carries scale, ks carries scale*log2e => the product is
               scale*log2e too big; one VPU pass over (blk_q, D) per flush)
    dv[ikv] += p^T @ dout                           [exact]
    dk[ikv] += ds^T @ q                             [exact: ds carries the
               one factor of scale dk needs — no final rescale pass]

Atomics-free accumulation (TPU has no scatter-add): the grid runs
(batch, kv-head, pair) with pairs enumerated q-major per GQA group member
(g, iq, ikv-inner).  dq accumulates in a (blk_q, D) scratch flushed at each
q-block's last KV step; dk/dv accumulate via dynamic-slice stores directly
into their full (Skv, D) fp32 output blocks, which stay VMEM-resident for
the whole (batch, kv-head) program (their index map is constant in the pair
dimension) and are written back to HBM once per head.  This also halves HBM
traffic vs the split kernels: inputs are streamed once, not twice.

Same role as flash-attn's fused `_flash_attn_backward`
(reference ring_flash_attn.py:103-131), which computes dq/dk/dv in one CUDA
kernel (with atomic dq accumulation); this is the TPU-native equivalent.

VMEM cost: 2 * Skv * D * 4 bytes for the resident dk/dv blocks — the
wrapper falls back to the split kernels when that exceeds the budget.
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
from .pallas_fwd import _LN2, _LOG2E, mask_info

# dk/dv resident fp32 accumulators: fall back to the split kernels past this
FUSED_MAX_KV_BYTES = 32 * 1024 * 1024


def _bwd_fused_kernel(
    info_ref,
    g_map_ref,  # (P,) pair -> GQA group member
    iq_map_ref,  # (P,) pair -> q block
    ikv_map_ref,  # (P,) pair -> kv block
    qlast_map_ref,  # (P,) 1 iff last kv step of this (g, q-block)
    qmeta_ref,  # (6, n_q) int32 block bounds (see pallas_fwd.block_meta)
    kvmeta_ref,  # (6, n_kv_fine) int32 fine-strip bounds or dummy
    *refs,
    causal,
    use_positions,
    use_segments,
    triangular,
    window_left,
    window_right,
    softcap,
    use_alibi,
    dropout_p,
    group,
    blk_q,
    blk_kv,
    sub,
    fine,
    num_kv_blocks,
    dq_rescale,
    fold_delta,
    delta_scale,
    narrow_dkv,
):
    it = iter(refs)
    q_ref = next(it)  # (1, 1, blk_q, D) raw q
    ks_ref = next(it)  # (1, 1, blk_kv, D) k * scale * log2e
    vs_ref = next(it)  # (1, 1, blk_kv, D) v * scale
    dout_ref = next(it)  # (1, 1, blk_q, D)
    lse_ref = next(it)  # (1, 1, blk_q, 1) f32 base-2, clamped
    if fold_delta:
        delta_ref = None
        out_ref = next(it)  # (1, 1, blk_q, D) forward out (caller dtype)
    else:
        delta_ref = next(it)  # (1, 1, blk_q, 1) f32, pre-scaled by scale
        out_ref = None
    qseg_ref = next(it) if use_segments else None
    kseg_ref = next(it) if use_segments else None
    qpos_ref = next(it) if use_positions else None
    kpos_ref = next(it) if use_positions else None
    slopes_ref = next(it) if use_alibi else None  # (Hq,) f32 SMEM
    dq_ref = next(it)  # (1, 1, blk_q, D) f32 (or caller dtype at flush)
    dk_ref = next(it)  # (1, 1, Skv, D): f32 accumulator, or narrow dtype
    dv_ref = next(it)  # (resident per head either way)
    dq_s = next(it)  # (blk_q, D) f32
    delta_s = next(it) if fold_delta else None  # (blk_q, 128) f32
    # narrow dk/dv outputs: accumulate fp32 in scratch, cast once at the
    # head's last pair — saves the fp32 HBM write + the caller's cast
    # pass (f32 read + narrow write) per array
    dk_s = next(it) if narrow_dkv else None  # (Skv, D) f32
    dv_s = next(it) if narrow_dkv else None  # (Skv, D) f32

    def _dkv_add(ref, scratch, sl, val):
        if narrow_dkv:
            scratch[sl, :] += val
        else:
            ref[0, 0, sl, :] += val

    # blk_kv is the DMA/grid macro block; the kernel iterates n_sub
    # sub-tiles of width `sub` inside it (same structure as the forward
    # kernel: grid bookkeeping amortizes at macro granularity, causal
    # skipping/masking stays sub-tile-granular).
    n_sub = blk_kv // sub

    b_id = pl.program_id(0)
    p = pl.program_id(2)
    iq = iq_map_ref[p]
    ikv = ikv_map_ref[p]
    rel = info_ref[0] - info_ref[1]
    h_id = (
        pl.program_id(1) * group + g_map_ref[p]
        if (use_alibi or dropout_p) else None
    )

    @pl.when(p == 0)
    def _init_head():
        if narrow_dkv:
            dk_s[...] = jnp.zeros_like(dk_s)
            dv_s[...] = jnp.zeros_like(dv_s)
        else:
            dk_ref[...] = jnp.zeros_like(dk_ref)
            dv_ref[...] = jnp.zeros_like(dv_ref)

    # qlast_map carries per-pair flags: bit0 = last kv pair for this
    # (g, q-block) -> flush dq; bit1 = first -> zero the dq scratch
    # (with a compact enumeration the first pair need not be ikv == 0)
    @pl.when((qlast_map_ref[p] & 2) == 2)
    def _init_qblock():
        dq_s[...] = jnp.zeros_like(dq_s)
        if fold_delta:
            # delta = scale * rowsum(dout * out), computed once per
            # (g, q-block) from the streamed blocks — replaces the
            # caller-side XLA pass over dout/out (VERDICT r3 item 1b)
            delta_s[:, :1] = jnp.sum(
                dout_ref[0, 0].astype(jnp.float32)
                * out_ref[0, 0].astype(jnp.float32),
                axis=-1,
                keepdims=True,
            ) * jnp.float32(delta_scale)

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
            qs_ = qseg_ref[0, :].reshape(blk_q, 1)
            ks_ = kseg_ref[0, start:start + width].reshape(1, width)
            seg = qs_ == ks_
            allowed = seg if allowed is None else (allowed & seg)
        return allowed

    def _body(start, width, masked):
        ts = slice(start, start + width)
        s = jax.lax.dot_general(
            q_ref[0, 0],
            ks_ref[0, 0, ts, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, width) base-2 logits
        if softcap:
            cap2 = jnp.float32(softcap * _LOG2E)
            tt = jnp.tanh(s * (1.0 / cap2))
            s = cap2 * tt
        if use_alibi:
            qp, kp = _qp_kp(start, width)
            dist = (qp - kp).astype(jnp.float32)
            if not causal:
                dist = jnp.abs(dist)
            s = s - slopes_ref[h_id] * dist
        if masked:
            s = jnp.where(_allowed(start, width), s, NEG_INF)
        pr = jnp.exp2(s - lse_ref[0, 0])  # exact probabilities
        dp = jax.lax.dot_general(
            dout_ref[0, 0],
            vs_ref[0, 0, ts, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # scale * dout @ v^T
        if dropout_p:
            keep = _keep(start, width)
            inv = jnp.float32(1.0 / (1.0 - dropout_p))
            pr_v = jnp.where(keep, pr, 0.0) * inv
            dp = jnp.where(keep, dp, 0.0) * inv
        else:
            pr_v = pr
        delta = delta_s[:, :1] if fold_delta else delta_ref[0, 0]
        ds = pr * (dp - delta)  # carries one factor of scale
        if softcap:
            ds = ds * (1.0 - tt * tt)
        dq_s[...] += jax.lax.dot_general(
            ds.astype(ks_ref.dtype),
            ks_ref[0, 0, ts, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = pl.ds(ikv * blk_kv + start, width)
        # lhs-transposed matmuls: Mosaic fuses the transpose into the MXU op
        _dkv_add(dv_ref, dv_s, sl, jax.lax.dot_general(
            pr_v.astype(dout_ref.dtype),
            dout_ref[0, 0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        _dkv_add(dk_ref, dk_s, sl, jax.lax.dot_general(
            ds.astype(q_ref.dtype),
            q_ref[0, 0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))

    # Per-sub-tile three-way dispatch (skip / mask-free / masked) from
    # scalar block bounds — identical logic to _fwd_kernel; see the
    # commentary there. Skipped tiles contribute exactly-zero gradients,
    # so omitting them is exact.
    #
    # Mixed granularity (VERDICT r3 items 1c/2): a MASKED sub-tile recurses
    # into `fine`-wide strips, each re-dispatched skip/free/masked from the
    # same scalar bounds (kvmeta is at fine granularity). Fully-allowed
    # tiles keep the `sub`-wide fast path, so mostly-dead boundary tiles
    # (diagonal tiles at blk_q < sub, varlen segment edges) pay ~fine/sub
    # of the masked work instead of a full-width masked pass.
    if use_segments or use_positions:
        qsmin = qmeta_ref[0, iq]
        qsmax = qmeta_ref[1, iq]
        qpmin = qmeta_ref[2, iq]
        qpmax = qmeta_ref[3, iq]

    def _bounds(start, width):
        """(skip, free) traced scalars for kv span [start, start+width)."""
        skip = None
        free = None
        if use_segments or ((causal or use_window) and use_positions):
            j0 = ikv * (blk_kv // fine) + start // fine

            def agg(row, op):
                v = kvmeta_ref[row, j0]
                for s_ in range(1, width // fine):
                    v = op(v, kvmeta_ref[row, j0 + s_])
                return v

        if causal or use_window:
            if use_positions:
                lo = qpmin - agg(3, jnp.maximum)
                hi = qpmax - agg(2, jnp.minimum)
            else:
                sub_start = ikv * blk_kv + start
                lo = iq * blk_q + rel - (sub_start + width - 1)
                hi = iq * blk_q + blk_q - 1 + rel - sub_start
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
            ksmin = agg(0, jnp.minimum)
            ksmax = agg(1, jnp.maximum)
            sd = (qsmax < ksmin) | (ksmax < qsmin)
            sf = (qsmin == qsmax) & (ksmin == ksmax) & (qsmin == ksmin)
            skip = sd if skip is None else (skip | sd)
            free = sf if free is None else (free & sf)
        return skip, free

    def _dispatch(start, width):
        skip, free = _bounds(start, width)

        @pl.when(jnp.logical_not(skip) & free)
        def _unmasked():
            _body(start, width, False)

        @pl.when(jnp.logical_not(skip) & jnp.logical_not(free))
        def _masked():
            if width > fine:
                for s_ in range(width // fine):
                    _dispatch(start + s_ * fine, fine)
            else:
                _body(start, width, True)

    for t in range(n_sub):
        if causal or use_segments or use_window:
            _dispatch(t * sub, sub)
        else:
            _body(t * sub, sub, False)

    @pl.when((qlast_map_ref[p] & 1) == 1)
    def _flush_dq():
        # cancel the scale*log2e carried by ds @ ks (see module docstring);
        # the cast writes the caller's dq dtype directly (single-call paths
        # pass bf16, saving a full-array cast pass over HBM)
        dq_ref[0, 0] = (dq_s[...] * jnp.float32(dq_rescale)).astype(
            dq_ref.dtype
        )

    if narrow_dkv:
        @pl.when(p == pl.num_programs(2) - 1)
        def _flush_dkv():
            dk_ref[0, 0] = dk_s[...].astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_s[...].astype(dv_ref.dtype)


def fused_bwd_supported(skv, d):
    return 2 * skv * d * 4 <= FUSED_MAX_KV_BYTES


def pallas_block_bwd_fused(dout, q, k, v, lse, delta, scale,
                           mask: MaskArgs, interpret=False,
                           blk_q=None, blk_kv=None, kv_sub=None,
                           dq_dtype=None, out=None, kv_fine=None,
                           dkv_dtype=None):
    """Fused block backward. Returns (dq, dk, dv); dk/dv fp32 per KV head,
    GQA group accumulated in-kernel; dq fp32 unless dq_dtype narrows it
    (single-call paths pass q.dtype so the kernel writes the final dtype
    directly). Same contract as pallas_block_bwd.

    delta=None + out=<forward out> folds the delta = rowsum(dout*out)
    computation into the kernel (one VPU reduction per q-block from the
    streamed blocks), deleting the caller's separate XLA pass over
    dout/out. Schedules that reuse one delta across W ring steps should
    keep precomputing it (folding would re-read `out` every step).

    kv_fine < kv_sub enables mixed-granularity masking: masked sub-tiles
    re-dispatch in kv_fine-wide strips (see _bwd_fused_kernel)."""
    from .pallas_fwd import _pick_block

    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    fold_delta = delta is None
    if fold_delta:
        assert out is not None, "delta=None requires the forward out"
    # 512 q-blocks + 4096 macro KV blocks + 1024 sub-tiles measured best on
    # v5e with the slope harness (tools/exp_bwd_r3.py: 9.02 ms vs 9.41 at
    # 1024/2048/1024 on the causal headline shape; 1024/4096 collapses on
    # VMEM pressure, 512/4096 pipelines fine)
    blk_q = blk_q or _pick_block(sq, 512)
    blk_kv = blk_kv or _pick_block(skv, 4096)
    kv_sub = kv_sub or min(blk_kv, 1024)
    while blk_kv % kv_sub:
        kv_sub //= 2
    # masked-strip width (r4 sweeps, tools/exp_bwd_r4.py + the varlen
    # probe): 256 on implicit-coordinate (batch) masks — 8.54 ms vs 9.03
    # with strips off on the causal headline shape; 512 on explicit
    # positions/segments masks, where 256 COLLAPSES (1-seg 8.84 -> 22.4 ms:
    # the per-strip scalar-meta aggregation serializes the positions
    # branch) while 512 still beats strips-off on every packing (2-seg
    # 64.9 -> 71.7%, 5-seg 30.5 -> 39.9%). kv_fine == kv_sub disables the
    # strip pass.
    kv_fine = kv_fine or (
        min(kv_sub, 512) if (mask.q_pos is not None
                             or mask.q_segids is not None)
        else min(kv_sub, 256)
    )
    while kv_sub % kv_fine:
        kv_fine //= 2
    assert sq % blk_q == 0 and skv % blk_kv == 0, (sq, blk_q, skv, blk_kv)
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

    # Pre-scaled operands (see module docstring): one fused HBM pass each,
    # over the (group-x smaller) K/V arrays rather than Q.
    ks = (k.astype(jnp.float32) * (scale * _LOG2E)).astype(k.dtype)
    vs = (v.astype(jnp.float32) * scale).astype(v.dtype)
    lse2 = jnp.maximum(lse.astype(jnp.float32) * _LOG2E, NEG_INF / 2)
    lse4 = lse2[..., None]
    delta4 = (
        None if fold_delta
        else (delta.astype(jnp.float32) * scale)[..., None]
    )

    use_meta = use_segments or use_positions
    # numpy (static) metadata -> compact enumeration, as in pallas_fwd
    static_meta = use_meta and all(
        x is None or isinstance(x, np.ndarray)
        for x in (mask.q_segids, mask.kv_segids, mask.q_pos, mask.kv_pos)
    )
    if use_meta:
        from .pallas_fwd import block_meta

        # kv bounds at kv_fine granularity (the strip dispatch needs them;
        # sub-tile bounds aggregate in-kernel from the strips)
        q_meta, kv_meta = block_meta(
            mask, blk_q, blk_kv, kv_fine, n_q, n_kv,
            xp=np if static_meta else jnp,
        )
    else:
        q_meta = np.zeros((6, 1), np.int32)  # unused
        kv_meta = np.zeros((6, 1), np.int32)
    compact = triangular and static_meta

    # Pair enumeration: q-major per GQA group member, kv innermost so dq
    # accumulates in scratch; causal+static-offset prunes above-diagonal,
    # and with static metadata the enumeration drops provably-masked
    # macro pairs entirely (flags bit0 = flush dq, bit1 = zero dq scratch).
    pairs = []  # (g, iq, ikv, flags)
    for g in range(group):
        for iq in range(n_q):
            if triangular:
                end = min(
                    n_kv - 1,
                    max(0, ((iq + 1) * blk_q - 1 + static_offset) // blk_kv),
                )
                start = 0
                if compact:
                    end = min(end, int(q_meta[5, iq]))
                    start = min(int(q_meta[4, iq]), end)
            else:
                start, end = 0, n_kv - 1
            for ikv in range(start, end + 1):
                flags = int(ikv == end) | (int(ikv == start) << 1)
                pairs.append((g, iq, ikv, flags))
    g_map = np.asarray([x[0] for x in pairs], np.int32)
    iq_map = np.asarray([x[1] for x in pairs], np.int32)
    ikv_map = np.asarray([x[2] for x in pairs], np.int32)
    qlast_map = np.asarray([x[3] for x in pairs], np.int32)

    grid = (b, hkv, len(pairs))
    n_prefetch = 7

    def q_index(bi, hk, p, info_ref, gm, iqm, ikvm, qlm, qmm, kmm):
        return (bi, hk * group + gm[p], iqm[p], 0)

    def _clamp_kv(ki, info_ref, iqm, p, qmm):
        if causal and not use_positions and not triangular:
            last_needed = jnp.maximum(
                ((iqm[p] + 1) * blk_q - 1 + info_ref[0] - info_ref[1])
                // blk_kv, 0
            )
            ki = jnp.minimum(ki, jnp.minimum(last_needed, n_kv - 1))
        if use_meta:
            # blocks the segment/position bounds exclude: revisit a
            # boundary block => no DMA (compute skipped in-kernel)
            ki = jnp.clip(ki, qmm[4, iqm[p]], qmm[5, iqm[p]])
        return ki

    def kv_index(bi, hk, p, info_ref, gm, iqm, ikvm, qlm, qmm, kmm):
        return (bi, hk, _clamp_kv(ikvm[p], info_ref, iqm, p, qmm), 0)

    def lse_index(bi, hk, p, info_ref, gm, iqm, ikvm, qlm, qmm, kmm):
        return (bi, hk * group + gm[p], iqm[p], 0)

    def qvec_index(bi, hk, p, info_ref, gm, iqm, ikvm, qlm, qmm, kmm):
        return (0, iqm[p])

    def kvec_index(bi, hk, p, info_ref, gm, iqm, ikvm, qlm, qmm, kmm):
        return (0, _clamp_kv(ikvm[p], info_ref, iqm, p, qmm))

    def dkv_index(bi, hk, p, info_ref, gm, iqm, ikvm, qlm, qmm, kmm):
        return (bi, hk, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_kv, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q, 1), lse_index, memory_space=pltpu.VMEM),
    ]
    inputs = [q, ks, vs, dout, lse4]
    if fold_delta:
        in_specs.append(
            pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM)
        )
        inputs.append(out)
    else:
        in_specs.append(
            pl.BlockSpec((1, 1, blk_q, 1), lse_index, memory_space=pltpu.VMEM)
        )
        inputs.append(delta4)

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
        _bwd_fused_kernel,
        causal=causal,
        use_positions=use_positions,
        use_segments=use_segments,
        triangular=triangular,
        window_left=mask.window_left,
        window_right=None if causal else mask.window_right,
        softcap=mask.softcap,
        use_alibi=use_alibi,
        dropout_p=mask.dropout_p,
        group=group,
        blk_q=blk_q,
        blk_kv=blk_kv,
        sub=kv_sub,
        fine=kv_fine,
        num_kv_blocks=n_kv,
        dq_rescale=_LN2 / scale,
        fold_delta=fold_delta,
        delta_scale=scale,
        narrow_dkv=dkv_dtype is not None,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, blk_q, d), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), dkv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), dkv_index, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)]
        + ([pltpu.VMEM((blk_q, 128), jnp.float32)] if fold_delta else [])
        + ([pltpu.VMEM((skv, d), jnp.float32)] * 2 if dkv_dtype else []),
    )

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sq, d), dq_dtype or jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, skv, d), dkv_dtype or jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, skv, d), dkv_dtype or jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the resident dk/dv accumulators blow Mosaic's default 16MB
            # scoped-vmem budget; v5e has 128MB of VMEM — let the kernel
            # use it (gated by FUSED_MAX_KV_BYTES in the wrapper)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(info, g_map, iq_map, ikv_map, qlast_map, q_meta, kv_meta, *inputs)
    return dq, dk, dv
