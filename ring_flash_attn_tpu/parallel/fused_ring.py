"""Fused in-kernel ring attention forward (async remote DMA).

The schedule-level rings (parallel/ring.py) express each KV rotation as an
XLA collective-permute between pallas_call invocations: out/lse round-trip
HBM every step and overlap depends on XLA's latency-hiding scheduler. This
module instead runs the ENTIRE ring inside one pallas_call per device:

- the KV shard hops rank -> rank+1 with `pltpu.make_async_remote_copy`
  (ICI RDMA), double-buffered in VMEM, started *before* the step's compute
  so the hop hides behind the matmuls — the in-kernel analog of the
  reference's commit()/wait() overlap (reference utils.py:121-140);
- the online-softmax state (m, l, acc) stays in VMEM scratch for all W
  steps and is normalized exactly once at the end — zero HBM traffic for
  the accumulators (the schedule-level ring pays out/lse reads+writes per
  step);
- flow control is an exact-count credit handshake: a device may write into
  its neighbor's slot only after the neighbor has granted that slot. A
  grant is a tiny reverse-direction remote copy (an "ack" DMA to the
  upstream rank) — chosen over a remote semaphore_signal because the ack
  is also emulated by Pallas interpret mode, so the whole protocol is
  testable on the CPU mesh. Grants are issued once per consumption — one
  initial grant for slot 1, then one at the end of each step t <= W-3 for
  slot t%2 — so no credit leaks across grid iterations and no rank can
  clobber KV another rank is still computing on, even if ranks drift a
  full sub-problem apart.

The backward pass runs the schedule-level dual ring via custom_vjp (the
in-kernel fused path is forward; fwd-heavy workloads — inference prefill,
evaluation — get the full benefit, training gets a correct gradient).
Causal
uses the same step<=rank skipping as the reference (ring_flash_attn.py:30)
— the rotation DMA still runs on skipped steps to keep the ring alive.

Capacity: the per-(batch, kv-head) working set (q group + double-buffered
KV + fp32 accumulators) must fit VMEM; see the assert in
`fused_ring_attention`. Callers fall back to parallel.ring beyond it.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.mask import NEG_INF
from ..ops.pallas_fwd import _LN2, _LOG2E
from .mesh import ring_size

DEFAULT_BLOCK_Q = 512

_VMEM_BUDGET = 80 * 1024 * 1024


def _bwd_vmem_bytes(l_local, d, group, itemsize):
    """Per-(batch, kv-head) VMEM working set of the fused backward kernel:
    k/v in + 2-slot kv comm (itemsize) + f32 dkv comm slots + dk/dv
    accumulators + the group-sized dq accumulator. Shared by the assert in
    _fused_ring_backward and the bwd_mode="auto" gate so the gate can never
    admit a shape the kernel will reject at grad time."""
    return (
        6 * l_local * d * itemsize
        + 4 * l_local * d * 4
        + 2 * l_local * d * 4
        + group * l_local * d * 4
    )


def fused_ring_bwd_supported(l_local, d, group, itemsize):
    """True iff the fused in-kernel backward's working set fits VMEM."""
    return _bwd_vmem_bytes(l_local, d, group, itemsize) < _VMEM_BUDGET


def _fused_ring_fwd_kernel(
    q_hbm,  # (B, Hq, L, D) pre-scaled q, HBM — streamed per (g, q-block)
    k_ref,  # (1, 1, L, D) local kv shard, VMEM
    v_ref,  # (1, 1, L, D)
    slopes_ref,  # (Hq,) f32 SMEM, ALiBi slopes * log2e (zeros when unused)
    out_hbm,  # (B, Hq, L, D) HBM — written per (g, q-block) at the end
    lse_ref,  # (1, group, L, 1) f32 windowed VMEM output (single-lane
              # arrays cannot be manually DMA'd — HBM memref slices must
              # be 128-lane aligned — but pipelined window writes are
              # fine, as the grid kernels' lse blocks prove on hardware)
    comm,  # VMEM (2, 2, L, D) [slot, k/v]
    acc,  # VMEM (group, L, D) f32
    stats,  # VMEM (group, L, 128) f32: lane 0 = m, lane 1 = l, lane 2 =
            # final lse (one array instead of several: VMEM tiles are 128
            # lanes wide regardless, so packing single-lane stats shares
            # the allocation)
    q_buf,  # VMEM (2, blk_q, D) — double-buffered streamed q blocks
    out_stage,  # VMEM (blk_q, D) out-dtype staging for the final DMA
    stream_sem,  # DMA (2,)
    send_sem,  # DMA (2,)
    recv_sem,  # DMA (2,)
    ack_buf,  # VMEM (2, 8, 128) int32 credit-ack payload (content unused)
    ack_send,  # DMA (2,)
    ack_recv,  # DMA (2,)
    *,
    axis_name,
    world,
    causal,
    group,
    l_local,
    blk_q,
    blk_kv,
    softcap,
    use_alibi,
):
    rank = jax.lax.axis_index(axis_name)
    nxt = jax.lax.rem(rank + 1, world)
    prv = jax.lax.rem(rank - 1 + world, world)
    b_id = pl.program_id(0)
    hk = pl.program_id(1)

    for g in range(group):
        stats[g, :, 0:1] = jnp.full((l_local, 1), NEG_INF, jnp.float32)
        stats[g, :, 1:2] = jnp.zeros((l_local, 1), jnp.float32)
        acc[g] = jnp.zeros_like(acc[g])

    n_qb = l_local // blk_q
    n_kb = l_local // blk_kv
    kv_dtype = k_ref.dtype

    def _q_copy(g, qb, slot):
        """Async-copy descriptor for q block qb into stream slot `slot`."""
        return pltpu.make_async_copy(
            q_hbm.at[b_id, hk * group + g, pl.ds(qb * blk_q, blk_q), :],
            q_buf.at[slot], stream_sem.at[slot],
        )

    def _attend(kk_ref, vv_ref, diagonal, kv_rank):
        """Online-softmax update of (m, l, acc) with the resident kv
        (kk_ref/vv_ref are (L, D) sub-refs — VMEM-resident shard or comm
        slot). q blocks and KV chunks iterate via lax.fori_loop so the
        Mosaic program stays COMPACT at production shapes (a fully
        unrolled group x n_qb x n_kb body explodes compile time) and
        logits intermediates stay (blk_q, blk_kv).

        The q stream is DOUBLE-BUFFERED (round 4): block qb+1's DMA is
        started before block qb's compute, so the HBM fetch hides behind
        the matmuls — the manual-stream analog of the grid pipeliner's
        prefetch the dedicated kernels get (this was the measured +10.3%
        W=1 overhead, DESIGN.md 7c). Slots/semaphores are indexed
        statically via a pair-unrolled loop body.

        diagonal=True applies the local causal mask (step 0) and bounds
        the KV chunk loop at each q block's diagonal; later steps are
        mask-free for every rank that computes — the reference's case
        split (ring_flash_attn.py:30-39). kv_rank (traced) is the source
        rank of the resident kv: ALiBi distances need GLOBAL positions,
        q at rank*L + row and kv at kv_rank*L + col."""
        for g in range(group):
            def _q_block(qb, qs, g=g):
                row = pl.ds(qb * blk_q, blk_q)
                if diagonal:
                    nkb = jnp.minimum(
                        (qb * blk_q + blk_q - 1) // blk_kv + 1, n_kb
                    )
                else:
                    nkb = n_kb

                def kb_body(kb, _, g=g):
                    ks = pl.ds(kb * blk_kv, blk_kv)
                    s = jax.lax.dot_general(
                        qs, kk_ref[ks, :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (blk_q, blk_kv) base-2 logits
                    if softcap:
                        # same base-2 capping as the grid kernels
                        # (ops/pallas_fwd.py): cap2*tanh(s/cap2)
                        cap2 = jnp.float32(softcap * _LOG2E)
                        s = cap2 * jnp.tanh(s * (1.0 / cap2))
                    if use_alibi:
                        rows_g = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (blk_q, 1), 0)
                            + qb * blk_q + rank * l_local
                        )
                        cols_g = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (1, blk_kv), 1)
                            + kb * blk_kv + kv_rank * l_local
                        )
                        dist = (rows_g - cols_g).astype(jnp.float32)
                        if not causal:
                            dist = jnp.abs(dist)
                        # slopes arrive pre-multiplied by log2e
                        s = s - slopes_ref[hk * group + g] * dist
                    if diagonal:
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (blk_q, 1), 0) + qb * blk_q
                        cols = jax.lax.broadcasted_iota(
                            jnp.int32, (1, blk_kv), 1) + kb * blk_kv
                        s = jnp.where(rows >= cols, s, NEG_INF)
                    m_prev = stats[g, row, 0:1]
                    m_new = jnp.maximum(
                        m_prev, jnp.max(s, axis=1, keepdims=True)
                    )
                    alpha = jnp.exp2(m_prev - m_new)
                    pr = jnp.exp2(s - m_new)
                    stats[g, row, 1:2] = stats[g, row, 1:2] * alpha + jnp.sum(
                        pr, axis=1, keepdims=True
                    )
                    acc[g, row, :] = (
                        acc[g, row, :] * alpha + jax.lax.dot_general(
                            pr.astype(kv_dtype), vv_ref[ks, :],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                    stats[g, row, 0:1] = m_new
                    return 0

                jax.lax.fori_loop(0, nkb, kb_body, 0)

            if n_qb % 2 == 0:
                # pair-unrolled double buffering: prefetch the odd block
                # while computing the even one and vice versa; slot and
                # semaphore indices stay static
                _q_copy(g, 0, 0).start()

                def pair_body(p, _, g=g):
                    qb0 = 2 * p
                    _q_copy(g, qb0 + 1, 1).start()
                    _q_copy(g, qb0, 0).wait()
                    _q_block(qb0, q_buf[0], g)

                    @pl.when(qb0 + 2 < n_qb)
                    def _():
                        _q_copy(g, qb0 + 2, 0).start()

                    _q_copy(g, qb0 + 1, 1).wait()
                    _q_block(qb0 + 1, q_buf[1], g)
                    return 0

                jax.lax.fori_loop(0, n_qb // 2, pair_body, 0)
            else:
                def qb_body(qb, _, g=g):
                    c = _q_copy(g, qb, 0)
                    c.start()
                    c.wait()
                    _q_block(qb, q_buf[0], g)
                    return 0

                jax.lax.fori_loop(0, n_qb, qb_body, 0)

    def _send(src_k, src_v, slot):
        """RDMA the resident kv into the next rank's comm[slot]."""
        copies = []
        for i, src in enumerate((src_k, src_v)):
            rdma = pltpu.make_async_remote_copy(
                src_ref=src,
                dst_ref=comm.at[slot, i],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[slot],
                device_id=nxt,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            copies.append(rdma)
        return copies

    def _ack(slot, device_id):
        return pltpu.make_async_remote_copy(
            src_ref=ack_buf.at[slot],
            dst_ref=ack_buf.at[slot],
            send_sem=ack_send.at[slot],
            recv_sem=ack_recv.at[slot],
            device_id=device_id,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def _grant(slot):
        """Tell upstream our comm[slot] is free (credit = ack DMA)."""
        a = _ack(slot, prv)
        a.start()
        a.wait_send()

    def _wait_credit(slot):
        """Wait for downstream's grant of ITS comm[slot]."""
        _ack(slot, nxt).wait_recv()

    def _wait_recv(slot):
        """Wait for the k and v copies from upstream to land in comm[slot].

        DMA semaphores can only be waited through a copy descriptor, so the
        receiver constructs descriptors matching the sender's (same dst ref
        and recv_sem => same byte count) and waits their recv side."""
        for i in range(2):
            pltpu.make_async_remote_copy(
                src_ref=comm.at[slot, i],
                dst_ref=comm.at[slot, i],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[slot],
                device_id=prv,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()

    if world == 1:
        _attend(k_ref.at[0, 0], v_ref.at[0, 0], causal, rank)
    else:
        # upstream's step-0 send targets our slot 1: grant it
        _grant(1)
        for step in range(world):
            recv_slot = step % 2  # where THIS step's kv lives (step>=1)
            next_slot = (step + 1) % 2
            # resident kv originated at rank - step (mod world)
            src_rank = jax.lax.rem(rank - step + world, world)
            sends = None
            if step == 0:
                # forward the local shard, then compute on it (the DMA
                # hides behind the whole step's matmuls)
                _wait_credit(next_slot)
                sends = _send(k_ref.at[0, 0], v_ref.at[0, 0], next_slot)
                _attend(k_ref.at[0, 0], v_ref.at[0, 0], causal, rank)
            else:
                # this step's kv must have landed (two copies: k and v)
                _wait_recv(recv_slot)
                if step < world - 1:
                    _wait_credit(next_slot)
                    sends = _send(
                        comm.at[recv_slot, 0], comm.at[recv_slot, 1],
                        next_slot,
                    )
                if causal:
                    # rank r sees kv of rank r-step: strictly earlier
                    # positions iff step <= rank; skip otherwise
                    @pl.when(step <= rank)
                    def _():
                        _attend(comm.at[recv_slot, 0],
                                comm.at[recv_slot, 1], False, src_rank)
                else:
                    _attend(comm.at[recv_slot, 0], comm.at[recv_slot, 1],
                            False, src_rank)

            if sends is not None:
                # resident data must be fully out the door before its slot
                # can be promised upstream (and before we leave the step)
                for c in sends:
                    c.wait_send()
            if step <= world - 3:
                # upstream's step+1 send targets slot step%2 (resident this
                # step, now consumed): grant exactly once per consumption
                _grant(step % 2)

    # normalize once at the very end (no per-step out/lse HBM traffic),
    # staging each q block through VMEM: whole-shard windowed outputs with
    # their 128-lane-padded lse and x2 pipeline buffering were what blew
    # the VMEM budget at the headline shape
    out_dtype = out_stage.dtype
    for g in range(group):
        def flush_body(qb, _, g=g):
            row = pl.ds(qb * blk_q, blk_q)
            lb = stats[g, row, 1:2]
            mb = stats[g, row, 0:1]
            dead_b = jnp.logical_or(lb == 0.0, mb <= NEG_INF / 2)
            l_safe_b = jnp.where(lb == 0.0, 1.0, lb)
            out_stage[...] = jnp.where(
                dead_b, 0.0, acc[g, row, :] / l_safe_b
            ).astype(out_dtype)
            lse_ref[0, g, row, :] = jnp.where(
                dead_b, NEG_INF,
                (mb + jnp.log2(l_safe_b)) * jnp.float32(_LN2),
            )
            c1 = pltpu.make_async_copy(
                out_stage,
                out_hbm.at[b_id, hk * group + g, row, :],
                stream_sem.at[0],
            )
            c1.start()
            c1.wait()
            return 0

        jax.lax.fori_loop(0, n_qb, flush_body, 0)


def _fused_ring_forward(q, k, v, *, scale, causal, axis_name,
                        blk_q=None, blk_kv=None, interpret=False,
                        collective_id=7, softcap=None, alibi_slopes=None):
    """Non-differentiable fused-ring forward (see fused_ring_attention)."""
    b, hq, l_local, d_ = q.shape
    _, hkv, _, _ = k.shape
    assert hq % hkv == 0
    group = hq // hkv
    world = ring_size(axis_name)

    blk_q = blk_q or min(DEFAULT_BLOCK_Q, l_local)
    blk_kv = blk_kv or min(1024, l_local)
    assert l_local % blk_q == 0 and l_local % blk_kv == 0

    # Whole working set per (batch, kv-head) grid step. q/out/lse stream
    # from/to HBM per q-block (whole-shard windowed residency with x2
    # pipeline buffering blew the 128MB budget at the headline shape); the
    # residents are kv + comm slots + fp32 accumulators + packed stats.
    # Headline shape (L=8192, group=4, D=128, bf16): ~45MB + spill slack.
    vmem = (
        6 * l_local * d_ * k.dtype.itemsize  # kv in + 2-slot double comm
        + group * l_local * d_ * 4  # acc f32
        + group * l_local * 128 * 4  # packed m/l/lse stats (128-lane tiles)
    )
    assert vmem < _VMEM_BUDGET, (
        f"fused ring working set {vmem / 1e6:.1f}MB exceeds VMEM; use "
        "parallel.ring.ring_attention for this shape"
    )

    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    # slopes always ride (zeros when ALiBi is off) so the kernel signature
    # stays static; pre-multiplied by log2e for the base-2 logit regime
    slopes = (
        jnp.zeros((hq,), jnp.float32) if alibi_slopes is None
        else jnp.asarray(alibi_slopes, jnp.float32) * _LOG2E
    )

    kernel = functools.partial(
        _fused_ring_fwd_kernel,
        axis_name=axis_name,
        world=world,
        causal=causal,
        group=group,
        l_local=l_local,
        blk_q=blk_q,
        blk_kv=blk_kv,
        softcap=float(softcap) if softcap else None,
        use_alibi=alibi_slopes is not None,
    )

    out, lse = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # q streamed per block
            pl.BlockSpec((1, 1, l_local, d_), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_local, d_), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alibi slopes
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # out DMA'd per block
            pl.BlockSpec((1, group, l_local, 1),
                         lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, l_local, d_), q.dtype),
            jax.ShapeDtypeStruct((b, hq, l_local, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, l_local, d_), k.dtype),
            pltpu.VMEM((group, l_local, d_), jnp.float32),
            pltpu.VMEM((group, l_local, 128), jnp.float32),
            pltpu.VMEM((2, blk_q, d_), q.dtype),  # double-buffered q stream
            pltpu.VMEM((blk_q, d_), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # world=1 emits no remote DMAs; Mosaic rejects collective_id
            # for kernels without a custom barrier
            collective_id=collective_id if world > 1 else None,
            vmem_limit_bytes=115 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qs, k, v, slopes)
    return out, lse.squeeze(-1)


def _fused_ring_bwd_kernel(
    qs_hbm,  # (B, Hq, L, D) q * scale * log2e, HBM — streamed per block
    k_ref,  # (1, 1, L, D) local k shard (raw), VMEM
    vs_ref,  # (1, 1, L, D) v * scale, VMEM
    dout_hbm,  # (B, Hq, L, D) HBM — streamed per block
    out_hbm,  # (B, Hq, L, D) HBM forward output — streamed per block;
              # delta = scale * rowsum(dout * out) is computed in-kernel
              # (single-lane HBM arrays cannot be manually DMA'd)
    slopes_ref,  # (Hq,) f32 SMEM, ALiBi slopes * log2e (zeros when unused)
    lse_ref,  # (1, group, L, 1) f32 base-2 clamped, windowed VMEM input
    dq_hbm,  # (B, Hq, L, D) f32 out, HBM — DMA'd from the dq accumulator
    dk_hbm,  # (B, Hkv, L, D) f32 out, HBM
    dv_hbm,  # (B, Hkv, L, D) f32 out, HBM
    comm_kv,  # VMEM (2, 2, L, D) kv-dtype [slot, k/vs]
    comm_dkv,  # VMEM (2, 2, L, D) f32 [slot, dk/dv] — the traveling accums
    dq_acc,  # VMEM (group, L, D) f32 — local dq accumulator (all steps)
    dk_s,  # VMEM (L, D) f32 — this step's local contributions
    dv_s,  # VMEM (L, D) f32
    q_buf,  # VMEM (2, blk_q, D) kv-dtype — double-buffered q stream
    dout_buf,  # VMEM (2, blk_q, D) kv-dtype — double-buffered dout stream
    out_buf,  # VMEM (2, blk_q, D) kv-dtype — double-buffered fwd-out stream
    stream_sem,  # DMA (8,): (array, slot) pairs 0-5, flush 6-7
    kv_send_sem,  # DMA (2,)
    kv_recv_sem,  # DMA (2,)
    dkv_send_sem,  # DMA (2,)
    dkv_recv_sem,  # DMA (2,)
    kv_ack_buf,  # VMEM (2, 8, 128) int32
    kv_ack_send,  # DMA (2,)
    kv_ack_recv,  # DMA (2,)
    dkv_ack_buf,  # VMEM (2, 8, 128) int32
    dkv_ack_send,  # DMA (2,)
    dkv_ack_recv,  # DMA (2,)
    *,
    axis_name,
    world,
    causal,
    group,
    l_local,
    blk_q,
    blk_kv,
    dk_rescale,
    scale,
    softcap,
    use_alibi,
):
    rank = jax.lax.axis_index(axis_name)
    nxt = jax.lax.rem(rank + 1, world)
    prv = jax.lax.rem(rank - 1 + world, world)
    b_id = pl.program_id(0)
    hk = pl.program_id(1)
    n_qb = l_local // blk_q
    n_kb = l_local // blk_kv

    dq_acc[...] = jnp.zeros_like(dq_acc)

    def _blk_copies(g, qb, slot):
        """Descriptors for q block qb's q/dout/forward-out DMAs, slot 0/1
        (one semaphore per (array, slot): indices 0-5)."""
        row = pl.ds(qb * blk_q, blk_q)
        h = hk * group + g
        return [
            pltpu.make_async_copy(
                qs_hbm.at[b_id, h, row, :], q_buf.at[slot],
                stream_sem.at[slot],
            ),
            pltpu.make_async_copy(
                dout_hbm.at[b_id, h, row, :], dout_buf.at[slot],
                stream_sem.at[2 + slot],
            ),
            pltpu.make_async_copy(
                out_hbm.at[b_id, h, row, :], out_buf.at[slot],
                stream_sem.at[4 + slot],
            ),
        ]

    def _start_blocks(g, qb, slot):
        for c in _blk_copies(g, qb, slot):
            c.start()

    def _wait_blocks(g, qb, slot):
        for c in _blk_copies(g, qb, slot):
            c.wait()

    kv_dtype = k_ref.dtype

    def _compute_step(kk_ref, vv_ref, diagonal, kv_rank):
        """Accumulate this step's dq into dq_ref and dk/dv into dk_s/dv_s
        against the resident kv ((L, D) sub-refs: kk raw k, vv pre-scaled
        v). q blocks and KV chunks iterate via lax.fori_loop — compact
        Mosaic program at production shapes, (blk_q, blk_kv) logits
        intermediates (see _attend in the forward kernel). The
        q/dout/out streams are double-buffered with a pair-unrolled loop
        exactly as in _attend (round 4).

        diagonal=True is step 0 (local causal): the KV chunk loop is
        bounded at each q block's diagonal and chunks pay the mask.
        kv_rank (traced) = source rank of the resident kv, for ALiBi's
        global distances (mirrors _attend)."""
        for g in range(group):
            def _q_block(qb, slot, g=g):
                row = pl.ds(qb * blk_q, blk_q)
                qs_blk = q_buf[slot]
                dout_blk = dout_buf[slot]
                lse_col = lse_ref[0, g, row, :]
                delta_col = jnp.float32(scale) * jnp.sum(
                    dout_blk.astype(jnp.float32)
                    * out_buf[slot].astype(jnp.float32),
                    axis=1, keepdims=True,
                )
                if diagonal:
                    nkb = jnp.minimum(
                        (qb * blk_q + blk_q - 1) // blk_kv + 1, n_kb
                    )
                else:
                    nkb = n_kb

                def kb_body(kb, _, g=g):
                    ks = pl.ds(kb * blk_kv, blk_kv)
                    s = jax.lax.dot_general(
                        qs_blk, kk_ref[ks, :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (blk_q, blk_kv) base-2 logits
                    if softcap:
                        # p must be recomputed through the SAME transform
                        # as the forward; tt feeds the ds chain rule below
                        cap2 = jnp.float32(softcap * _LOG2E)
                        tt = jnp.tanh(s * (1.0 / cap2))
                        s = cap2 * tt
                    if use_alibi:
                        rows_g = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (blk_q, 1), 0)
                            + qb * blk_q + rank * l_local
                        )
                        cols_g = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (1, blk_kv), 1)
                            + kb * blk_kv + kv_rank * l_local
                        )
                        dist = (rows_g - cols_g).astype(jnp.float32)
                        if not causal:
                            dist = jnp.abs(dist)
                        s = s - slopes_ref[hk * group + g] * dist
                    if diagonal:
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (blk_q, 1), 0) + qb * blk_q
                        cols = jax.lax.broadcasted_iota(
                            jnp.int32, (1, blk_kv), 1) + kb * blk_kv
                        s = jnp.where(rows >= cols, s, NEG_INF)
                    pr = jnp.exp2(s - lse_col)
                    dp = jax.lax.dot_general(
                        dout_blk, vv_ref[ks, :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # scale * dout @ v^T
                    ds = pr * (dp - delta_col)
                    if softcap:
                        # chain rule through cap2*tanh(s/cap2)
                        ds = ds * (1.0 - tt * tt)
                    dq_acc[g, row, :] += jax.lax.dot_general(
                        ds.astype(kv_dtype), kk_ref[ks, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dk_s[ks, :] += jax.lax.dot_general(
                        ds.astype(kv_dtype), qs_blk,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dv_s[ks, :] += jax.lax.dot_general(
                        pr.astype(kv_dtype), dout_blk,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return 0

                jax.lax.fori_loop(0, nkb, kb_body, 0)

            if n_qb % 2 == 0:
                _start_blocks(g, 0, 0)

                def pair_body(p, _, g=g):
                    qb0 = 2 * p
                    _start_blocks(g, qb0 + 1, 1)
                    _wait_blocks(g, qb0, 0)
                    _q_block(qb0, 0, g)

                    @pl.when(qb0 + 2 < n_qb)
                    def _():
                        _start_blocks(g, qb0 + 2, 0)

                    _wait_blocks(g, qb0 + 1, 1)
                    _q_block(qb0 + 1, 1, g)
                    return 0

                jax.lax.fori_loop(0, n_qb // 2, pair_body, 0)
            else:
                def qb_body(qb, _, g=g):
                    _start_blocks(g, qb, 0)
                    _wait_blocks(g, qb, 0)
                    _q_block(qb, 0, g)
                    return 0

                jax.lax.fori_loop(0, n_qb, qb_body, 0)

    def _rdma(src_ref, dst_ref, send_sem, recv_sem, device_id):
        return pltpu.make_async_remote_copy(
            src_ref=src_ref, dst_ref=dst_ref, send_sem=send_sem,
            recv_sem=recv_sem, device_id=device_id,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def _ack(buf, send, recv, slot, device_id):
        return _rdma(buf.at[slot], buf.at[slot], send.at[slot],
                     recv.at[slot], device_id)

    def _grant_kv(slot):
        a = _ack(kv_ack_buf, kv_ack_send, kv_ack_recv, slot, prv)
        a.start()
        a.wait_send()

    def _wait_credit_kv(slot):
        _ack(kv_ack_buf, kv_ack_send, kv_ack_recv, slot, nxt).wait_recv()

    def _grant_dkv(slot):
        a = _ack(dkv_ack_buf, dkv_ack_send, dkv_ack_recv, slot, prv)
        a.start()
        a.wait_send()

    def _wait_credit_dkv(slot):
        _ack(dkv_ack_buf, dkv_ack_send, dkv_ack_recv, slot, nxt).wait_recv()

    def _send_kv(src_k, src_v, slot):
        copies = []
        for i, src in enumerate((src_k, src_v)):
            c = _rdma(src, comm_kv.at[slot, i], kv_send_sem.at[slot],
                      kv_recv_sem.at[slot], nxt)
            c.start()
            copies.append(c)
        return copies

    def _wait_recv_kv(slot):
        for i in range(2):
            _rdma(comm_kv.at[slot, i], comm_kv.at[slot, i],
                  kv_send_sem.at[slot], kv_recv_sem.at[slot],
                  prv).wait_recv()

    def _send_dkv(src_dk, src_dv, slot):
        copies = []
        for i, src in enumerate((src_dk, src_dv)):
            c = _rdma(src, comm_dkv.at[slot, i], dkv_send_sem.at[slot],
                      dkv_recv_sem.at[slot], nxt)
            c.start()
            copies.append(c)
        return copies

    def _wait_recv_dkv(slot):
        for i in range(2):
            _rdma(comm_dkv.at[slot, i], comm_dkv.at[slot, i],
                  dkv_send_sem.at[slot], dkv_recv_sem.at[slot],
                  prv).wait_recv()

    def _flush_outputs(dk_src, dv_src):
        """DMA dq (per group member) and the home dk/dv to HBM."""
        copies = []
        for g in range(group):
            copies.append(pltpu.make_async_copy(
                dq_acc.at[g], dq_hbm.at[b_id, hk * group + g],
                stream_sem.at[g % 2],
            ))
        copies.append(pltpu.make_async_copy(
            dk_src, dk_hbm.at[b_id, hk], stream_sem.at[2]
        ))
        copies.append(pltpu.make_async_copy(
            dv_src, dv_hbm.at[b_id, hk], stream_sem.at[3]
        ))
        done = []
        for c in copies:
            # serialize pairs sharing a semaphore slot
            c.start()
            c.wait()
            done.append(c)

    if world == 1:
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)
        _compute_step(k_ref.at[0, 0], vs_ref.at[0, 0], causal, rank)
        dk_s[...] = dk_s[...] * jnp.float32(dk_rescale)
        _flush_outputs(dk_s, dv_s)
        return

    # kv credits: identical scheme to the forward kernel. dkv credits:
    # sends happen at steps 0..W-1 targeting slot (s+1)%2; both slots are
    # free initially, and slot s%2 is re-granted after its merge+forward at
    # steps 1..W-2 — exact count for every W (see protocol notes below).
    _grant_kv(1)
    _grant_dkv(0)
    _grant_dkv(1)
    for step in range(world):
        recv_slot = step % 2
        next_slot = (step + 1) % 2
        # resident kv originated at rank - step (mod world)
        src_rank = jax.lax.rem(rank - step + world, world)
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)
        kv_sends = None
        if step == 0:
            _wait_credit_kv(next_slot)
            kv_sends = _send_kv(k_ref.at[0, 0], vs_ref.at[0, 0], next_slot)
            _compute_step(k_ref.at[0, 0], vs_ref.at[0, 0], causal, rank)
            # own-kv accumulator = just this step's contributions
            _wait_credit_dkv(next_slot)
            dkv_sends = _send_dkv(dk_s, dv_s, next_slot)
            for c in dkv_sends:
                c.wait_send()  # dk_s/dv_s are re-zeroed next step
        else:
            _wait_recv_kv(recv_slot)
            if step < world - 1:
                _wait_credit_kv(next_slot)
                kv_sends = _send_kv(
                    comm_kv.at[recv_slot, 0], comm_kv.at[recv_slot, 1],
                    next_slot,
                )
            if causal:
                @pl.when(step <= rank)
                def _():
                    _compute_step(
                        comm_kv.at[recv_slot, 0], comm_kv.at[recv_slot, 1],
                        False, src_rank,
                    )
            else:
                _compute_step(
                    comm_kv.at[recv_slot, 0], comm_kv.at[recv_slot, 1],
                    False, src_rank,
                )
            # merge this step's contributions into the traveling
            # accumulator (zeros if the step was causally skipped), then
            # forward it — the in-kernel analog of the schedule's dkv
            # co-rotation (reference ring_flash_attn.py:133-152)
            _wait_recv_dkv(recv_slot)
            comm_dkv[recv_slot, 0] += dk_s[...]
            comm_dkv[recv_slot, 1] += dv_s[...]
            _wait_credit_dkv(next_slot)
            dkv_sends = _send_dkv(
                comm_dkv.at[recv_slot, 0], comm_dkv.at[recv_slot, 1],
                next_slot,
            )
            for c in dkv_sends:
                c.wait_send()
            if step <= world - 2:
                _grant_dkv(recv_slot)
        if kv_sends is not None:
            for c in kv_sends:
                c.wait_send()
        if step <= world - 3:
            _grant_kv(step % 2)

    # after W hops the accumulator for OUR kv shard is home
    home = world % 2
    _wait_recv_dkv(home)
    comm_dkv[home, 0] = comm_dkv[home, 0] * jnp.float32(dk_rescale)
    _flush_outputs(comm_dkv.at[home, 0], comm_dkv.at[home, 1])


def _fused_ring_backward(q, k, v, dout, out, lse, *, scale, causal,
                         axis_name, blk_q=None, blk_kv=None,
                         interpret=False, collective_id=8,
                         softcap=None, alibi_slopes=None):
    """In-kernel dual-ring backward: kv rotates forward while the dk/dv
    accumulators co-rotate, all inside one pallas_call — the fused analog
    of parallel.ring._ring_bwd (and of the reference's counter-rotating
    d_kv_comm, reference ring_flash_attn.py:85-152). Returns (dq, dk, dv)
    fp32 per-shard."""
    b, hq, l_local, d_ = q.shape
    _, hkv, _, _ = k.shape
    group = hq // hkv
    world = ring_size(axis_name)

    blk_q = blk_q or min(DEFAULT_BLOCK_Q, l_local)
    blk_kv = blk_kv or min(1024, l_local)
    assert l_local % blk_q == 0 and l_local % blk_kv == 0

    # qs/dout/lse/delta stream from HBM per q-block and dq/dk/dv are
    # DMA'd out, so the residents are kv + comm slots + accumulators.
    # Headline shape (L=8192, group=4, D=128): ~56MB + spill slack.
    vmem = _bwd_vmem_bytes(l_local, d_, group, k.dtype.itemsize)
    assert vmem < _VMEM_BUDGET, (
        f"fused ring bwd working set {vmem / 1e6:.1f}MB exceeds VMEM; use "
        "the schedule-level backward for this shape"
    )

    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    vsc = (v.astype(jnp.float32) * scale).astype(v.dtype)
    lse4 = jnp.maximum(
        lse.astype(jnp.float32) * _LOG2E, NEG_INF / 2
    )[..., None]
    slopes = (
        jnp.zeros((hq,), jnp.float32) if alibi_slopes is None
        else jnp.asarray(alibi_slopes, jnp.float32) * _LOG2E
    )

    kernel = functools.partial(
        _fused_ring_bwd_kernel,
        axis_name=axis_name,
        world=world,
        causal=causal,
        group=group,
        l_local=l_local,
        blk_q=blk_q,
        blk_kv=blk_kv,
        dk_rescale=_LN2 / scale,
        scale=scale,
        softcap=float(softcap) if softcap else None,
        use_alibi=alibi_slopes is not None,
    )

    blkkv = lambda: pl.BlockSpec(
        (1, 1, l_local, d_), lambda bi, hi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    anyspec = lambda: pl.BlockSpec(memory_space=pltpu.ANY)
    lsespec = pl.BlockSpec(
        (1, group, l_local, 1), lambda bi, hi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            anyspec(), blkkv(), blkkv(), anyspec(), anyspec(),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alibi slopes
            lsespec,
        ],
        out_specs=[anyspec(), anyspec(), anyspec()],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, l_local, d_), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, l_local, d_), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, l_local, d_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, l_local, d_), k.dtype),
            pltpu.VMEM((2, 2, l_local, d_), jnp.float32),
            pltpu.VMEM((group, l_local, d_), jnp.float32),
            pltpu.VMEM((l_local, d_), jnp.float32),
            pltpu.VMEM((l_local, d_), jnp.float32),
            pltpu.VMEM((2, blk_q, d_), k.dtype),
            pltpu.VMEM((2, blk_q, d_), k.dtype),
            pltpu.VMEM((2, blk_q, d_), k.dtype),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            collective_id=collective_id if world > 1 else None,
            vmem_limit_bytes=115 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qs, k, vsc, dout, out, slopes, lse4)
    return dq, dk, dv


def fused_ring_attention(q, k, v, *, scale, causal, axis_name,
                         blk_q=None, interpret=False, collective_id=7,
                         bwd_backend=None, bwd_mode="auto",
                         softcap=None, alibi_slopes=None):
    """Differentiable fused-ring attention on per-shard (B, Hq, L, D)
    tensors (contiguous sequence sharding, same layout as parallel.ring).
    Call inside shard_map over a 1-D ring axis. Returns
    (out in q.dtype, lse f32 (B, Hq, L)).

    Supports the cheap in-kernel logit transforms: softcap (tanh logit
    capping, same semantics as the grid kernels) and ALiBi (alibi_slopes,
    (Hq,) per-head slopes; distances use GLOBAL positions rank*L+row —
    matching ops.mask.alibi_bias). Segment/window/dropout extras stay
    schedule-level (ring_attention / the varlen rings).

    Forward runs the in-kernel RDMA ring. Backward (bwd_mode):
    - "fused": the in-kernel dual ring (_fused_ring_backward) — kv and the
      dk/dv accumulators co-rotate via RDMA inside one kernel.
    - "schedule": the schedule-level dual ring (parallel.ring._ring_bwd),
      numerically the gradient path ring_attention uses.
    - "auto" (default): fused when its working set fits VMEM, else
      schedule.

    collective_id must be unique among concurrently-launched collective
    Pallas kernels in one program (XLA requirement); the backward kernel
    uses collective_id + 1. Override when composing with others.

    The per-(batch, kv-head) working set must fit VMEM — asserted in
    _fused_ring_forward; fall back to parallel.ring.ring_attention beyond
    it (the headline 8k-tokens/chip shape fits).
    """
    @jax.custom_vjp
    def f(q, k, v):
        return _fused_ring_forward(
            q, k, v, scale=scale, causal=causal, axis_name=axis_name,
            blk_q=blk_q, interpret=interpret, collective_id=collective_id,
            softcap=softcap, alibi_slopes=alibi_slopes,
        )

    def f_fwd(q, k, v):
        out, lse = f(q, k, v)
        return (out, lse), (q, k, v, out, lse)

    def f_bwd(res, grads):
        from .ring import _ring_bwd

        q, k, v, out, lse = res
        dout, _ = grads
        mode = bwd_mode
        if mode == "auto":
            mode = (
                "fused"
                if fused_ring_bwd_supported(
                    k.shape[2], k.shape[3], q.shape[1] // k.shape[1],
                    k.dtype.itemsize,
                )
                else "schedule"
            )
        if mode == "fused":
            dq, dk, dv = _fused_ring_backward(
                q, k, v, dout, out, lse, scale=scale, causal=causal,
                axis_name=axis_name, interpret=interpret,
                collective_id=collective_id + 1,
                softcap=softcap, alibi_slopes=alibi_slopes,
            )
        else:
            backend = (
                "pallas_interpret" if (interpret and bwd_backend is None)
                else bwd_backend
            )
            dq, dk, dv = _ring_bwd(
                q, k, v, out, lse, dout, scale, causal, axis_name, backend,
                dict(softcap=softcap, alibi_slopes=alibi_slopes),
            )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v)
