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


def _fused_ring_fwd_kernel(
    q_ref,  # (1, group, L, D) pre-scaled q, VMEM
    k_ref,  # (1, 1, L, D) local kv shard, VMEM
    v_ref,  # (1, 1, L, D)
    out_ref,  # (1, group, L, D)
    lse_ref,  # (1, group, L, 1) f32
    comm,  # VMEM (2, 2, L, D) [slot, k/v]
    acc,  # VMEM (group, L, D) f32
    stats,  # VMEM (group, L, 128) f32: lane 0 = m, lane 1 = l (one array
            # instead of two: VMEM tiles are 128 lanes wide regardless, so
            # packing the two single-lane stats halves the allocation)
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
):
    rank = jax.lax.axis_index(axis_name)
    nxt = jax.lax.rem(rank + 1, world)
    prv = jax.lax.rem(rank - 1 + world, world)

    for g in range(group):
        stats[g, :, 0:1] = jnp.full((l_local, 1), NEG_INF, jnp.float32)
        stats[g, :, 1:2] = jnp.zeros((l_local, 1), jnp.float32)
        acc[g] = jnp.zeros_like(acc[g])

    n_qb = l_local // blk_q

    def _attend(kk, vv, diagonal):
        """Online-softmax update of (m, l, acc) with the resident kv.

        diagonal=True applies the local causal mask (step 0); later steps
        are mask-free for every rank that computes — the reference's case
        split (ring_flash_attn.py:30-39)."""
        for g in range(group):
            for qb in range(n_qb):
                qs = q_ref[0, g, qb * blk_q:(qb + 1) * blk_q, :]
                s = jax.lax.dot_general(
                    qs, kk,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (blk_q, L) base-2 logits
                if diagonal:
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, (blk_q, 1), 0) + qb * blk_q
                    cols = jax.lax.broadcasted_iota(
                        jnp.int32, (1, l_local), 1)
                    s = jnp.where(rows >= cols, s, NEG_INF)
                row = slice(qb * blk_q, (qb + 1) * blk_q)
                m_prev = stats[g, row, 0:1]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp2(m_prev - m_new)
                pr = jnp.exp2(s - m_new)
                stats[g, row, 1:2] = stats[g, row, 1:2] * alpha + jnp.sum(
                    pr, axis=1, keepdims=True
                )
                acc[g, row, :] = acc[g, row, :] * alpha + jax.lax.dot_general(
                    pr.astype(vv.dtype), vv,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                stats[g, row, 0:1] = m_new

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
        _attend(k_ref[0, 0], v_ref[0, 0], causal)
    else:
        # upstream's step-0 send targets our slot 1: grant it
        _grant(1)
        for step in range(world):
            recv_slot = step % 2  # where THIS step's kv lives (step>=1)
            next_slot = (step + 1) % 2
            sends = None
            if step == 0:
                # forward the local shard, then compute on it (the DMA
                # hides behind the whole step's matmuls)
                _wait_credit(next_slot)
                sends = _send(k_ref.at[0, 0], v_ref.at[0, 0], next_slot)
                _attend(k_ref[0, 0], v_ref[0, 0], causal)
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
                        _attend(comm[recv_slot, 0], comm[recv_slot, 1],
                                False)
                else:
                    _attend(comm[recv_slot, 0], comm[recv_slot, 1], False)

            if sends is not None:
                # resident data must be fully out the door before its slot
                # can be promised upstream (and before we leave the step)
                for c in sends:
                    c.wait_send()
            if step <= world - 3:
                # upstream's step+1 send targets slot step%2 (resident this
                # step, now consumed): grant exactly once per consumption
                _grant(step % 2)

    # normalize once at the very end — no per-step out/lse HBM traffic
    for g in range(group):
        l = stats[g, :, 1:2]
        m = stats[g, :, 0:1]
        dead = jnp.logical_or(l == 0.0, m <= NEG_INF / 2)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, g] = jnp.where(dead, 0.0, acc[g] / l_safe).astype(
            out_ref.dtype
        )
        lse_ref[0, g] = jnp.where(
            dead, NEG_INF, (m + jnp.log2(l_safe)) * jnp.float32(_LN2),
        )


def _fused_ring_forward(q, k, v, *, scale, causal, axis_name,
                        blk_q=None, interpret=False, collective_id=7):
    """Non-differentiable fused-ring forward (see fused_ring_attention)."""
    b, hq, l_local, d_ = q.shape
    _, hkv, _, _ = k.shape
    assert hq % hkv == 0
    group = hq // hkv
    world = ring_size(axis_name)

    blk_q = blk_q or min(DEFAULT_BLOCK_Q, l_local)
    assert l_local % blk_q == 0, (l_local, blk_q)

    # Whole working set per (batch, kv-head) grid step. Mosaic's default
    # scoped-vmem budget is 16MB; we raise it via vmem_limit_bytes below,
    # so the gate is the physical VMEM (128MB on v5e) minus pipeline slack.
    # The headline shape (L=8192, group=4, D=128, bf16) needs ~76MB.
    vmem = (
        group * l_local * d_ * q.dtype.itemsize  # q resident
        + 6 * l_local * d_ * k.dtype.itemsize  # kv in + 2-slot double comm
        + group * l_local * d_ * 4  # acc f32
        + group * l_local * 128 * 4  # packed m/l stats (128-lane tiles)
        + group * l_local * d_ * q.dtype.itemsize  # out block
        + group * l_local * 128 * 4  # lse out block (single-lane, padded)
    )
    assert vmem < 100 * 1024 * 1024, (
        f"fused ring working set {vmem / 1e6:.1f}MB exceeds VMEM; use "
        "parallel.ring.ring_attention for this shape"
    )

    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    kernel = functools.partial(
        _fused_ring_fwd_kernel,
        axis_name=axis_name,
        world=world,
        causal=causal,
        group=group,
        l_local=l_local,
        blk_q=blk_q,
    )

    out, lse = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, group, l_local, d_),
                         lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_local, d_), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_local, d_), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, group, l_local, d_),
                         lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
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
    )(qs, k, v)
    return out, lse.squeeze(-1)


def fused_ring_attention(q, k, v, *, scale, causal, axis_name,
                         blk_q=None, interpret=False, collective_id=7,
                         bwd_backend=None):
    """Differentiable fused-ring attention on per-shard (B, Hq, L, D)
    tensors (contiguous sequence sharding, same layout as parallel.ring).
    Call inside shard_map over a 1-D ring axis. Returns
    (out in q.dtype, lse f32 (B, Hq, L)).

    Forward runs the in-kernel RDMA ring; backward falls back to the
    schedule-level dual ring (parallel.ring._ring_bwd) — numerically the
    same gradient path ring_attention uses. collective_id must be unique
    among concurrently-launched collective Pallas kernels in one program
    (XLA requirement); override it when composing with others.

    The per-(batch, kv-head) working set must fit VMEM — asserted in
    _fused_ring_forward; fall back to parallel.ring.ring_attention beyond
    it (the headline 8k-tokens/chip shape fits).
    """

    @jax.custom_vjp
    def f(q, k, v):
        return _fused_ring_forward(
            q, k, v, scale=scale, causal=causal, axis_name=axis_name,
            blk_q=blk_q, interpret=interpret, collective_id=collective_id,
        )

    def f_fwd(q, k, v):
        out, lse = f(q, k, v)
        return (out, lse), (q, k, v, out, lse)

    def f_bwd(res, grads):
        from .ring import _ring_bwd

        q, k, v, out, lse = res
        dout, _ = grads
        backend = (
            "pallas_interpret" if (interpret and bwd_backend is None)
            else bwd_backend
        )
        dq, dk, dv = _ring_bwd(
            q, k, v, out, lse, dout, scale, causal, axis_name, backend, {},
        )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v)
