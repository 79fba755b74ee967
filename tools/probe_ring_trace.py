"""Single-chip ring-overhead probe via DEVICE TRACES (round-3 task 2).

Wall-clock is useless for sharded programs on this harness: the tunnel
re-stages sharded executables per call (PROBE_r02.log records 20,242 ms/call
for a 16 ms computation), and `jax.block_until_ready` is a no-op. Device
traces bypass both: `jax.profiler.trace` records per-kernel on-device
durations in xplane protos, which we parse directly.

Measures, at the reference headline shape (B=1, S=8192, 32q/8kv, D=128,
causal bf16):
  (a) raw single-chip flash fwd+bwd        — the roofline building block
  (b) W=1 zigzag shard_map train step      — schedule-level ring machinery
  (c) W=1 fused in-kernel-RDMA ring step   — the fused ring's machinery
The W=1 delta over (a) is the per-step overhead every ring step pays
(collective stubs, merge ops, layout plumbing) minus actual ICI transfer —
the only single-chip proxy for the reference's 8-GPU roofline table
(reference README.md:80-98).

Output: per-variant on-device total + top ops, and overhead percentages.
Writes PROBE_r03.log-worthy lines to stdout; run with
  PYTHONPATH=/root/.axon_site:/root/repo python -u tools/probe_ring_trace.py
"""

import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ring_flash_attn_tpu.utils.trace_timing import parse_device_time

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
SCALE = D**-0.5
N_ITERS = 6  # traced iterations per variant
PEAK = 197e12


def traced(tag, fn, feedback):
    """Run fn in a feedback chain under a profiler trace; return per-iter
    on-device seconds and the op breakdown."""
    from ring_flash_attn_tpu.utils.timing import fetch_barrier

    # compile + drain before tracing so the trace holds steady-state iters
    fetch_barrier(fn(feedback))
    logdir = tempfile.mkdtemp(prefix=f"trace_{tag}_")
    try:
        with jax.profiler.trace(logdir):
            x = feedback
            for _ in range(N_ITERS):
                x = fn(x)
            fetch_barrier(x)
        dev_s, copy_s, by_op = parse_device_time(logdir)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)
    per_iter = dev_s / N_ITERS
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:6]
    print(f"[{tag}] on-device compute {per_iter*1e3:.2f} ms/iter "
          f"(+ {copy_s/N_ITERS*1e3:.2f} ms/iter arg-staging copies — "
          f"harness tunnel artifact, see parse_device_time)")
    for op, s in top:
        print(f"    {s/N_ITERS*1e3:7.3f} ms  {op[:90]}")
    return per_iter


def main():
    from functools import partial

    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ring_flash_attn_tpu.ops.flash import flash_attention
    from ring_flash_attn_tpu.ops.mask import MaskArgs
    from ring_flash_attn_tpu.parallel.zigzag import zigzag_ring_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D),
                             jnp.bfloat16)

    # (a) raw flash fwd+bwd
    def loss(q_, k_, v_, dout_):
        o, _ = flash_attention(q_, k_, v_, SCALE, MaskArgs(causal=True))
        return jnp.sum(o.astype(jnp.float32) * dout_.astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, (0, 1, 2)))
    t_flash = traced(
        "raw-flash", lambda q_: grad(q_, k, v, dout)[0].astype(jnp.bfloat16), q
    )

    # (b) W=1 zigzag shard_map step
    mesh = Mesh(np.array(jax.devices()[:1]), ("sp",))

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
             out_specs=P(None, None, "sp", None), check_vma=False)
    def zz(q_, k_, v_):
        o, _ = zigzag_ring_attention(q_, k_, v_, scale=SCALE, axis_name="sp")
        return o

    def loss_zz(q_, k_, v_, dout_):
        return jnp.sum(zz(q_, k_, v_).astype(jnp.float32)
                       * dout_.astype(jnp.float32))

    grad_zz = jax.jit(jax.grad(loss_zz, (0, 1, 2)))
    t_zz = traced(
        "zigzag-w1", lambda q_: grad_zz(q_, k, v, dout)[0].astype(jnp.bfloat16),
        q,
    )

    # (c) W=1 fused in-kernel ring step
    try:
        from ring_flash_attn_tpu.parallel.fused_ring import fused_ring_attention

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(None, None, "sp", None),) * 3,
                 out_specs=P(None, None, "sp", None), check_vma=False)
        def fring(q_, k_, v_):
            o, _ = fused_ring_attention(q_, k_, v_, scale=SCALE,
                                        causal=True, axis_name="sp")
            return o

        def loss_fr(q_, k_, v_, dout_):
            return jnp.sum(fring(q_, k_, v_).astype(jnp.float32)
                           * dout_.astype(jnp.float32))

        grad_fr = jax.jit(jax.grad(loss_fr, (0, 1, 2)))
        t_fr = traced(
            "fused-ring-w1",
            lambda q_: grad_fr(q_, k, v, dout)[0].astype(jnp.bfloat16), q,
        )
    except Exception as e:  # noqa: BLE001 — fused ring is the experiment
        print(f"[fused-ring-w1] FAILED: {type(e).__name__}: {e}")
        t_fr = None

    flops = 4 * S * S * HQ * D * 0.5 * 3.5
    print()
    print(f"raw flash fwd+bwd : {t_flash*1e3:7.2f} ms on-device "
          f"({flops/t_flash/PEAK*100:.1f}% peak)")
    print(f"zigzag W=1        : {t_zz*1e3:7.2f} ms on-device "
          f"(+{(t_zz/t_flash-1)*100:5.1f}% schedule overhead)")
    if t_fr is not None:
        print(f"fused ring W=1    : {t_fr*1e3:7.2f} ms on-device "
              f"(+{(t_fr/t_flash-1)*100:5.1f}% vs raw flash)")


if __name__ == "__main__":
    main()
