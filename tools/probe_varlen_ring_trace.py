"""Single-chip VARLEN ring-overhead probe via device traces.

Completes the varlen perf story: the README's varlen table records the raw
kernel's efficiency per packing; this measures what the zigzag-varlen RING
SCHEDULE adds on top (merge ops, ppermute stubs, custom-vjp plumbing,
grouped-layout slicing) — the varlen analog of tools/probe_ring_trace.py's
batch-path +3.2%, and the single-chip proxy for the reference's 8-GPU
varlen roofline table (reference README.md:91-98).

At W=1 the grouped zigzag layout is a permutation of the packed tokens
(front halves ++ back halves) with identical masked FLOPs, so the W=1
shard_map step vs the raw varlen kernel is an apples-to-apples overhead
measurement on true on-device time (wall-clock cannot time shard_map
programs through this harness's tunnel — PROBE_r02.log).

Run: python -u tools/probe_varlen_ring_trace.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ring_flash_attn_tpu.utils.trace_timing import parse_device_time
from ring_flash_attn_tpu.utils.timing import fetch_barrier

HQ, HKV, D = 32, 8, 128
T = 8192
SCALE = D**-0.5
N_ITERS = 6
PEAK = 197e12

# reference varlen benchmark packings that are divisible by 2 (zigzag W=1)
CU_LIST = [
    [0, 4096, 8192],
    [0, 3104, 6304, 7904, 8064, 8192],
]


def traced(tag, fn, feedback):
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
    print(f"[{tag}] on-device compute {per_iter*1e3:.2f} ms/iter "
          f"(+ {copy_s/N_ITERS*1e3:.2f} ms/iter arg-staging copies)")
    return per_iter


def main():
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ring_flash_attn_tpu.ops.flash import flash_attention
    from ring_flash_attn_tpu.ops.mask import MaskArgs
    from ring_flash_attn_tpu.ops.varlen import (
        cu_seqlens_to_segids,
        zigzag_varlen_info,
    )
    from ring_flash_attn_tpu.parallel.zigzag_varlen import (
        zigzag_ring_attention_varlen,
    )

    q = jax.random.normal(jax.random.PRNGKey(0), (1, HQ, T, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, HKV, T, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, HKV, T, D), jnp.bfloat16)
    dout = jax.random.normal(jax.random.PRNGKey(3), (1, HQ, T, D),
                             jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:1]), ("sp",))

    for cu in CU_LIST:
        lens = np.diff(np.asarray(cu))
        flops = float(4 * HQ * D * np.sum(lens.astype(np.float64) ** 2) * 0.5
                      * 3.5)  # fwd + bwd
        print(f"cu={cu}")

        # (a) raw varlen kernel fwd+bwd, zigzag-grouped token order (same
        # permutation the schedule sees, so boundary-tile costs match)
        cu_half = np.asarray(cu, np.int32) // 2
        seg_np, pos_np = map(
            np.asarray, zigzag_varlen_info(cu_half, T, 0, 1)
        )
        # packed_self=True: the grouped layout satisfies the packed-self
        # contract (within-sequence order preserved per half), so the
        # baseline gets the same compact/triangular grid enumeration the
        # api path and the README varlen table use (api.py sets it; an r3
        # baseline without it ran the full rectangular grid and understated
        # the schedule overhead — ADVICE r3)
        mask = MaskArgs(causal=True, q_segids=seg_np, kv_segids=seg_np,
                        q_pos=pos_np, kv_pos=pos_np, packed_self=True)

        def loss(q_, k_, v_, dout_, mask=mask):
            o, _ = flash_attention(q_, k_, v_, SCALE, mask)
            return jnp.sum(o.astype(jnp.float32) * dout_.astype(jnp.float32))

        grad = jax.jit(jax.grad(loss, (0, 1, 2)))
        t_raw = traced("raw-varlen",
                       lambda q_: grad(q_, k, v, dout)[0].astype(jnp.bfloat16),
                       q)

        # (b) W=1 zigzag-varlen shard_map step, same packing
        seg_j = jnp.asarray(seg_np)
        pos_j = jnp.asarray(pos_np)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(None, None, "sp", None),) * 3 + (P("sp"),) * 2,
                 out_specs=P(None, None, "sp", None), check_vma=False)
        def zzv(q_, k_, v_, seg_, pos_):
            o, _ = zigzag_ring_attention_varlen(
                q_, k_, v_, seg_, pos_, scale=SCALE, axis_name="sp")
            return o

        def loss_zz(q_, k_, v_, seg_, pos_, dout_):
            return jnp.sum(zzv(q_, k_, v_, seg_, pos_).astype(jnp.float32)
                           * dout_.astype(jnp.float32))

        grad_zz = jax.jit(jax.grad(loss_zz, (0, 1, 2)))
        t_zz = traced(
            "zigzag-varlen-w1",
            lambda q_: grad_zz(q_, k, v, seg_j, pos_j, dout)[0].astype(
                jnp.bfloat16),
            q,
        )

        print(f"  raw varlen kernel : {t_raw*1e3:7.2f} ms "
              f"({flops/t_raw/PEAK*100:4.1f}% peak)")
        print(f"  zigzag-varlen W=1 : {t_zz*1e3:7.2f} ms "
              f"({(t_zz/t_raw-1)*100:+5.1f}% schedule overhead)")


if __name__ == "__main__":
    main()
