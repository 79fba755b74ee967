"""Varlen-API benchmark (TPU re-design of reference
benchmark/benchmark_varlen_kvpacked_func.py).

Packed multi-sequence config mirroring the reference's cu_seqlens shape;
runs ring-varlen, zigzag-varlen (grouped layout) and llama3
(heads_k_stride=4, reference :132) over all local devices.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ring_flash_attn_tpu.utils.timing import timed

B, HQ, HKV, D = 1, 32, 8, 128
SEQ_PER_DEV = 8192
SCALE = D**-0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument(
        "--single-chip", action="store_true",
        help="benchmark the raw varlen kernel on one chip (the reference's "
        "'theoretic flash_attn' baseline, reference README.md:91-98)",
    )
    args = ap.parse_args()
    if args.single_chip:
        run_single_chip()
    else:
        run(len(jax.devices()), args.fwd_only)


# The reference's exact packed-8k configs
# (reference benchmark/benchmark_varlen_kvpacked_func.py:53-60)
CU_SEQLENS_LIST = [
    [0, 8192],
    [0, 256, 7648, 8192],
    [0, 4096, 8192],
    [0, 3104, 6304, 7904, 8064, 8192],
]
PEAK = 197e12  # v5e bf16


def run_single_chip(n=20):
    """Single-chip varlen fwd / fwd+bwd at the reference benchmark shapes.

    %-of-peak uses the true masked FLOPs (sum of per-sequence causal
    triangles), so it is comparable with the batch kernel's %-of-peak
    numbers: equal % = equal per-FLOP efficiency."""
    from ring_flash_attn_tpu.api import flash_attn_varlen_kvpacked_func

    t = SEQ_PER_DEV
    q = jax.random.normal(jax.random.PRNGKey(0), (t, HQ, D), jnp.bfloat16)
    kv = jax.random.normal(
        jax.random.PRNGKey(1), (t, 2, HKV, D), jnp.bfloat16
    )
    dout = jax.random.normal(jax.random.PRNGKey(3), (t, HQ, D), jnp.bfloat16)

    print(f"single-chip varlen kernel, packed T={t}, {HQ}q/{HKV}kv heads, "
          f"D={D}, causal bf16 (reference benchmark config)")
    results = []
    for cu in CU_SEQLENS_LIST:
        lens = np.diff(np.asarray(cu))
        flops_fwd = float(4 * HQ * D * np.sum(lens.astype(np.float64) ** 2)
                          * 0.5)
        for static in (False, True):
            if static:
                # host cu_seqlens as a closure CONSTANT: the metadata
                # stays numpy, the kernels run the COMPACT pair grid
                # (one compile per packing) — flash-attn's own situation,
                # where cu_seqlens drive the CUDA launch config. numpy
                # constants embed in the HLO; only closed-over DEVICE
                # arrays poison lowering through this harness's tunnel.
                cu_np = np.asarray(cu, np.int32)
                fwd_j = jax.jit(
                    lambda q_, kv_, cu_np=cu_np:
                    flash_attn_varlen_kvpacked_func(
                        q_, kv_, cu_np, causal=True).astype(jnp.bfloat16))

                def loss(q_, kv_, dout_, cu_np=cu_np):
                    return jnp.sum(
                        flash_attn_varlen_kvpacked_func(
                            q_, kv_, cu_np, causal=True)
                        .astype(jnp.float32) * dout_.astype(jnp.float32)
                    )

                grad = jax.jit(jax.grad(loss))
                t_f = timed(lambda q_: fwd_j(q_, kv), q, n)
                t_fb = timed(
                    lambda q_: grad(q_, kv, dout).astype(jnp.bfloat16), q, n
                )
            else:
                cu_j = jnp.asarray(cu, jnp.int32)

                # kv/cu/dout ride as jit ARGS, never closures: closed-over
                # device arrays become jit constants whose lowering fetches
                # them back through this harness's tunnel at ~minutes/MB
                fwd_j = jax.jit(
                    lambda q_, kv_, cu_: flash_attn_varlen_kvpacked_func(
                        q_, kv_, cu_, causal=True).astype(jnp.bfloat16))

                def loss(q_, kv_, cu_, dout_):
                    return jnp.sum(
                        flash_attn_varlen_kvpacked_func(
                            q_, kv_, cu_, causal=True)
                        .astype(jnp.float32) * dout_.astype(jnp.float32)
                    )

                grad = jax.jit(jax.grad(loss))
                t_f = timed(lambda q_: fwd_j(q_, kv, cu_j), q, n)
                # one grad call = custom_vjp fwd + bwd (bench.py convention)
                t_fb = timed(
                    lambda q_: grad(q_, kv, cu_j, dout).astype(jnp.bfloat16),
                    q, n,
                )
            pf = flops_fwd / t_f / PEAK * 100
            pfb = flops_fwd * 3.5 / (t_fb) / PEAK * 100
            tag = "static" if static else "traced"
            if static:
                results.append((cu, 1 / t_f, pf, 1 / t_fb, pfb))
            print(f"  cu={str(cu):36s} [{tag}] fwd {t_f*1e3:6.2f} ms "
                  f"({pf:4.1f}% peak, {1/t_f:6.1f} it/s) | fwd+bwd "
                  f"{t_fb*1e3:6.2f} ms ({pfb:4.1f}% peak, "
                  f"{1/t_fb:5.1f} it/s)")
    mean_pf = float(np.mean([r[2] for r in results]))
    mean_pfb = float(np.mean([r[4] for r in results]))
    print(f"  mean (static): fwd {mean_pf:.1f}% of peak, fwd+bwd "
          f"{mean_pfb:.1f}% of peak")
    return results


def run(world, fwd_only):
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ring_flash_attn_tpu.ops.varlen import (
        ring_varlen_info,
        zigzag_varlen_info,
    )
    from ring_flash_attn_tpu.parallel.llama3 import llama3_attention
    from ring_flash_attn_tpu.parallel.ring_varlen import ring_attention_varlen
    from ring_flash_attn_tpu.parallel.zigzag_varlen import (
        zigzag_ring_attention_varlen,
    )

    if world < 2:
        print("varlen ring benchmarks need >= 2 chips; skipping")
        return
    s_g = SEQ_PER_DEV * world
    # 4 packed sequences, multiples of 2*world
    base = s_g // 4 // (2 * world) * (2 * world)
    cu_g = np.array([0, base, 2 * base, 3 * base, s_g])

    mesh = Mesh(np.array(jax.devices()[:world]), ("sp",))
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, s_g, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, s_g, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, s_g, D), jnp.bfloat16)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, s_g, D),
                             jnp.bfloat16)
    t_local = s_g // world

    variants = {}
    cu_local = jnp.asarray(cu_g // world, jnp.int32)
    seg, pos = [], []
    for r in range(world):
        s_, p_ = ring_varlen_info(cu_local, t_local, r)
        seg.append(s_)
        pos.append(p_)
    variants["ring_varlen"] = (
        lambda q_, k_, v_, s_, p_: ring_attention_varlen(
            q_, k_, v_, s_, p_, scale=SCALE, causal=True, axis_name="sp"
        ),
        jnp.concatenate(seg), jnp.concatenate(pos),
    )
    cu_half = jnp.asarray(cu_g // (2 * world), jnp.int32)
    seg, pos = [], []
    for r in range(world):
        s_, p_ = zigzag_varlen_info(cu_half, t_local, r, world)
        seg.append(s_)
        pos.append(p_)
    variants["zigzag_varlen"] = (
        lambda q_, k_, v_, s_, p_: zigzag_ring_attention_varlen(
            q_, k_, v_, s_, p_, scale=SCALE, axis_name="sp"
        ),
        jnp.concatenate(seg), jnp.concatenate(pos),
    )
    segids_g = np.searchsorted(cu_g, np.arange(s_g), side="right") - 1
    stride = min(4, HKV)  # reference benches heads_k_stride=4 (:132)
    variants[f"llama3 (stride={stride})"] = (
        lambda q_, k_, v_, s_, p_: llama3_attention(
            q_, k_, v_, s_, scale=SCALE, causal=True, heads_k_stride=stride,
            axis_name="sp",
        ),
        jnp.asarray(cu_g[segids_g], jnp.int32),
        jnp.arange(s_g, dtype=jnp.int32),  # unused
    )

    for name, (fn, seg_all, pos_all) in variants.items():
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(None, None, "sp", None),) * 3
                 + (P("sp"), P("sp")),
                 out_specs=P(None, None, "sp", None), check_vma=False)
        def attn(q_, k_, v_, s_, p_, fn=fn):
            o, _ = fn(q_, k_, v_, s_, p_)
            return o

        if fwd_only:
            f = jax.jit(lambda q_: attn(q_, k, v, seg_all, pos_all).astype(
                jnp.bfloat16))
        else:
            def loss(q_):
                return jnp.sum(
                    attn(q_, k, v, seg_all, pos_all).astype(jnp.float32)
                    * dout.astype(jnp.float32)
                )

            g = jax.jit(jax.grad(loss))
            f = lambda q_: g(q_).astype(jnp.bfloat16)
        dt = timed(f, q)
        print(f"{name:>16}: {1/dt:8.2f} iter/s")


if __name__ == "__main__":
    main()
