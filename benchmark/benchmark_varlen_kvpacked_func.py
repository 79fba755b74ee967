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
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B, HQ, HKV, D = 1, 32, 8, 128
SEQ_PER_DEV = 8192
SCALE = D**-0.5


def timed(step, x0, n=10):
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(n):
        x = step(x)
    jax.block_until_ready(x)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()
    run(len(jax.devices()), args.fwd_only)


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
