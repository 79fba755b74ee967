"""Batch-API benchmark (TPU re-design of reference
benchmark/benchmark_kvpacked_func.py).

Same config as the reference (:22-27): per-device seqlen 8192, 32 q-heads,
8 kv-heads, head_dim 128, causal, bf16, batch 1. Runs every batch variant
over all local TPU devices (ring schedules need >= 2; on one chip only the
flash baseline runs) and prints iter/s plus the fraction of the
"theoretic flash_attn" roofline = single-chip flash iter/s / world
(reference README.md:103).

Usage: python benchmark/benchmark_kvpacked_func.py [--fwd-only] [--profile]
--profile writes a jax.profiler trace to /tmp/rfa_trace (the reference uses
torch.profiler + TensorBoard export, benchmark_kvpacked_func.py:55-77).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
from functools import partial

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.utils.timing import timed
import numpy as np

B, HQ, HKV, SEQ, D = 1, 32, 8, 8192, 128
SCALE = D**-0.5


def make_data(s):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, s, D), jnp.bfloat16)
    kv = jax.random.normal(
        jax.random.PRNGKey(1), (2, B, HKV, s, D), jnp.bfloat16
    )
    dout = jax.random.normal(jax.random.PRNGKey(2), (B, HQ, s, D), jnp.bfloat16)
    return q, kv, dout


def bench_flash(fwd_only):
    from ring_flash_attn_tpu.ops.flash import flash_attention
    from ring_flash_attn_tpu.ops.mask import MaskArgs

    q, kv, dout = make_data(SEQ)

    if fwd_only:
        f = jax.jit(lambda q_: flash_attention(
            q_, kv[0], kv[1], SCALE, MaskArgs(causal=True)
        )[0].astype(jnp.bfloat16))
        return timed(f, q)

    def loss(q_):
        o, _ = flash_attention(q_, kv[0], kv[1], SCALE, MaskArgs(causal=True))
        return jnp.sum(o.astype(jnp.float32) * dout.astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    return timed(lambda q_: g(q_).astype(jnp.bfloat16), q)


def bench_variant(name, world, fwd_only):
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ring_flash_attn_tpu.parallel.ring import ring_attention
    from ring_flash_attn_tpu.parallel.stripe import stripe_attention
    from ring_flash_attn_tpu.parallel.zigzag import zigzag_ring_attention

    fns = {
        "ring": lambda q, k, v: ring_attention(
            q, k, v, scale=SCALE, causal=True, axis_name="sp"
        ),
        "zigzag": lambda q, k, v: zigzag_ring_attention(
            q, k, v, scale=SCALE, axis_name="sp"
        ),
        "stripe": lambda q, k, v: stripe_attention(
            q, k, v, scale=SCALE, axis_name="sp"
        ),
    }
    mesh = Mesh(np.array(jax.devices()[:world]), ("sp",))
    q, kv, dout = make_data(SEQ * world)

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
             out_specs=P(None, None, "sp", None), check_vma=False)
    def attn(q, k, v):
        o, _ = fns[name](q, k, v)
        return o

    if fwd_only:
        f = jax.jit(lambda q_: attn(q_, kv[0], kv[1]).astype(jnp.bfloat16))
        return timed(f, q)

    def loss(q_):
        return jnp.sum(attn(q_, kv[0], kv[1]).astype(jnp.float32)
                       * dout.astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    return timed(lambda q_: g(q_).astype(jnp.bfloat16), q)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    world = len(jax.devices())
    if args.profile:
        jax.profiler.start_trace("/tmp/rfa_trace")

    dt_flash = bench_flash(args.fwd_only)
    print(f"flash_attn (1 chip): {1/dt_flash:8.1f} iter/s")
    roofline = 1 / dt_flash / world
    if world >= 2:
        print(f"theoretic flash_attn / {world}: {roofline:8.1f} iter/s")
        for name in ("ring", "zigzag", "stripe"):
            dt = bench_variant(name, world, args.fwd_only)
            print(f"{name:>8}: {1/dt:8.1f} iter/s ({1/dt/roofline*100:5.1f}%)")
    else:
        print("(1 device: ring variants need >= 2 chips; see bench.py for "
              "the single-chip headline)")

    if args.profile:
        jax.profiler.stop_trace()
        print("trace written to /tmp/rfa_trace")


if __name__ == "__main__":
    main()
