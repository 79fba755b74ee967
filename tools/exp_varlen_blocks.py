"""Round-3 experiment: block-size sweep for the multi-segment varlen kernel.

The recorded varlen table (README 'Varlen kernel performance') shows the
5-segment packing at 23.9% of peak fwd vs 54% single-segment: boundary
sub-tiles pay masked passes at kv_sub=1024 granularity and short segments
waste most of a blk_q=1024 tile. This sweeps (blk_q, blk_kv, kv_sub) on the
real chip at the reference's packed-8k varlen benchmark shapes
(reference benchmark/benchmark_varlen_kvpacked_func.py:53-60) to see how
much finer tiling recovers.

The sweep is forward-only (the bwd optimum is tracked separately by
tools/exp_bwd_r4.py's varlen section).

Usage: python tools/exp_varlen_blocks.py [-n ITERS]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.pallas_fwd import pallas_block_fwd
from ring_flash_attn_tpu.utils.timing import timed
from ring_flash_attn_tpu.ops.varlen import (
    cu_seqlens_to_segids,
    cu_seqlens_to_positions,
)

B, HQ, HKV, D = 1, 32, 8, 128
T = 8192
PEAK = 197e12

CU_LIST = [
    [0, 8192],
    [0, 256, 7648, 8192],
    [0, 4096, 8192],
    [0, 3104, 6304, 7904, 8064, 8192],
]

SWEEP = [
    # (blk_q, blk_kv, kv_sub)
    (1024, 2048, 1024),  # current default
    (1024, 2048, 512),
    (512, 2048, 512),
    (512, 1024, 512),
    (512, 2048, 256),
    (256, 1024, 256),
    (1024, 1024, 512),
    (2048, 2048, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=10)
    args = ap.parse_args()

    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, T, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, T, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, T, D), jnp.bfloat16)
    scale = D ** -0.5

    for cu in CU_LIST:
        lens = np.diff(np.asarray(cu))
        flops = float(4 * HQ * D * np.sum(lens.astype(np.float64) ** 2) * 0.5)
        # static (numpy) metadata => compact pair grid, like the recorded
        # static mode in the benchmark
        seg = np.asarray(cu_seqlens_to_segids(np.asarray(cu, np.int32), T))
        pos = np.asarray(cu_seqlens_to_positions(np.asarray(cu, np.int32), T))
        mask = MaskArgs(
            causal=True, q_segids=seg, kv_segids=seg,
            q_pos=pos, kv_pos=pos, packed_self=True,
        )
        print(f"cu={cu}")
        for (bq, bkv, sub) in SWEEP:
            try:
                fwd = jax.jit(
                    lambda q_, k_, v_, bq=bq, bkv=bkv, sub=sub:
                    pallas_block_fwd(
                        q_, k_, v_, scale, mask, blk_q=bq, blk_kv=bkv,
                        kv_sub=sub, out_dtype=jnp.bfloat16)[0])
                t = timed(lambda q_: fwd(q_, k, v), q, args.n)
            except Exception as e:  # noqa: BLE001
                print(f"  bq={bq:5d} bkv={bkv:5d} sub={sub:5d}  FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}")
                continue
            print(f"  bq={bq:5d} bkv={bkv:5d} sub={sub:5d}  "
                  f"{t*1e3:7.2f} ms  {flops/t/PEAK*100:5.1f}% peak")


if __name__ == "__main__":
    main()
