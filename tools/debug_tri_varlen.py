"""Isolate the packed_self triangular varlen kernel's on-chip compile.

Stages: tiny shape -> benchmark shape, fwd only, AOT-compiled so compile
time and execute time are visible separately. Prints progress unbuffered.
"""

import sys
import time

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.pallas_fwd import pallas_block_fwd
from ring_flash_attn_tpu.ops.varlen import (
    cu_seqlens_to_positions,
    cu_seqlens_to_segids,
)


def run(total, cu, hq=8, hkv=2, d=128, packed_self=True):
    q = jax.random.normal(jax.random.PRNGKey(0), (1, hq, total, d),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, hkv, total, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, hkv, total, d),
                          jnp.bfloat16)
    cu_j = jnp.asarray(cu, jnp.int32)

    # EVERYTHING as jit ARGS, never closures: closed-over device arrays
    # become jit constants whose lowering fetches them back through the
    # tunnel at ~minutes/MB (the r3 "hang")
    def f(q_, k_, v_, cu_):
        seg = cu_seqlens_to_segids(cu_, total)
        pos = cu_seqlens_to_positions(cu_, total)
        mask = MaskArgs(
            causal=True, q_segids=seg, kv_segids=seg, q_pos=pos,
            kv_pos=pos, packed_self=packed_self,
        )
        return pallas_block_fwd(
            q_, k_, v_, d**-0.5, mask, out_dtype=jnp.bfloat16)[0]

    f = jax.jit(f)
    t0 = time.time()
    print(f"[{total} ps={packed_self}] lowering...", flush=True)
    lowered = f.lower(q, k, v, cu_j)
    print(f"[{total}] lowered in {time.time()-t0:.1f}s; compiling...",
          flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[{total}] compiled in {time.time()-t0:.1f}s; executing...",
          flush=True)
    t0 = time.time()
    out = jax.block_until_ready(compiled(q, k, v, cu_j))
    print(f"[{total}] executed in {time.time()-t0:.1f}s; "
          f"|out| {float(jnp.abs(out).mean()):.4f}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "tiny"):
        run(1024, [0, 256, 768, 1024])
    if which in ("all", "mid"):
        run(4096, [0, 1024, 4096])
    if which in ("all", "big"):
        run(8192, [0, 8192])
    if which in ("all", "big4"):
        run(8192, [0, 3104, 6304, 7904, 8064, 8192])
