"""Isolate the causal fwd kernel's overhead sources on the attached chip.

Variants (timing-only):
  causal      — production triangular causal kernel
  rect        — causal but rectangular grid w/ clamp+skip (llama3-style)
  noncausal   — full rectangular, no masking (the 64% reference point)
  noncausal1k — same with blk_kv=1024 (same blocks as causal)
  half-rect   — mask-free at causal FLOPs (isolates init/flush overheads)
"""

import time

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops import pallas_fwd

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
PEAK = 197e12


def timed(f, feedback, n=20):
    state = feedback
    state = f(state)
    jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(n):
        state = f(state)
    jax.block_until_ready(state)
    return (time.time() - t0) / n


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)
    scale = D**-0.5

    flops_c = 4 * S * S * HQ * D * 0.5
    flops_f = 4 * S * S * HQ * D

    def run(name, mask, flops, **kw):
        f = jax.jit(lambda q_: pallas_fwd.pallas_block_fwd(
            q_, k, v, scale, mask, out_dtype=jnp.bfloat16, **kw)[0])
        dt = timed(f, q)
        print(f"{name:12s} {dt*1e3:7.2f} ms  {flops/dt/PEAK*100:5.1f}% peak")

    run("causal", MaskArgs(causal=True), flops_c)
    run("rect", MaskArgs(causal=True, offset=jnp.int32(0)), flops_c)
    run("noncausal", MaskArgs(), flops_f)
    run("noncausal1k", MaskArgs(), flops_f, blk_kv=1024)

    # emulate a mask-free workload at causal FLOPs: half-length full
    # attention (rectangular grid, no masks) isolates the non-mask
    # overheads (init/flush amortization) from the diagonal mask pass
    s2 = S // 2
    k2, v2 = k[:, :, :s2], v[:, :, :s2]
    f = jax.jit(lambda q_: pallas_fwd.pallas_block_fwd(
        q_, k2, v2, scale, MaskArgs(), out_dtype=jnp.bfloat16)[0])
    dt = timed(f, q)
    print(f"{'half-rect':12s} {dt*1e3:7.2f} ms  "
          f"{flops_c/dt/PEAK*100:5.1f}% peak (same FLOPs as causal)")


if __name__ == "__main__":
    main()
