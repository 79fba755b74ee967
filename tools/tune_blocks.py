"""Block-size sweep for the Pallas flash kernels on the attached chip.

Run: python tools/tune_blocks.py [fwd|bwd|both]
Prints ms + % of chip peak per (blk_q, blk_kv) at the headline shape
(BASELINE.md: B=1, Hq=32, Hkv=8, S=8192, D=128, causal, bf16).
"""

import sys
import time

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.pallas_fwd import pallas_block_fwd
from ring_flash_attn_tpu.ops.pallas_bwd import pallas_block_bwd

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
FWD_FLOPS = 4 * S * S * HQ * D * 0.5
BWD_FLOPS = FWD_FLOPS * 2.5
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
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D), jnp.bfloat16)
    scale = D**-0.5
    mask = MaskArgs(causal=True)

    blocks = [256, 512, 1024, 2048]
    if which in ("fwd", "both"):
        print("== fwd causal ==")
        for bq in blocks:
            for bkv in blocks:
                try:
                    f = jax.jit(lambda q_, bq=bq, bkv=bkv: pallas_block_fwd(
                        q_, k, v, scale, mask, blk_q=bq, blk_kv=bkv
                    )[0].astype(jnp.bfloat16))
                    dt = timed(f, q)
                    print(f"blk=({bq:5d},{bkv:5d})  {dt*1e3:7.2f} ms  "
                          f"{FWD_FLOPS/dt/PEAK*100:5.1f}% peak")
                except Exception as e:
                    print(f"blk=({bq:5d},{bkv:5d})  FAIL {type(e).__name__}: "
                          f"{str(e)[:80]}")

    if which in ("bwd", "both"):
        print("== bwd causal (dq+dkv) ==")
        out, lse = jax.jit(
            lambda q_: pallas_block_fwd(q_, k, v, scale, mask))(q)
        delta = jnp.sum(out * dout.astype(jnp.float32), axis=-1)
        out16 = out.astype(jnp.bfloat16)
        for bq in blocks:
            for bkv in blocks:
                try:
                    # consume dq+dk+dv: returning only dq lets XLA DCE the
                    # whole dkv pallas_call and fake the timing. tanh keeps
                    # the fed-back values bounded across iterations.
                    def f(q_, bq=bq, bkv=bkv):
                        dq, dk, dv = pallas_block_bwd(
                            dout, q_, k, v, lse, delta, scale, mask,
                            blk_q=bq, blk_kv=bkv,
                        )
                        mix = dq + (dk + dv).sum(1, keepdims=True)
                        return jnp.tanh(mix).astype(jnp.bfloat16)

                    f = jax.jit(f)
                    dt = timed(f, q)
                    print(f"blk=({bq:5d},{bkv:5d})  {dt*1e3:7.2f} ms  "
                          f"{BWD_FLOPS/dt/PEAK*100:5.1f}% peak")
                except Exception as e:
                    print(f"blk=({bq:5d},{bkv:5d})  FAIL {type(e).__name__}: "
                          f"{str(e)[:80]}")


if __name__ == "__main__":
    main()
