"""Sweep the dq and dkv backward kernels SEPARATELY on the attached chip.

pallas_block_bwd currently shares one (blk_q, blk_kv) between both kernels;
their access patterns differ (dq accumulates over kv steps per q block,
dkv accumulates over (group x q) steps per kv block), so their optima may
too. Prints ms per kernel per config at the headline shape.
"""

import time

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.pallas_fwd import pallas_block_fwd, _LOG2E, _LN2
from ring_flash_attn_tpu.ops import pallas_bwd

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
PEAK = 197e12
# hardware matmul FLOPs actually executed per kernel (causal half):
DQ_FLOPS = 3 * 2 * S * S * HQ * D * 0.5  # s, dp, dq matmuls
DKV_FLOPS = 4 * 2 * S * S * HQ * D * 0.5  # s^T, dv, dp^T, dk


def timed(f, feedback, n=20):
    state = f(feedback)
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
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D),
                             jnp.bfloat16)
    scale = D**-0.5
    mask = MaskArgs(causal=True)
    out, lse = jax.jit(lambda q_: pallas_block_fwd(q_, k, v, scale, mask))(q)
    delta = jnp.sum(out * dout.astype(jnp.float32), axis=-1)

    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    lse2 = jnp.maximum(lse.astype(jnp.float32) * _LOG2E, -5e29)
    lse4 = lse2[..., None]
    delta4 = delta.astype(jnp.float32)[..., None]
    lse_adj = lse4 - jnp.log2(jnp.float32(scale))
    v_dkv = (v.astype(jnp.float32) * _LN2).astype(v.dtype)

    print("== dq kernel ==")
    for bq in (256, 512, 1024):
        for bkv in (256, 512, 1024, 2048):
            try:
                f = jax.jit(lambda q_, bq=bq, bkv=bkv: jnp.tanh(
                    pallas_bwd._dq(dout, q_, k, v, lse_adj, delta4, mask,
                                   bq, bkv, False)).astype(jnp.bfloat16))
                dt = timed(f, qs)
                print(f"dq  blk=({bq:5d},{bkv:5d}) {dt*1e3:7.2f} ms "
                      f"{DQ_FLOPS/dt/PEAK*100:5.1f}% hw peak")
            except Exception as e:
                print(f"dq  blk=({bq:5d},{bkv:5d}) FAIL {str(e)[:60]}")

    print("== dkv kernel ==")
    for bq in (256, 512, 1024, 2048):
        for bkv in (256, 512, 1024):
            try:
                def f(q_, bq=bq, bkv=bkv):
                    dk, dv = pallas_bwd._dkv(
                        dout, q_, k, v_dkv, lse4, delta4 * _LN2, mask,
                        bq, bkv, False)
                    return jnp.tanh(
                        (dk + dv).sum(1, keepdims=True) + q_[:, :1, :, :1]
                    ).astype(jnp.bfloat16) + q_ * 0.5

                f = jax.jit(f)
                dt = timed(f, qs)
                print(f"dkv blk=({bq:5d},{bkv:5d}) {dt*1e3:7.2f} ms "
                      f"{DKV_FLOPS/dt/PEAK*100:5.1f}% hw peak")
            except Exception as e:
                print(f"dkv blk=({bq:5d},{bkv:5d}) FAIL {str(e)[:60]}")


if __name__ == "__main__":
    main()
