"""Re-sweep the fused backward kernel's block sizes with the SLOPE harness.

The production config (blk_q 1024, kv macro 2048, sub 1024) was picked in
round 2 with wall-clock timing, which the round-3 methodology work showed
carries per-call dispatch cost (the fwd sweep moved several points when
re-measured honestly). This sweeps (blk_q, blk_kv, kv_sub) on the causal
headline shape with utils.timing.timed and consumes dq+dk+dv (partial
feedback lets XLA DCE whole pallas calls).

Run alone: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/exp_bwd_r3.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.ops.flash import flash_attention
from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.pallas_bwd_fused import pallas_block_bwd_fused
from ring_flash_attn_tpu.utils.timing import timed

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
PEAK = 197e12
# algorithmic bwd FLOPs (2.5x fwd, causal half)
FLOPS = 2.5 * 4 * S * S * HQ * D * 0.5


def main():
    mask = MaskArgs(causal=True)
    scale = D**-0.5
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.bfloat16)
    dout = jax.random.normal(ks[3], (B, HQ, S, D), jnp.bfloat16)
    out, lse = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, scale, mask)
    )(q, k, v)
    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )
    out_b = out.astype(jnp.bfloat16)

    configs = []
    for bq in (512, 1024, 2048):
        for bkv in (1024, 2048, 4096):
            for sub in (512, 1024, 2048):
                if sub > bkv:
                    continue
                configs.append((bq, bkv, sub))

    results = []
    for bq, bkv, sub in configs:
        def f(q_, bq=bq, bkv=bkv, sub=sub):
            dq, dk, dv = pallas_block_bwd_fused(
                dout, q_, k, v, lse, delta, scale, mask,
                blk_q=bq, blk_kv=bkv, kv_sub=sub,
            )
            # consume everything; feed back a q-shaped tensor
            return (dq + jnp.sum(dk) + jnp.sum(dv)).astype(jnp.bfloat16)

        try:
            jf = jax.jit(f)
            dt = timed(jf, q)
        except Exception as e:  # noqa: BLE001 — VMEM overflows expected
            print(f"bq={bq:5d} kv={bkv:5d} sub={sub:5d}  FAILED "
                  f"({type(e).__name__})")
            continue
        pct = FLOPS / dt / PEAK * 100
        results.append((dt, bq, bkv, sub))
        print(f"bq={bq:5d} kv={bkv:5d} sub={sub:5d}  {dt*1e3:7.2f} ms "
              f"({pct:5.1f}% of peak)")
    results.sort()
    dt, bq, bkv, sub = results[0]
    print(f"\nbest: bq={bq} kv={bkv} sub={sub}  {dt*1e3:.2f} ms "
          f"({FLOPS/dt/PEAK*100:.1f}%)  [production: 1024/2048/1024]")

    _ = out_b  # keep fwd artifacts alive


if __name__ == "__main__":
    main()
