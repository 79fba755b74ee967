"""Round-4: tune the SPLIT backward kernels in their long-KV regime.

Past Skv=32k the fused backward's resident dk/dv accumulators exceed the
VMEM gate and pallas_block_bwd falls back to the split dq/dkv kernels,
which still carried round-1 wall-clock tuning (VERDICT r3 item 6 — the
512k north star lives entirely here). This sweeps (blk_q, blk_kv) for the
split pair with the slope harness at S=65k, causal headline head config.

Run alone: PYTHONPATH=/root/.axon_site:/root/repo \
    python -u tools/exp_bwd_split_r4.py [S]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.ops.flash import flash_attention
from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.pallas_bwd import pallas_block_bwd
from ring_flash_attn_tpu.utils.timing import timed

B, HQ, HKV, D = 1, 32, 8, 128
PEAK = 197e12


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    mask = MaskArgs(causal=True)
    scale = D**-0.5
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, HQ, s, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, s, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, s, D), jnp.bfloat16)
    dout = jax.random.normal(ks[3], (B, HQ, s, D), jnp.bfloat16)
    out, lse = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, scale, mask)
    )(q, k, v)
    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )
    flops = 2.5 * 4 * s * s * HQ * D * 0.5

    results = []
    for bq in (512, 1024, 2048):
        for bkv in (512, 1024, 2048, 4096):
            # big arrays ride as jit ARGS: closed-over device arrays become
            # jit constants re-fetched through the tunnel at ~minutes/MB
            # (the r4 run of this tool never finished for exactly that)
            def f(q_, dout_, k_, v_, lse_, delta_, bq=bq, bkv=bkv):
                dq, dk, dv = pallas_block_bwd(
                    dout_, q_, k_, v_, lse_, delta_, scale, mask,
                    fused=False, blk_q=bq, blk_kv=bkv,
                )
                return (dq + jnp.sum(dk) + jnp.sum(dv)).astype(jnp.bfloat16)

            fj = jax.jit(f)
            try:
                dt = timed(
                    lambda q_: fj(q_, dout, k, v, lse, delta), q, n=6)
            except Exception as e:  # noqa: BLE001 — VMEM overflows expected
                print(f"bq={bq:5d} kv={bkv:5d}  FAILED ({type(e).__name__})")
                continue
            pct = flops / dt / PEAK * 100
            results.append((dt, bq, bkv))
            print(f"bq={bq:5d} kv={bkv:5d}  {dt*1e3:7.2f} ms "
                  f"({pct:5.1f}% of peak)")
    results.sort()
    dt, bq, bkv = results[0]
    print(f"\nbest: bq={bq} kv={bkv}  {dt*1e3:.2f} ms "
          f"({flops/dt/PEAK*100:.1f}%)  [r1 production: 1024/1024]")


if __name__ == "__main__":
    main()
