"""Round-5: re-sweep fwd blocks under the spec softmax.

The r3 sweep (exp_fwd_r3.py) picked blk_q=1024 / kv macro 2048 / sub 1024
when the online-softmax rescale dominated the VPU. spec softmax removed
that cost entirely (docs/DESIGN.md §7c3), so the old "bigger q blocks
lose" conclusion may have flipped — this re-sweeps causal and mask-free
under softmax_mode="spec".

Run alone: PYTHONPATH=/root/.axon_site:/root/repo \
    python -u tools/exp_fwd_blocks_r5.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.utils.timing import timed
from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.pallas_fwd import pallas_block_fwd

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
PEAK = 197e12


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)
    scale = D**-0.5

    def run(name, mask, flops, **kw):
        f = jax.jit(lambda q_, k_, v_: pallas_block_fwd(
            q_, k_, v_, scale, mask, out_dtype=jnp.bfloat16,
            softmax_mode="spec", **kw)[0])
        try:
            dt = timed(lambda q_: f(q_, k, v), q)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:80]}")
            return
        print(f"{name:28s} {dt*1e3:7.2f} ms  {flops/dt/PEAK*100:5.1f}% peak",
              flush=True)

    causal = MaskArgs(causal=True)
    flops_c = 4 * S * S * HQ * D * 0.5
    flops_f = flops_c * 2
    for bq, bkv, sub in [
        (1024, 2048, 1024),  # production (r3 optimum under online softmax)
        (2048, 2048, 1024),
        (1024, 4096, 1024),
        (2048, 4096, 1024),
        (2048, 2048, 2048),
        (1024, 2048, 2048),
        (2048, 4096, 2048),
        (512, 2048, 1024),
        (1024, 2048, 512),
        (1024, 1024, 1024),
    ]:
        run(f"causal q{bq}/kv{bkv}/s{sub}", causal, flops_c,
            blk_q=bq, blk_kv=bkv, kv_sub=sub)
    for bq, bkv, sub in [
        (1024, 2048, 1024),
        (2048, 2048, 1024),
        (1024, 4096, 1024),
        (2048, 2048, 2048),
        (1024, 2048, 2048),
    ]:
        run(f"maskfree q{bq}/kv{bkv}/s{sub}", MaskArgs(), flops_f,
            blk_q=bq, blk_kv=bkv, kv_sub=sub)


if __name__ == "__main__":
    main()
