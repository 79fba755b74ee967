"""Round-3 causal-fwd block sweep on the attached chip.

VERDICT r2: causal@8k is 49.4% while causal@32k is 65% and mask-free@8k is
67.4% — the gap is per-q-block overhead (flush, short KV runs near the
diagonal, grid bookkeeping), not a VPU ceiling. This sweep isolates it by
varying (blk_q, blk_kv macro, kv_sub) on the production causal shape.

Run alone (no concurrent chip jobs / CPU suite): memory gotcha #6.
"""


import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.utils.timing import timed

from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops import pallas_fwd

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
PEAK = 197e12


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)
    scale = D**-0.5

    flops_c = 4 * S * S * HQ * D * 0.5
    flops_f = 4 * S * S * HQ * D

    def run(name, mask, flops, **kw):
        # k/v ride as jit ARGS: closed-over device arrays become jit
        # constants fetched back through the tunnel at ~minutes/MB
        f = jax.jit(lambda q_, k_, v_: pallas_fwd.pallas_block_fwd(
            q_, k_, v_, scale, mask, out_dtype=jnp.bfloat16, **kw)[0])
        try:
            dt = timed(lambda q_: f(q_, k, v), q)
        except Exception as e:  # noqa: BLE001 — sweep survives bad configs
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")
            return
        print(f"{name:28s} {dt*1e3:7.2f} ms  {flops/dt/PEAK*100:5.1f}% peak")

    causal = MaskArgs(causal=True)
    sweeps = [
        (1024, 2048, 1024),  # production baseline (r2)
        (2048, 2048, 1024),
        (1024, 4096, 1024),
        (2048, 4096, 1024),
        (2048, 2048, 2048),
        (1024, 2048, 2048),
        (2048, 4096, 2048),
        (4096, 4096, 1024),
        # bq=512 family, added after the fused-bwd sweep (exp_bwd_r3.py)
        # found 512/4096/1024 beating every bq>=1024 config
        (512, 2048, 1024),
        (512, 4096, 1024),
        (512, 4096, 512),
        (512, 2048, 512),
        (512, 1024, 1024),
        (256, 4096, 1024),
    ]
    for bq, bkv, sub in sweeps:
        run(f"causal q{bq}/kv{bkv}/s{sub}", causal, flops_c,
            blk_q=bq, blk_kv=bkv, kv_sub=sub)

    # mask-free reference points at matching macro sizes
    run("noncausal kv2048", MaskArgs(), flops_f, blk_kv=2048)
    run("noncausal kv4096", MaskArgs(), flops_f, blk_kv=4096)
    run("noncausal q2048/kv2048", MaskArgs(), flops_f,
        blk_q=2048, blk_kv=2048)


if __name__ == "__main__":
    main()
