"""Round-4 fused-backward experiments (VERDICT r3 item 1).

Measures, with the slope harness (utils/timing.timed):
  a) the fused bwd's MASK-FREE ceiling (causal=False, 2x the FLOPs) — the
     analog of the fwd's 77.8% ceiling (DESIGN.md section 7c), so the causal
     target is known;
  b) the current causal production config as the baseline;
  c) variants as they land (delta folded in-kernel, diagonal sub-splitting).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/exp_bwd_r4.py
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


def setup(causal):
    mask = MaskArgs(causal=causal)
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
    return mask, scale, q, k, v, dout, out, lse, delta


def run(tag, causal, blk_q=None, blk_kv=None, sub=None, fold=False, **kw):
    mask, scale, q, k, v, dout, out, lse, delta = setup(causal)
    flops = 2.5 * 4 * S * S * HQ * D * (0.5 if causal else 1.0)

    def f(q_):
        dq, dk, dv = pallas_block_bwd_fused(
            dout, q_, k, v, lse, None if fold else delta, scale, mask,
            blk_q=blk_q, blk_kv=blk_kv, kv_sub=sub,
            out=out if fold else None, **kw,
        )
        return (dq + jnp.sum(dk) + jnp.sum(dv)).astype(jnp.bfloat16)

    try:
        dt = timed(jax.jit(f), q)
    except Exception as e:  # noqa: BLE001
        print(f"{tag:44s}  FAILED ({type(e).__name__}: {e})")
        return None
    pct = flops / dt / PEAK * 100
    print(f"{tag:44s}  {dt*1e3:7.2f} ms  ({pct:5.1f}% of peak)")
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ceiling"):
        # mask-free ceiling: same kernel, no causal dispatch, 2x FLOPs
        run("mask-free bwd 512/4096/1024 (CEILING)", False)
    if which in ("all", "base"):
        run("causal bwd fine=1024 (r3 BASELINE)", True, kv_fine=1024)
    if which in ("all", "strips"):
        run("causal bwd fine=512", True, kv_fine=512)
        run("causal bwd fine=256", True, kv_fine=256)
        run("causal bwd fine=512 + fold_delta", True, kv_fine=512, fold=True)
        run("causal bwd fine=256 + fold_delta", True, kv_fine=256, fold=True)
        run("causal bwd fine=1024 + fold_delta", True, kv_fine=1024,
            fold=True)


if __name__ == "__main__":
    main()
