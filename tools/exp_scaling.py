"""Context-length scaling of the causal flash kernels (single chip).

Replaces the round-2 wall-clock 32k datum with slope-harness numbers:
fwd and fwd+bwd at S = 8k ... 131k, reference head config (32q/8kv,
D=128, causal bf16, B=1). %-of-peak uses the causal triangle FLOPs.

Past S=32k the fused backward's resident dk/dv accumulators exceed the
32MB VMEM gate (ops/pallas_bwd_fused.FUSED_MAX_KV_BYTES) and the split
dq/dkv kernels take over — the regime BASELINE.md's 512k north star lives
in (VERDICT r3 item 6); this records the crossover.

Run alone (no concurrent chip jobs):
  PYTHONPATH=/root/.axon_site:/root/repo python -u tools/exp_scaling.py
      [--long]   also run 65k/131k (several minutes of compile)
"""

import sys

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.ops.flash import flash_attention
from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.utils.timing import timed

B, HQ, HKV, D = 1, 32, 8, 128
PEAK = 197e12
SCALE = D**-0.5


def run(s, hq=HQ, fwd_only=False):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, hq, s, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, s, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, s, D), jnp.bfloat16)
    mask = MaskArgs(causal=True)

    fwd_j = jax.jit(lambda q_, k_, v_: flash_attention(
        q_, k_, v_, SCALE, mask)[0].astype(jnp.bfloat16))

    n = max(2, int(120e-3 * 8192 / s))  # keep each chain ~fixed wall time
    f_fwd = 4 * s * s * hq * D * 0.5
    f_fb = f_fwd * 3.5
    dt_f = timed(lambda q_: fwd_j(q_, k, v), q, n=4 * n)
    if fwd_only:
        print(f"S={s:6d} hq={hq:2d}  fwd {dt_f*1e3:8.2f} ms "
              f"({f_fwd/dt_f/PEAK*100:5.1f}% peak)")
        return
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, hq, s, D),
                             jnp.bfloat16)

    def loss(q_, k_, v_, dout_):
        o, _ = flash_attention(q_, k_, v_, SCALE, mask)
        return jnp.sum(o.astype(jnp.float32) * dout_.astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, (0, 1, 2)))
    dt_b = timed(lambda q_: grad(q_, k, v, dout)[0].astype(jnp.bfloat16),
                 q, n=n)
    print(f"S={s:6d} hq={hq:2d}  fwd {dt_f*1e3:8.2f} ms "
          f"({f_fwd/dt_f/PEAK*100:5.1f}% peak)   fwd+bwd {dt_b*1e3:8.2f} ms "
          f"({f_fb/dt_b/PEAK*100:5.1f}% peak)")


def main():
    sizes = [8192, 16384, 32768]
    if "--long" in sys.argv:
        sizes += [65536, 131072]
    for s in sizes:
        run(s)
    if "--xl" in sys.argv:
        # BASELINE.md north-star regime. 262k at the full 32 q-heads
        # fits HBM for fwd+bwd (~11 GB peak live); 512k drops to 8
        # q-heads (the grads alone would exceed the 16 GB chip at 32).
        run(262144)
        run(524288, hq=8)


if __name__ == "__main__":
    main()
