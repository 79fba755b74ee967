"""Single-chip proxies for the multi-chip roofline fraction (VERDICT r1 #8).

With one chip, the ring schedules' collective permutes are no-ops, so a
world=1 shard_map step isolates everything EXCEPT the wire: schedule-level
merges, stacks, custom_vjp plumbing, and per-step kernel launches. The
measured overhead % is the floor on what the multi-chip zigzag step pays on
top of the raw kernels — the only measurable piece of the reference's
published roofline fractions (reference README.md:80-104) on this harness.

Also benchmarks the fused in-kernel ring at world=1 at the headline shape
(L=8192, group=4 fits VMEM since the round-2 gate raise) vs the raw flash
forward: its step-0 path is the same resident-KV attend, so the delta is
the in-kernel ring machinery's cost.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_ring_overhead.py
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from ring_flash_attn_tpu.ops.flash import flash_attention  # noqa: E402
from ring_flash_attn_tpu.ops.mask import MaskArgs  # noqa: E402
from ring_flash_attn_tpu.parallel.fused_ring import (  # noqa: E402
    fused_ring_attention,
)
from ring_flash_attn_tpu.parallel.zigzag import (  # noqa: E402
    zigzag_ring_attention,
)

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
SCALE = D**-0.5


def timed(f, feedback, n=20):
    state = f(feedback)
    jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(n):
        state = f(state)
    jax.block_until_ready(state)
    return (time.time() - t0) / n


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.bfloat16)
    dout = jax.random.normal(ks[3], (B, HQ, S, D), jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:1]), ("sp",))

    # --- raw flash fwd+bwd ------------------------------------------------
    def raw_loss(q_, k_, v_):
        o, _ = flash_attention(q_, k_, v_, SCALE, MaskArgs(causal=True))
        return jnp.sum(o.astype(jnp.float32) * dout.astype(jnp.float32))

    raw_grad = jax.jit(jax.grad(raw_loss, (0, 1, 2)))
    dt_raw = timed(lambda q_: raw_grad(q_, k, v)[0].astype(jnp.bfloat16), q)
    print(f"raw flash fwd+bwd:            {dt_raw*1e3:7.2f} ms")

    # --- world=1 zigzag schedule fwd+bwd ---------------------------------
    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
             out_specs=P(None, None, "sp", None), check_vma=False)
    def zz(q_, k_, v_):
        o, _ = zigzag_ring_attention(q_, k_, v_, scale=SCALE, axis_name="sp")
        return o

    def zz_loss(q_, k_, v_):
        return jnp.sum(zz(q_, k_, v_).astype(jnp.float32)
                       * dout.astype(jnp.float32))

    zz_grad = jax.jit(jax.grad(zz_loss, (0, 1, 2)))
    dt_zz = timed(lambda q_: zz_grad(q_, k, v)[0].astype(jnp.bfloat16), q)
    ovh = (dt_zz / dt_raw - 1) * 100
    print(f"zigzag W=1 schedule fwd+bwd:  {dt_zz*1e3:7.2f} ms "
          f"(schedule overhead {ovh:+.1f}%)")

    # --- raw flash fwd only ----------------------------------------------
    def raw_fwd(q_):
        o, _ = flash_attention(q_, k, v, SCALE, MaskArgs(causal=True))
        return (o * 0.05 + q_ * 0.95).astype(jnp.bfloat16)

    dt_fwd = timed(jax.jit(raw_fwd), q)
    print(f"raw flash fwd:                {dt_fwd*1e3:7.2f} ms")

    # --- fused in-kernel ring W=1 fwd ------------------------------------
    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
             out_specs=(P(None, None, "sp", None), P(None, None, "sp")),
             check_vma=False)
    def fr(q_, k_, v_):
        return fused_ring_attention(
            q_, k_, v_, scale=SCALE, causal=True, axis_name="sp"
        )

    jfr = jax.jit(lambda q_: (lambda o, l: (o * 0.05 + q_ * 0.95).astype(
        jnp.bfloat16))(*fr(q_, k, v)))
    dt_fr = timed(jfr, q)
    ovh_fr = (dt_fr / dt_fwd - 1) * 100
    print(f"fused ring W=1 fwd:           {dt_fr*1e3:7.2f} ms "
          f"(vs raw fwd {ovh_fr:+.1f}%)")


if __name__ == "__main__":
    main()
