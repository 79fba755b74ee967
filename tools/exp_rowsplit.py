"""Experiment: split each q block into independent row-halves inside the
fwd kernel so Mosaic can overlap half A's softmax (VPU) with half B's
matmuls (MXU). Measures a minimal non-causal kernel at the headline shape
with split = 1 / 2 / 4.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
PEAK = 197e12
FLOPS = 4 * S * S * HQ * D


def kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *, split, blk_q,
           blk_kv, n_kv):
    ikv = pl.program_id(2)

    @pl.when(ikv == 0)
    def _():
        m_s[:, :1] = jnp.full((blk_q, 1), -1e30, jnp.float32)
        l_s[:, :1] = jnp.zeros((blk_q, 1), jnp.float32)
        acc_s[...] = jnp.zeros_like(acc_s)

    h = blk_q // split
    for i in range(split):
        r = slice(i * h, (i + 1) * h)
        s = jax.lax.dot_general(
            q_ref[0, 0, r, :], k_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_prev = m_s[r, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_new)
        pr = jnp.exp2(s - m_new)
        l_s[r, :1] = l_s[r, :1] * alpha + jnp.sum(pr, axis=1, keepdims=True)
        acc_s[r, :] = acc_s[r, :] * alpha + jax.lax.dot_general(
            pr.astype(v_ref.dtype), v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_s[r, :1] = m_new

    @pl.when(ikv == n_kv - 1)
    def _():
        o_ref[0, 0] = (acc_s[...] / l_s[:, :1]).astype(o_ref.dtype)


def run(split, blk_q=1024, blk_kv=2048):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)
    n_q, n_kv = S // blk_q, S // blk_kv
    g = HQ // HKV

    f = pl.pallas_call(
        functools.partial(kernel, split=split, blk_q=blk_q, blk_kv=blk_kv,
                          n_kv=n_kv),
        grid=(HQ, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, D), lambda hi, qi, ki: (0, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_kv, D),
                         lambda hi, qi, ki: (0, hi // g, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_kv, D),
                         lambda hi, qi, ki: (0, hi // g, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, D),
                               lambda hi, qi, ki: (0, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HQ, S, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )
    step = jax.jit(lambda q_: f(q_, k, v))
    x = step(q)
    jax.block_until_ready(x)
    t0 = time.time()
    n = 20
    for _ in range(n):
        x = step(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / n
    print(f"split={split} blk=({blk_q},{blk_kv}): {dt*1e3:6.2f} ms "
          f"{FLOPS/dt/PEAK*100:5.1f}% peak")


if __name__ == "__main__":
    for s_ in (1, 2, 4):
        run(s_)
