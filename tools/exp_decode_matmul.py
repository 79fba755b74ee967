"""Decode-regime matmul experiment: tiny-row activations x huge weights.

benchmark_serving.py shows the model-level decode step at 33% of the
memory roofline, dominated by XLA's (8, K) @ (K, N) weight-streaming
matmuls. This times XLA vs a Pallas kernel that streams W through VMEM
blocks (activations resident), at the serving step's actual shapes.

Run alone: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/exp_decode_matmul.py
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ring_flash_attn_tpu.utils.trace_timing import trace_device_time

HBM_BW = 819e9
R = 8  # decode lanes


def _kernel(x_ref, w_ref, out_ref, acc_s, *, nk):
    ik = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)

    acc_s[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _():
        out_ref[...] = acc_s[...].astype(out_ref.dtype)


def pallas_decode_matmul(x, w, blk_n=512, blk_k=4096):
    r, k = x.shape
    _, n = w.shape
    blk_k = min(blk_k, k)
    while k % blk_k:
        blk_k //= 2
    blk_n = min(blk_n, n)
    while n % blk_n:
        blk_n //= 2
    nk, nn = k // blk_k, n // blk_n
    grid = (nn, nk)
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((r, blk_k), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk_k, blk_n), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((r, blk_n), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((r, blk_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, w)


def run(k, n, blk_n=512, blk_k=4096):
    x = jax.random.normal(jax.random.PRNGKey(0), (R, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
    nbytes = w.size * 2

    # feedback: fold the (R, n) output back to x's (R, k) shape so the
    # chain defeats the remote content cache
    def mk(f):
        if n >= k:
            g = jax.jit(lambda x_: jnp.tanh(f(x_, w)[:, :k]))
        else:
            g = jax.jit(
                lambda x_: jnp.tanh(
                    jnp.pad(f(x_, w), ((0, 0), (0, k - n)))
                )
            )
        return g

    for name, f in (
        ("xla", lambda x_, w_: x_ @ w_),
        ("pallas", lambda x_, w_: pallas_decode_matmul(
            x_, w_, blk_n=blk_n, blk_k=blk_k)),
    ):
        try:
            dt, _ = trace_device_time(mk(f), x)
        except Exception as e:  # noqa: BLE001
            print(f"({R},{k})x({k},{n}) {name:7s} FAILED "
                  f"{type(e).__name__}: {e}")
            continue
        print(f"({R},{k})x({k},{n}) {name:7s} {dt*1e6:8.1f} us "
              f"({nbytes/dt/1e9:5.0f} GB/s, {nbytes/HBM_BW/dt*100:5.1f}% "
              f"of W-stream SoL)")


def main():
    run(4096, 4096)
    run(4096, 14336)
    run(14336, 4096)
    run(4096, 32000, blk_n=1024)
    run(4096, 14336, blk_n=1024)
    run(4096, 14336, blk_n=2048)


if __name__ == "__main__":
    main()
