"""Decode-kernel diagnosis via DEVICE TRACES (exact per-op durations).

tools/exp_decode_r3.py's slope timings are swamped by tunnel noise at
sub-100us kernel sizes (it printed >100%-of-SoL impossibilities). This
tool traces the real decode kernels and the stripped variants instead and
reports the Pallas custom-call op's on-device duration — exact, noise-free.

Run alone (no concurrent chip jobs).
"""

import functools
import shutil
import tempfile

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ring_flash_attn_tpu.utils.timing import fetch_barrier
from ring_flash_attn_tpu.utils.trace_timing import parse_device_time

B, HKV, HQ, D = 1, 8, 32, 128
S = 32768
HBM_BW = 819e9
N_ITERS = 8


def trace_op(tag, fn, feedback, nbytes):
    fetch_barrier(fn(feedback))
    logdir = tempfile.mkdtemp(prefix=f"dtrace_{tag.replace('/', '-')}_")
    try:
        with jax.profiler.trace(logdir):
            x = feedback
            for _ in range(N_ITERS):
                x = fn(x)
            fetch_barrier(x)
        dev_s, copy_s, by_op = parse_device_time(logdir)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)
    per = dev_s / N_ITERS
    print(f"{tag:32s} {per*1e6:8.1f} us  ({nbytes/per/1e9:6.0f} GB/s, "
          f"{nbytes/HBM_BW/per*100:5.1f}% of SoL)")
    for op, s in sorted(by_op.items(), key=lambda kv: -kv[1])[:3]:
        print(f"    {s/N_ITERS*1e6:8.1f} us  {op[:80]}")
    return per


def variant(mode, blk, dtype):
    """Stripped decode-kernel variant; see exp_decode_r3.py."""

    def kernel(q_ref, k_ref, v_ref, out_ref, acc_s, *, n_blk):
        ib = pl.program_id(1)

        @pl.when(ib == 0)
        def _():
            acc_s[...] = jnp.zeros_like(acc_s)

        for h in range(HKV):
            if mode == "dma":
                acc_s[h, :, :1] += (
                    k_ref[0, h, :1, :1].astype(jnp.float32)
                    + v_ref[0, h, :1, :1].astype(jnp.float32)
                )
            elif mode == "cast":
                kq = k_ref[0, h].astype(jnp.bfloat16)
                vq = v_ref[0, h].astype(jnp.bfloat16)
                acc_s[h, :, :1] += (
                    jnp.sum(kq[:1, :1]).astype(jnp.float32)
                    + jnp.sum(vq[:1, :1]).astype(jnp.float32)
                )[None, None]
            else:
                kq = k_ref[0, h].astype(jnp.bfloat16)
                vq = v_ref[0, h].astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    q_ref[0, h].astype(jnp.bfloat16), kq,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_s[h] += jax.lax.dot_general(
                    s.astype(jnp.bfloat16), vq,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(ib == n_blk - 1)
        def _():
            out_ref[0] = acc_s[...]

    rows = HQ // HKV
    n_blk = S // blk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_blk),
        in_specs=[
            pl.BlockSpec((1, HKV, rows, D), lambda bi, ib: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HKV, blk, D), lambda bi, ib: (bi, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HKV, blk, D), lambda bi, ib: (bi, 0, ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, HKV, rows, D), lambda bi, ib: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((HKV, rows, D), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(kernel, n_blk=n_blk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HKV, rows, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def main():
    rows = HQ // HKV
    q = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, rows, D),
                          jnp.float32)

    for dtype, tag in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        kq = jax.random.normal(
            jax.random.PRNGKey(0), (B, HKV, S, D), jnp.float32
        ).astype(dtype)
        vq = jax.random.normal(
            jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32
        ).astype(dtype)
        nbytes = kq.size * kq.dtype.itemsize * 2
        print(f"--- cache {tag}: {nbytes/1e6:.1f} MB, roofline "
              f"{nbytes/HBM_BW*1e6:.1f} us ---")
        for mode in ("dma", "cast", "matmul"):
            for blk in (4096, 8192):
                f = variant(mode, blk, dtype)
                g = jax.jit(lambda q_, k_, v_, f=f: jnp.tanh(f(q_, k_, v_)))
                try:
                    trace_op(f"{tag}/{mode}/blk{blk}",
                             lambda q_, g=g: g(q_, kq, vq), q, nbytes)
                except Exception as e:  # noqa: BLE001
                    print(f"{tag}/{mode}/blk{blk} FAILED "
                          f"{type(e).__name__}: {e}")

    # the real quant decode kernel at several block widths
    from ring_flash_attn_tpu.ops.quant import make_cache, update_cache
    from ring_flash_attn_tpu.ops.quant_decode_pallas import (
        pallas_quant_decode,
    )

    cache = make_cache(B, HKV, S, D, qdtype="int8")
    k = jax.random.normal(jax.random.PRNGKey(0), (B, HKV, S, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D),
                          jnp.bfloat16)
    cache = update_cache(cache, k, v, 0)
    qd = jax.random.normal(jax.random.PRNGKey(2), (B, HQ, 1, D),
                           jnp.bfloat16)
    nbytes = sum(x.size * x.dtype.itemsize for x in cache)
    print(f"--- real quant decode kernel: {nbytes/1e6:.1f} MB ---")
    for blk in (2048, 4096, 8192):
        step = jax.jit(functools.partial(
            lambda q_, c_, blk: pallas_quant_decode(
                q_, c_, S, D**-0.5, blk=blk
            )[0].astype(jnp.bfloat16).reshape(B, HQ, 1, D),
            blk=blk,
        ))
        try:
            trace_op(f"quant_decode/blk{blk}",
                     lambda q_, step=step: step(q_, cache), qd, nbytes)
        except Exception as e:  # noqa: BLE001
            print(f"quant_decode/blk{blk} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
