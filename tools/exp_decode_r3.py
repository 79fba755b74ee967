"""Round-3 decode-kernel diagnosis: where do the ~3x-off-roofline cycles go?

benchmark_decode.py measures quant int8 decode at 289 us for a 67 MB cache
(roofline 84.5 us) and paged bf16 at 629 us vs 164. Candidate costs per
block: the int8->bf16 VPU casts, the per-head VPU softmax chain on tiny
(rows=4, blk) tiles, and DMA. This tool times stripped-down kernel variants
that isolate each: a DMA+reduce-only pass, +casts, +matmuls, then the full
kernel at several block widths.

Run alone (no concurrent chip jobs).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ring_flash_attn_tpu.utils.timing import timed

B, HKV, HQ, D = 1, 8, 32, 128
S = 32768
HBM_BW = 819e9


def _variant_kernel(q_ref, k_ref, v_ref, out_ref, acc_s, *, mode, hkv, blk,
                    n_blk):
    ib = pl.program_id(1)

    @pl.when(ib == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)

    for h in range(hkv):
        if mode == "dma":
            # touch one lane-slice so the loads can't be DCE'd; no cast
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
        elif mode == "matmul":
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
        else:
            raise ValueError(mode)

    @pl.when(ib == n_blk - 1)
    def _():
        out_ref[0] = acc_s[...]


def run_variant(mode, blk, kq, vq, q, nbytes):
    n_blk = S // blk
    rows = q.shape[2]
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
    f = pl.pallas_call(
        functools.partial(_variant_kernel, mode=mode, hkv=HKV, blk=blk,
                          n_blk=n_blk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HKV, rows, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    # feedback chain: step must return a q-shaped value; tanh keeps the
    # fed-back magnitudes bounded across iterations
    g = jax.jit(lambda q_, k_, v_: jnp.tanh(f(q_, k_, v_)))
    try:
        dt = timed(lambda q_: g(q_, kq, vq), q, n=50, n0=5)
    except Exception as e:  # noqa: BLE001
        print(f"{mode:8s} blk={blk:5d} FAILED {type(e).__name__}: {e}")
        return
    print(f"{mode:8s} blk={blk:5d} {dt*1e6:8.1f} us  "
          f"({nbytes/dt/1e9:6.0f} GB/s, {nbytes/HBM_BW/dt*100:5.1f}% of SoL)")


def main():
    rows = (HQ // HKV) * 1
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
        print(f"--- cache dtype {tag}: {nbytes/1e6:.1f} MB, "
              f"roofline {nbytes/HBM_BW*1e6:.1f} us ---")
        for mode in ("dma", "cast", "matmul"):
            for blk in (2048, 4096, 8192):
                run_variant(mode, blk, kq, vq, q, nbytes)


if __name__ == "__main__":
    main()
