"""Serving-path decode benchmark: per-step latency vs the HBM roofline.

Decode attention is memory-bound: one query token reads the whole KV cache
once, so the speed of light is cache_bytes / HBM bandwidth (v5e: 819 GB/s).
Reports per-step time and % of that roofline for

  - quantized (int8) contiguous cache, 32k context        (ops/quant.py)
  - bf16 paged cache, vLLM-style block tables, 8k context (ops/paged.py)
  - int8 paged cache                                      (ops/paged.py)

These are serving extensions over the reference (it has no decode path);
the configs mirror the README claims being re-measured.

Timing is on-device via profiler traces (utils/trace_timing): decode steps
are ~100 us, far below this harness's ~200 us per-call dispatch latency,
so any host-side method (including the slope harness) measures dispatch,
not the kernel. The slope number is printed alongside as "wall" for
transparency.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchmark/benchmark_decode.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.utils.timing import timed
from ring_flash_attn_tpu.utils.trace_timing import trace_device_time

HBM_BW = 819e9  # v5e HBM bytes/s
D = 128
HQ, HKV = 32, 8
SCALE = D**-0.5


def report(name, dt, cache_bytes, wall_dt=None):
    roof = cache_bytes / HBM_BW
    wall = f"  [wall {wall_dt*1e6:.0f} us: dispatch-bound]" if wall_dt else ""
    print(f"{name:36s} {dt*1e6:8.1f} us/step  (roofline {roof*1e6:6.1f} us, "
          f"{roof/dt*100:5.1f}% of HBM speed-of-light){wall}")


def bench_quant_decode():
    from ring_flash_attn_tpu.ops.quant import make_cache, update_cache

    B, S = 1, 32768
    cache = make_cache(B, HKV, S, D, qdtype="int8")
    k = jax.random.normal(jax.random.PRNGKey(0), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    cache = update_cache(cache, k, v, 0)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, HQ, 1, D), jnp.bfloat16)

    from ring_flash_attn_tpu.ops.quant import quant_decode_attention

    # cache rides as jit args (closure device arrays become jit constants
    # that re-fetch through the harness tunnel at lowering)
    @jax.jit
    def step(q_, cache_):
        o, _ = quant_decode_attention(q_, cache_, S, SCALE)
        return o.astype(jnp.bfloat16)

    wall = timed(lambda q_: step(q_, cache), q, n=50, n0=5)
    dt, _ = trace_device_time(lambda q_: step(q_, cache), q)
    nbytes = sum(x.size * x.dtype.itemsize for x in cache)
    report(f"quant int8 decode B={B} ctx={S}", dt, nbytes, wall)
    return dt


def bench_paged(quant, page=256):
    from ring_flash_attn_tpu.ops import paged

    B, ctx = 4, 8192
    pages_per_seq = ctx // page
    if quant:
        cache = paged.paged_quant_init(
            B, HKV, B * pages_per_seq, page, pages_per_seq, D, qdtype="int8"
        )
        prefill, decode = paged.paged_quant_prefill, \
            paged.paged_quant_decode_attention
    else:
        cache = paged.paged_init(B, HKV, B * pages_per_seq, page,
                                 pages_per_seq, D)
        prefill, decode = paged.paged_prefill, paged.paged_decode_attention
    k = jax.random.normal(jax.random.PRNGKey(0), (B, HKV, ctx, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, ctx, D),
                          jnp.bfloat16)
    lens = jnp.full((B,), ctx, jnp.int32)
    cache = prefill(cache, k, v, lens)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, HQ, 1, D), jnp.bfloat16)

    @jax.jit
    def step(q_, cache_):
        o, _ = decode(q_, cache_, SCALE)
        return o.astype(jnp.bfloat16)

    wall = timed(lambda q_: step(q_, cache), q, n=50, n0=5)
    dt, _ = trace_device_time(lambda q_: step(q_, cache), q)
    # bytes the step must read: every valid page of k and v (+ scales)
    kind = "int8" if quant else "bf16"
    nbytes = sum(
        x.size * x.dtype.itemsize
        for x in (cache.k_pages, cache.v_pages)
    )
    if quant:
        nbytes += sum(
            x.size * x.dtype.itemsize
            for x in (cache.k_scales, cache.v_scales)
        )
    report(f"paged {kind} decode B={B} ctx={ctx} pg={page}", dt, nbytes,
           wall)
    return dt


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} (HBM roofline assumes v5e 819 GB/s)")
    bench_quant_decode()
    bench_paged(quant=False)
    bench_paged(quant=True)
    # int8 at pg=256 is DMA-transfer-size-bound (256KB K pages through
    # the block-table gather); pg=512 restores bf16-sized transfers and
    # with it the bf16 kernel's ~88%-of-SoL efficiency at half the bytes
    bench_paged(quant=True, page=512)


if __name__ == "__main__":
    main()
