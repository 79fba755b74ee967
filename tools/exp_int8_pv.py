"""Round-4 A/B: int8-native PV vs bf16-dequant PV in the paged int8
decode kernel, plus a pages_per_step sweep.

The int8-native QK (VERDICT r3 item 7) took paged int8 decode 67% -> ~76%
of HBM speed-of-light; the remaining per-element work is either the
(Hkv*ps, D) V dequant cast (bf16 path) or the per-row p quantization
(round/divide on (nrows, Hkv*ps); int8-native path). Both are plausible
winners — this measures them back-to-back on the same chip state, 3
repeats each, with a fanout sweep.

Run alone: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/exp_int8_pv.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.ops import paged
from ring_flash_attn_tpu.utils.trace_timing import trace_device_time

HBM_BW = 819e9
B, CTX, PAGE = 4, 8192, 256
HQ, HKV, D = 32, 8, 128
SCALE = D**-0.5


def build_cache():
    pages_per_seq = CTX // PAGE
    cache = paged.paged_quant_init(
        B, HKV, B * pages_per_seq, PAGE, pages_per_seq, D, qdtype="int8"
    )
    k = jax.random.normal(jax.random.PRNGKey(0), (B, HKV, CTX, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, CTX, D),
                          jnp.bfloat16)
    lens = jnp.full((B,), CTX, jnp.int32)
    cache = paged.paged_quant_prefill(cache, k, v, lens)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, HQ, 1, D),
                          jnp.bfloat16)
    nbytes = sum(
        x.size * x.dtype.itemsize
        for x in (cache.k_pages, cache.v_pages, cache.k_scales,
                  cache.v_scales)
    )
    return cache, q, nbytes


def measure(cache, q, nbytes, fanout, reps=3):
    @jax.jit
    def step(q_, cache_):
        o, _ = paged.paged_quant_decode_attention(
            q_, cache_, SCALE, pages_per_step=fanout)
        return o.astype(jnp.bfloat16)

    roof = nbytes / HBM_BW
    ts = []
    for _ in range(reps):
        dt, _ = trace_device_time(lambda q_: step(q_, cache), q)
        ts.append(dt)
    best = min(ts)
    lab = "native" if paged._INT8_NATIVE_PV else "dequant"
    print(f"  pv={lab:7s} fanout={fanout:2d}: "
          + " ".join(f"{t*1e6:6.1f}" for t in ts)
          + f" us  (best {best*1e6:6.1f}, {roof/best*100:5.1f}% of SoL)")
    return best


def main():
    print(f"device: {jax.devices()[0].device_kind}; paged int8 decode "
          f"B={B} ctx={CTX} pg={PAGE}")
    cache, q, nbytes = build_cache()
    results = {}
    for native in (True, False):
        paged._INT8_NATIVE_PV = native
        for fanout in (4, 8, 16):
            results[(native, fanout)] = measure(cache, q, nbytes, fanout)
    best = min(results, key=results.get)
    print(f"winner: pv={'native' if best[0] else 'dequant'} "
          f"fanout={best[1]} at {results[best]*1e6:.1f} us")


if __name__ == "__main__":
    main()
