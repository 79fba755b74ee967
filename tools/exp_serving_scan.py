"""Serving decode step timed as a lax.scan of N steps inside ONE jit.

benchmark_serving.py times one _decode_body per jit call; on this
harness's tunnel each call re-stages the weight matrices from host
(slice-start / copy-start ops at ~17-39 GB/s — PCIe rate, not the
819 GB/s HBM), so the per-call number is an upper bound contaminated by
staging. Scanning N steps inside one jit stages the params once and
amortizes it away: the steady-state per-step device time is
(scan trace time) / N. Tokens feed back through the carry (argmax of the
step's logits) so the content cache cannot skip work and XLA cannot hoist
the matmuls.

Run alone (no concurrent chip jobs).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from functools import partial

from ring_flash_attn_tpu.models import ModelConfig
from ring_flash_attn_tpu.models.serve import _decode_body
from ring_flash_attn_tpu.models.transformer import init_params
from ring_flash_attn_tpu.ops import paged
from ring_flash_attn_tpu.utils.trace_timing import (
    trace_device_busy,
    trace_device_time,
)

B = 8
CTX = 8192
PAGE = 256
N_INNER = 8  # decode steps per jit call


def main():
    cfg = ModelConfig(vocab=32000, dim=4096, layers=4, heads=32, kv_heads=8,
                      head_dim=128, mlp_dim=14336, dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    pps = CTX // PAGE
    caches = [
        paged.paged_init(B, cfg.kv_heads, B * pps, PAGE, pps, cfg.head_dim,
                         dtype=jnp.bfloat16)
        for _ in range(cfg.layers)
    ]
    k = jax.random.normal(jax.random.PRNGKey(1),
                          (B, cfg.kv_heads, CTX, cfg.head_dim), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), k.shape, jnp.bfloat16)
    lens = jnp.full((B,), CTX - 64, jnp.int32)
    caches = [paged.paged_prefill(c, k, v, lens) for c in caches]
    live = jnp.ones((B,), bool)
    tokens = jnp.arange(B, dtype=jnp.int32)

    @partial(jax.jit, static_argnames=("cfg",))
    def scan_steps(params, cfg, toks, live, caches):
        def body(t, _):
            logits, _ = _decode_body(params, cfg, t, live, caches,
                                     append=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), None

        out, _ = jax.lax.scan(body, toks, None, length=N_INNER)
        return out

    def step(toks):
        return scan_steps(params, cfg, toks, live, caches)

    dt_sum, by_op = trace_device_time(step, tokens)
    dt_busy, _ = trace_device_busy(step, tokens)
    per = dt_busy / N_INNER
    print(f"  duration-sum {dt_sum/N_INNER*1e6:.1f} us/step vs interval-"
          f"union {per*1e6:.1f} us/step (async overlap double-counting)")
    kv_bytes = sum(c.k_pages.size + c.v_pages.size for c in caches) * 2
    params_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    roof = (kv_bytes + params_bytes) / 819e9
    print(f"serving decode step (scan x{N_INNER} in one jit): B={B}, "
          f"ctx={CTX}, {cfg.layers} layers (dim {cfg.dim}, 32q/8kv, D=128)")
    print(f"  {per*1e6:8.1f} us/step on-device "
          f"({B/per:,.0f} tokens/s aggregate)")
    print(f"  roofline (KV {kv_bytes/1e9:.1f} GB + params "
          f"{params_bytes/1e9:.1f} GB @ 819 GB/s): {roof*1e6:.1f} us "
          f"({roof/per*100:.1f}% of memory speed-of-light)")
    for op, s in sorted(by_op.items(), key=lambda kv: -kv[1])[:8]:
        print(f"    {s/N_INNER*1e6:8.1f} us  {op[:90]}")

    # single-call (no scan) busy time, for comparison with
    # benchmark_serving.py's duration-sum number
    from ring_flash_attn_tpu.models.serve import _decode_body as body

    one = jax.jit(body, static_argnames=("cfg", "backend", "append"))

    def step1(toks):
        logits, _ = one(params, cfg, toks, live, caches, append=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    b1, _ = trace_device_busy(step1, tokens)
    print(f"  single-call interval-union: {b1*1e6:8.1f} us/step "
          f"({roof/b1*100:.1f}% of memory speed-of-light)")


if __name__ == "__main__":
    main()
