"""Model-level serving decode-step latency on the chip (trace-timed).

Measures `models.serve._decode_body` — embed + N transformer layers with
paged attention + LM head over a full lane pool — at a llama-8B-shaped
attention config scaled to fit one v5e (the per-layer cost is what
matters; total = layers x per-layer + head). This is the end-to-end
per-step latency a ServingEngine pays on device, as opposed to
benchmark_decode.py's bare attention kernels.

Methodology (round 3): the step runs as a `lax.scan` of N_INNER
iterations inside ONE jit — steady-state serving, where params stage
once — and is timed by the trace interval UNION (`trace_device_busy`).
Two past pitfalls this avoids, both measured:
  * summing per-op trace durations double-counts async overlap — the
    weight matmuls here run concurrently with `slice-start` weight
    streams whose event duration spans the whole overlap window
    (duration-sum reads 22 ms/step where the while op itself is 4.3 ms);
  * per-call timing pays this harness's tunnel re-staging of the 2.3 GB
    of params every call (single-call union: 7.5 ms vs 4.3 ms steady
    state).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchmark/benchmark_serving.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ring_flash_attn_tpu.models import ModelConfig
from ring_flash_attn_tpu.models.serve import _decode_body
from ring_flash_attn_tpu.models.transformer import init_params
from ring_flash_attn_tpu.ops import paged
from ring_flash_attn_tpu.utils.trace_timing import trace_device_busy

B = 8            # decode lanes
CTX = 8192       # tokens per lane
PAGE = 256
N_INNER = 8      # decode steps per jit call (steady state)


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
    # fill lanes to CTX-64 so appends stay in-bounds across the trace
    k = jax.random.normal(jax.random.PRNGKey(1),
                          (B, cfg.kv_heads, CTX, cfg.head_dim), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), k.shape, jnp.bfloat16)
    lens = jnp.full((B,), CTX - 64, jnp.int32)
    caches = [paged.paged_prefill(c, k, v, lens) for c in caches]
    live = jnp.ones((B,), bool)
    tokens = jnp.arange(B, dtype=jnp.int32)

    # Buffer donation is unavailable through this harness's tunnel
    # (InvalidArgument at execute), so time the read path with
    # append=False: an un-donated append scatter would copy the whole
    # page pool per step and measure that copy instead of the decode. In
    # production the engine's donated step appends in place. Tokens
    # derive from the logits so the content cache cannot skip work.
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

    dt, _by_op = trace_device_busy(step, tokens)
    dt /= N_INNER
    kv_bytes = sum(
        c.k_pages.size + c.v_pages.size for c in caches
    ) * 2  # bf16
    print(f"serving decode step: B={B} lanes, ctx={CTX}, "
          f"{cfg.layers} layers (dim {cfg.dim}, 32q/8kv, D=128), "
          f"scan x{N_INNER} in one jit, interval-union device time")
    print(f"  {dt*1e6:8.1f} us/step on-device "
          f"({B/dt:,.0f} tokens/s aggregate)")
    params_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    roof = (kv_bytes + params_bytes) / 819e9
    print(f"  roofline (KV {kv_bytes/1e9:.1f} GB + params "
          f"{params_bytes/1e9:.1f} GB @ 819 GB/s): {roof*1e6:.1f} us "
          f"({roof/dt*100:.1f}% of memory speed-of-light)")


if __name__ == "__main__":
    main()
