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
from ring_flash_attn_tpu.models.serve import (
    _chunk_prefill_body,
    _decode_body,
    _prefill_fn,
)
from ring_flash_attn_tpu.models.transformer import init_params
from ring_flash_attn_tpu.ops import paged
from ring_flash_attn_tpu.utils.trace_timing import trace_device_busy

B = 8            # decode lanes
CTX = 8192       # tokens per lane
PAGE = 256
N_INNER = 8      # decode steps per jit call (steady state)
CHUNK = 512      # chunked-prefill chunk size


def _prefill_flops(cfg, s):
    """Model-level causal prefill FLOPs (matmuls + attention)."""
    d, h, kv, hd, mlp = (cfg.dim, cfg.heads, cfg.kv_heads, cfg.head_dim,
                         cfg.mlp_dim)
    per_layer = (
        2 * s * d * (h * hd)            # wq
        + 2 * 2 * s * d * (kv * hd)     # wk, wv
        + 2 * s * (h * hd) * d          # wo
        + 3 * 2 * s * d * mlp           # gate, up, down
        + 4 * s * s * h * hd * 0.5      # causal attention
    )
    # lm_head runs on ONE row (the serving path slices x to the sampled
    # position first — all-position logits would add 2*s*d*vocab, ~9% of
    # an 8k Llama-8B prefill)
    return cfg.layers * per_layer + 2 * d * cfg.vocab


def bench_prefill(params, cfg, peak=197e12):
    """Model-level prefill throughput: dense one-shot vs chunked (the
    static-shape path long admissions take). The chunked path's extra
    cost is the per-chunk dense gather of the lane's pages — measured
    here against the same compute roofline."""
    s = CTX
    toks = jax.random.randint(jax.random.PRNGKey(9), (1, s), 0, cfg.vocab,
                              jnp.int32)

    # dense: one padded forward (what a single admission runs today:
    # last_idx slices x to the sampled row before the lm_head); consume
    # the whole (1, 1, vocab) logits (see the DCE note below)
    def dense(t):
        logits, _ks, _vs = _prefill_fn(params, cfg, t, jnp.int32(s - 1))
        return (t + jnp.sum(logits).astype(jnp.int32)) % cfg.vocab

    dt_dense, _ = trace_device_busy(dense, toks, n_iters=4)

    # chunked: all chunks in one jit via scan (the engine runs one chunk
    # per step; the scan measures the same device work back to back)
    pps = s // PAGE
    cache0 = [
        paged.paged_init(1, cfg.kv_heads, pps, PAGE, pps, cfg.head_dim,
                         dtype=jnp.bfloat16)
        for _ in range(cfg.layers)
    ]
    n_chunks = s // CHUNK
    lane = jnp.arange(pps, dtype=jnp.int32)
    wts = jnp.arange(pps, dtype=jnp.int32).reshape(n_chunks, CHUNK // PAGE)
    plens = jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK

    # DCE guards, learned the hard way (the first cut measured an
    # impossible "120% of chip peak"): every chunk's FULL last-layer
    # activation must feed the result (with_logits=False returns its
    # full-reduction checksum — chunks only carry page writes forward, so
    # x is otherwise dead and XLA deletes the non-final chunks' last-layer
    # attention + MLP), and the final logits must be consumed WHOLE (an
    # argmax of one row lets XLA narrow the row-separable lm_head/MLP tail
    # to a single token).
    @partial(jax.jit, static_argnames=("cfg",))
    def chunked(params, cfg, t, caches):
        tc = t.reshape(n_chunks, 1, CHUNK)

        def body(cs, x):
            ck, pl, wt = x
            chk, cs = _chunk_prefill_body(params, cfg, ck, pl, wt, lane,
                                          cs, with_logits=False)
            return cs, chk

        caches, chks = jax.lax.scan(
            body, caches, (tc[:-1], plens[:-1], wts[:-1])
        )
        logits, caches = _chunk_prefill_body(
            params, cfg, tc[-1], plens[-1], wts[-1], lane, caches,
            with_logits=True, last_idx=jnp.int32(CHUNK - 1),
        )
        chk = jnp.sum(chks) + jnp.sum(logits)
        return (t + chk.astype(jnp.int32)) % cfg.vocab

    def chunked_step(t):
        return chunked(params, cfg, t, cache0)

    dt_chunk, _ = trace_device_busy(chunked_step, toks, n_iters=4)

    fl = _prefill_flops(cfg, s)
    print(f"model-level prefill, {s} tokens (dense one-shot vs "
          f"chunked x{n_chunks} @ {CHUNK}):")
    print(f"  dense   {dt_dense*1e3:7.2f} ms  ({s/dt_dense:,.0f} tok/s, "
          f"{fl/dt_dense/peak*100:.1f}% of chip peak)")
    print(f"  chunked {dt_chunk*1e3:7.2f} ms  ({s/dt_chunk:,.0f} tok/s, "
          f"{fl/dt_chunk/peak*100:.1f}% of chip peak; overhead "
          f"{(dt_chunk/dt_dense-1)*100:+.1f}% = per-chunk page gathers)")


def bench_spec_verify(params, cfg, caches):
    """Speculative-decoding verify step (K candidates, multi-query paged
    kernel) vs the plain decode step. Decode is bandwidth-bound, so both
    should cost ~the same — every accepted draft is then a free token."""
    from ring_flash_attn_tpu.models.serve import _spec_verify_body

    K = 4
    live = jnp.ones((B,), bool)

    @partial(jax.jit, static_argnames=("cfg",))
    def plain_scan(params, cfg, toks, caches):
        def body(t, _):
            lg, _ = _decode_body(params, cfg, t, live, caches,
                                 append=False)
            return jnp.argmax(lg, -1).astype(jnp.int32), None

        out, _ = jax.lax.scan(body, toks, None, length=N_INNER)
        return out

    @partial(jax.jit, static_argnames=("cfg",))
    def spec_scan(params, cfg, toks, caches):
        nv = jnp.full((B,), K, jnp.int32)

        def body(t, _):
            lg, _ = _spec_verify_body(params, cfg, t, nv, caches,
                                      append=False)
            return jnp.argmax(lg, -1).astype(jnp.int32), None

        out, _ = jax.lax.scan(body, toks, None, length=N_INNER)
        return out

    t1 = jnp.arange(B, dtype=jnp.int32)
    tk = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (B, 1))
    d_plain, _ = trace_device_busy(
        lambda t: plain_scan(params, cfg, t, caches), t1)
    d_spec, _ = trace_device_busy(
        lambda t: spec_scan(params, cfg, t, caches), tk)
    d_plain /= N_INNER
    d_spec /= N_INNER
    print(f"speculative verify step (K={K} candidates/lane, multi-query "
          f"paged kernel):")
    print(f"  plain decode {d_plain*1e6:7.1f} us -> 1 token/lane;  "
          f"verify {d_spec*1e6:7.1f} us -> up to {K} "
          f"({d_spec/d_plain:.2f}x cost, breakeven at "
          f"{d_spec/d_plain:.2f} accepted tokens/step)")
    return d_plain, d_spec


def bench_speculation_e2e(cost_ratio):
    """End-to-end speculation under a MIXED prefill+decode trace
    (VERDICT r3 item 9): the same staggered workload runs through two
    ServingEngines — speculate_k=None vs 4 — and must produce IDENTICAL
    greedy tokens (acceptance is greedy-prefix, so speculation never
    changes outputs). Reports the measured acceptance rate, tokens per
    decode step, and the net decode speedup once the verify step's
    device cost (`cost_ratio` = verify/plain, trace-measured above) is
    charged.

    The engine loop itself is host-driven and each step pays this
    harness's ~200us tunnel dispatch, so wall-clock through the engine
    would measure the tunnel; steps x trace-measured per-step device cost
    is the honest end-to-end model."""
    from ring_flash_attn_tpu.models.serve import ServingEngine
    from ring_flash_attn_tpu.models.transformer import init_params as ip

    import numpy as np

    cfg = ModelConfig(vocab=61, dim=64, layers=2, heads=4, kv_heads=2,
                      head_dim=16, mlp_dim=128, dtype="float32")
    params = ip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(11)
    motif = rng.integers(0, cfg.vocab, size=6).astype(np.int32)
    prompts = {}
    for rid in range(6):
        if rid % 2 == 0:
            # repetitive prompt: prompt-lookup drafts have n-grams to hit
            body = np.tile(motif, 6)[: 24 + rid]
        else:
            body = rng.integers(0, cfg.vocab, size=20 + rid)
        prompts[rid] = np.asarray(body, np.int32)

    results = {}
    for spec in (None, 4):
        eng = ServingEngine(params, cfg, num_pages=64, page_size=8,
                            pages_per_seq=8, max_batch=4, reserve=1,
                            speculate_k=spec)
        # staggered submissions: half up front, half mid-flight, so
        # chunked prefills interleave with (speculative) decode steps
        for rid in range(3):
            eng.submit(rid, prompts[rid], 24)
        eng.step()
        eng.step()
        for rid in range(3, 6):
            eng.submit(rid, prompts[rid], 24)
        out = eng.run(max_steps=300)
        results[spec] = (out, dict(eng.stats))

    out_plain, st_plain = results[None]
    out_spec, st_spec = results[4]
    assert out_plain == out_spec, "speculation changed greedy outputs!"

    acc = st_spec["spec_accepted"] / max(st_spec["spec_proposed"], 1)
    tps_plain = st_plain["tokens"] / max(st_plain["decode_steps"], 1)
    tps_spec = st_spec["tokens"] / max(st_spec["decode_steps"], 1)
    net = (tps_spec / tps_plain) / cost_ratio
    print("end-to-end speculation, mixed prefill+decode trace "
          "(6 staggered requests, 24 new tokens each; outputs "
          "verified identical to the non-speculative run):")
    print(f"  acceptance rate {acc*100:.1f}% "
          f"({st_spec['spec_accepted']}/{st_spec['spec_proposed']} drafts)")
    print(f"  decode steps {st_plain['decode_steps']} -> "
          f"{st_spec['decode_steps']}; tokens/decode-step "
          f"{tps_plain:.2f} -> {tps_spec:.2f}")
    print(f"  net decode speedup at the measured {cost_ratio:.2f}x "
          f"verify-step cost: {net:.2f}x")


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

    d_plain, d_spec = bench_spec_verify(params, cfg, caches)
    bench_prefill(params, cfg)
    bench_speculation_e2e(cost_ratio=d_spec / d_plain)


if __name__ == "__main__":
    main()
