"""Continuous-batching model serving over the paged KV cache.

The full serving stack, tied together at the model level (an extension —
the reference is a training-side attention library with no serving path):

    ServingEngine
      ├─ serving.DecodeScheduler      lane admission / retirement / COW
      ├─ serving.PageAllocator        native C++ refcounted page pool
      ├─ ops.paged.PagedKVCache       one page pool per layer, shared
      │                               block tables (page ids are global)
      └─ models.transformer           the flagship llama-style model

Static shapes throughout (the TPU contract): a fixed pool of `max_batch`
decode lanes runs ONE decode kernel call per step regardless of which
lanes are live (dead lanes carry seq_len=0 and hit the kernels' dead-row
path), so the jitted step never recompiles as requests come and go.
Prompts pad up to a page multiple; padded positions are written but never
read (reads mask by seq_lens).

Token timeline per request (mirrors tests/test_serving_scheduler.py):
prefill produces the first sampled token from the prompt's last logit;
each decode step embeds the pending token, appends its K/V at position
seq_len-1 (the scheduler's commit already counted it), attends over the
whole lane, and samples the next token.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import paged
from ..ops.flash import flash_attention
from ..ops.mask import MaskArgs
from ..serving import PageAllocator
from ..serving.scheduler import DecodeScheduler
from .transformer import ModelConfig, _mlp, _rmsnorm, _rope

__all__ = ["ServingEngine", "SamplingParams"]


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling policy (host-side — the device step stays
    static and returns full logits rows; vocab * max_batch floats per
    step is trivial host work).

    temperature 0.0 = greedy argmax (the default, and what the token-
    for-token oracle tests pin). Otherwise: logits / temperature, then
    top_k (keep the k highest, 0 = off), then top_p nucleus filtering
    (smallest set of tokens whose probability mass reaches top_p), then
    one categorical draw from a per-request deterministic generator —
    same (seed, request) always yields the same continuation."""

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0

    def sample(self, logits, rng):
        """logits (vocab,) float np array -> int token id."""
        if self.temperature <= 0.0:
            return int(np.argmax(logits))
        logits = logits.astype(np.float64) / self.temperature
        if self.top_k > 0 and self.top_k < logits.shape[0]:
            kth = np.partition(logits, -self.top_k)[-self.top_k]
            logits = np.where(logits < kth, -np.inf, logits)
        if self.top_p < 1.0:
            order = np.argsort(-logits)
            p = np.exp(logits[order] - np.max(logits))
            p /= p.sum()
            keep_sorted = np.cumsum(p) - p < self.top_p  # first always kept
            keep = np.zeros_like(keep_sorted)
            keep[order] = keep_sorted
            logits = np.where(keep, logits, -np.inf)
        p = np.exp(logits - np.max(logits))
        p /= p.sum()
        return int(rng.choice(logits.shape[0], p=p))


def _rope_batch(x, positions, theta):
    """x (B, H, 1, D), positions (B,) int32 — per-lane decode positions."""
    b, h, s, d = x.shape
    assert s == 1, s
    half = d // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[:, None] * freqs[None, :]
    cos = jnp.cos(angles)[:, None, None]  # (B, 1, 1, half)
    sin = jnp.sin(angles)[:, None, None]
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    ).astype(x.dtype)


def _proj_qkv(cfg, layer, xn, b, s, tp=1):
    """tp > 1: wq/wk/wv are column shards — this shard owns heads/tp
    query heads and kv_heads/tp KV heads (megatron TP, the convention of
    transformer.param_specs)."""
    h, hkv, hd = cfg.heads // tp, cfg.kv_heads // tp, cfg.head_dim
    q = (xn @ layer["wq"]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = (xn @ layer["wk"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    v = (xn @ layer["wv"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    return q, k, v


@partial(jax.jit, static_argnames=("cfg", "backend"))
def _prefill_fn(params, cfg: ModelConfig, tokens, last_idx=None,
                backend=None):
    """Dense causal forward over ONE padded prompt (1, Sp). Returns
    (logits, ks, vs: per-layer (1, Hkv, Sp, hd)).

    last_idx (traced int32 scalar or None): a prefill only ever samples
    from ONE position (the prompt's last real token), so when given, x is
    sliced to that row BEFORE the lm_head — logits come back (1, 1,
    vocab) and the (Sp, dim) x (dim, vocab) matmul (~9% of an 8k Llama-8B
    prefill's FLOPs, plus a ~1 GB f32 logits write) collapses to one row.
    None returns all positions (teacher forcing / scoring)."""
    b, s = tokens.shape
    positions = jnp.arange(s, dtype=jnp.int32)
    scale = cfg.head_dim**-0.5
    x = params["embed"][tokens]
    ks, vs = [], []
    for layer in params["layers"]:
        xn = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _proj_qkv(cfg, layer, xn, b, s)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        out, _ = flash_attention(
            q, k, v, scale, MaskArgs(causal=True), backend=backend
        )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s, -1)
        x = x + out @ layer["wo"]
        x = _mlp(x, layer)
        ks.append(k)
        vs.append(v)
    if last_idx is not None:
        x = jax.lax.dynamic_slice_in_dim(x, last_idx, 1, axis=1)
    x = _rmsnorm(x, params["final_norm"])
    return (x @ params["lm_head"]).astype(jnp.float32), ks, vs


@partial(jax.jit, static_argnames=("cfg", "backend"))
def _prefix_prefill_fn(params, cfg: ModelConfig, tokens, prefix_ks,
                       prefix_vs, last_idx=None, backend=None):
    """Suffix-only prefill: dense causal forward over the padded SUFFIX
    (1, S) of a prompt whose first P tokens' K/V are already cached
    (prefix_ks/vs: per-layer (1, Hkv, P, D) gathered from shared pages).
    Suffix queries attend [prefix ++ suffix] with a causal offset of P —
    the compute saved vs _prefill_fn is the whole prefix forward, the
    point of prefix caching. Returns (logits (1, S, vocab) — or (1, 1,
    vocab) for the given last_idx row, see _prefill_fn — and the suffix
    ks, vs: only the suffix K/V need writing to pages."""
    b, s = tokens.shape
    p_len = prefix_ks[0].shape[2]
    positions = p_len + jnp.arange(s, dtype=jnp.int32)
    scale = cfg.head_dim**-0.5
    x = params["embed"][tokens]
    ks, vs = [], []
    for layer, pk, pv in zip(params["layers"], prefix_ks, prefix_vs):
        xn = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _proj_qkv(cfg, layer, xn, b, s)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        k_all = jnp.concatenate([pk.astype(k.dtype), k], axis=2)
        v_all = jnp.concatenate([pv.astype(v.dtype), v], axis=2)
        out, _ = flash_attention(
            q, k_all, v_all, scale, MaskArgs(causal=True, offset=p_len),
            backend=backend,
        )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s, -1)
        x = x + out @ layer["wo"]
        x = _mlp(x, layer)
        ks.append(k)
        vs.append(v)
    if last_idx is not None:
        x = jax.lax.dynamic_slice_in_dim(x, last_idx, 1, axis=1)
    x = _rmsnorm(x, params["final_norm"])
    return (x @ params["lm_head"]).astype(jnp.float32), ks, vs


@partial(jax.jit, donate_argnums=(0,))
def _prefill_write_fn(caches, ks, vs, lane_table):
    """Scatter one prompt's per-layer K/V into its lane's pages. Donating
    the caches lets XLA write the page pools in place — an eager
    `pages.at[bt].set` would copy the whole (num_pages, hkv*ps, d) pool
    per layer per admission."""
    new = []
    lens = jnp.zeros((1,), jnp.int32)  # seq_lens are plan-owned
    for cache, k, v in zip(caches, ks, vs):
        one = cache._replace(block_tables=lane_table[None], seq_lens=lens)
        one = paged.paged_prefill(one, k, v, lens)
        new.append(
            cache._replace(k_pages=one.k_pages, v_pages=one.v_pages)
        )
    return new


def _chunk_prefill_body(params, cfg: ModelConfig, tokens, p_len,
                        write_table, lane_table, caches, with_logits=True,
                        backend=None, last_idx=None):
    """One CHUNK of a chunked prefill: forward `tokens` (1, C) — the
    prompt's tokens at positions [p_len, p_len + C) — writing each
    layer's chunk K/V into the lane's pages and attending over ALL of the
    lane's pages so far (prefix-cached pages included, with no separate
    gather path: they are simply earlier entries of the same table).

    Static shapes regardless of prompt length or progress — C, the write
    table width C/page_size, and the gathered context (pages_per_seq *
    page_size) are all fixed, so the whole prefill of any prompt compiles
    exactly twice (with_logits False/True). This is the vLLM-style
    chunked prefill that lets long-prompt admissions interleave with
    decode steps instead of stalling the lane pool (the dense
    `_prefill_fn` recompiles per padded prompt length and runs the whole
    prompt in one step).

    p_len: traced int32 scalar, page-aligned chunk start. write_table
    (C/page_size,) int32: the REAL page ids for this chunk's span, padded
    with num_pages past the prompt's allocation (paged_prefill drops
    out-of-range writes — the padded tail of the final chunk). lane_table
    (pages_per_seq,) int32: the lane's full (read) table. Attention mask:
    causal with traced offset p_len — gathered kv index j is attended iff
    j <= p_len + row, which covers the previously-written prefix
    (j < p_len) plus the in-chunk causal triangle; positions past the
    chunk (garbage pages) are never attended. Returns (logits (1, C,
    vocab) or None, caches)."""
    b, c = tokens.shape
    scale = cfg.head_dim**-0.5
    positions = p_len + jnp.arange(c, dtype=jnp.int32)
    x = params["embed"][tokens]
    new_caches = []
    zero = jnp.zeros((1,), jnp.int32)
    for layer, cache in zip(params["layers"], caches):
        xn = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _proj_qkv(cfg, layer, xn, b, c)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        w = cache._replace(block_tables=write_table[None], seq_lens=zero)
        w = paged.paged_prefill(w, k, v, zero)
        cache = cache._replace(k_pages=w.k_pages, v_pages=w.v_pages)
        kd, vd = paged.paged_gather_dense(
            cache._replace(block_tables=lane_table[None])
        )
        out, _ = flash_attention(
            q, kd, vd, scale, MaskArgs(causal=True, offset=p_len),
            backend=backend,
        )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, c, -1)
        x = x + out @ layer["wo"]
        x = _mlp(x, layer)
        new_caches.append(cache)
    if not with_logits:
        # benchmark DCE guard: x is otherwise dead without logits (each
        # chunk re-embeds; only the page writes carry forward), which
        # would let XLA delete every non-final chunk's last-layer
        # attention + MLP — return its full-reduction checksum instead
        return jnp.sum(x.astype(jnp.float32)), new_caches
    if last_idx is not None:
        # only one row is ever sampled (see _prefill_fn)
        x = jax.lax.dynamic_slice_in_dim(x, last_idx, 1, axis=1)
    x = _rmsnorm(x, params["final_norm"])
    return (x @ params["lm_head"]).astype(jnp.float32), new_caches


_chunk_prefill_fn = partial(
    jax.jit, static_argnames=("cfg", "with_logits", "backend"),
    donate_argnums=(6,),
)(_chunk_prefill_body)


def _decode_body(params, cfg: ModelConfig, tokens, live, caches,
                 backend=None, append=True, tp_axis=None):
    """One decode step over all lanes. tokens (B,) int32 pending tokens;
    live (B,) bool; caches: per-layer PagedKVCache whose seq_lens are the
    REWOUND lengths (pending token not yet counted). Returns (logits
    (B, vocab) f32, caches with the pending token's K/V appended).

    append=False skips the K/V page writes (the pending token then does
    not attend to itself) — only for read-path benchmarking where buffer
    donation is unavailable and the un-donated scatter would copy the
    whole page pool per step.

    tp_axis: run TENSOR-PARALLEL inside shard_map over that mesh axis —
    distributed serving for models too large for one chip. Weights follow
    `transformer.param_specs` (wq/wk/wv/gate/up column-sharded, wo/down
    row-sharded with one psum each, embed/norms/lm_head replicated);
    caches shard on the KV-head axis (k_pages/v_pages PartitionSpec
    (None, tp, None, None)), so each shard appends and attends only its
    kv_heads/tp heads — the page pool and block tables replicate, the KV
    bytes split tp ways. One psum per layer's attention output + one per
    MLP; logits come out replicated."""
    from jax import lax

    b = tokens.shape[0]
    tp = 1 if tp_axis is None else lax.psum(1, tp_axis)
    scale = cfg.head_dim**-0.5
    positions = caches[0].seq_lens  # (B,) = pending token's position
    x = params["embed"][tokens][:, None]  # (B, 1, d)
    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        xn = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _proj_qkv(cfg, layer, xn, b, 1, tp=tp)
        q = _rope_batch(q, positions, cfg.rope_theta)
        k = _rope_batch(k, positions, cfg.rope_theta)
        if append:
            cache = paged.paged_append(cache, k, v, mask=live)
        out, _ = paged.paged_decode_attention(q, cache, scale,
                                              backend=backend)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, 1, -1)
        proj = out @ layer["wo"]
        if tp_axis is not None:
            proj = lax.psum(proj, tp_axis)  # row-sharded wo partials
        x = x + proj
        x = _mlp(x, layer, tp_axis=tp_axis)
        new_caches.append(cache)
    x = _rmsnorm(x, params["final_norm"])
    return (x[:, 0] @ params["lm_head"]).astype(jnp.float32), new_caches


_decode_fn = partial(
    jax.jit, static_argnames=("cfg", "backend", "append"),
    donate_argnums=(4,),
)(_decode_body)


def _rope_rows(x, positions, theta):
    """x (B, H, K, D), positions (B, K) int32 — per-lane, per-row decode
    positions (the multi-token generalization of _rope_batch)."""
    b, h, kk, d = x.shape
    half = d // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[:, :, None] * freqs  # (B,K,half)
    cos = jnp.cos(angles)[:, None]  # (B, 1, K, half)
    sin = jnp.sin(angles)[:, None]
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    ).astype(x.dtype)


def _spec_verify_body(params, cfg: ModelConfig, tokens, n_valid, caches,
                      backend=None, append=True):
    """Speculative-decoding verification: one forward over K candidate
    tokens per lane — tokens[:, 0] is each lane's pending token, tokens
    [:, 1:] are draft proposals (prompt-lookup n-grams, host-side).
    Decode is bandwidth-bound, so verifying K tokens reads the weights
    and KV once — the same traffic as ONE decode step — which is the
    entire speedup of speculation.

    tokens (B, K) int32; n_valid (B,) int32 in [0, K] (0 = idle lane;
    rows past n_valid are padding); caches' seq_lens are the REWOUND
    lengths. All K candidate K/V are appended (positions lens..lens+K-1
    — the caller guarantees those slots sit in already-allocated pages
    and rewinds the allocator to the accepted count; stale slots are
    overwritten by later appends at the same positions). Attention is
    the MULTI-QUERY paged decode kernel (paged_decode_attention with
    new_counts=: row i attends kv index j <= lens[b] + i), so the verify
    step streams the page pool once exactly like a plain decode step —
    an earlier dense-gather XLA formulation tripled the KV traffic and
    cost 3.35x a plain step; the kernel path is ~1.1x. Returns (logits
    (B, K, vocab) f32, caches with seq_lens advanced by n_valid)."""
    b, kk = tokens.shape
    scale = cfg.head_dim**-0.5
    lens0 = caches[0].seq_lens  # (B,) pre-append lengths
    positions = lens0[:, None] + jnp.arange(kk, dtype=jnp.int32)[None]
    x = params["embed"][tokens]  # (B, K, d)
    row_ids = jnp.arange(kk, dtype=jnp.int32)[None]  # (1, K)
    valid = row_ids < n_valid[:, None]  # (B, K)
    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        xn = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _proj_qkv(cfg, layer, xn, b, kk)
        q = _rope_rows(q, positions, cfg.rope_theta)
        k = _rope_rows(k, positions, cfg.rope_theta)
        # append=False: read-path benchmarking only, exactly as
        # _decode_body (un-donated appends copy the page pools; the
        # engine's donated call appends in place). The candidates then
        # don't attend themselves/each other.
        if append:
            for i in range(kk):
                cache = paged.paged_append(
                    cache, k[:, :, i:i + 1], v[:, :, i:i + 1],
                    mask=valid[:, i],
                )
        out, _ = paged.paged_decode_attention(
            q, cache, scale, backend=backend, new_counts=n_valid,
        )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, kk, -1)
        x = x + out @ layer["wo"]
        x = _mlp(x, layer)
        new_caches.append(cache)
    x = _rmsnorm(x, params["final_norm"])
    return (x @ params["lm_head"]).astype(jnp.float32), new_caches


_spec_verify_fn = partial(
    jax.jit, static_argnames=("cfg", "backend", "append"),
    donate_argnums=(4,),
)(_spec_verify_body)


def _prompt_lookup(context, k_draft, max_ngram=3):
    """Prompt-lookup decoding proposals (assisted generation without a
    draft model): find the most recent earlier occurrence of the
    context's final n-gram (longest n first) and propose the tokens that
    followed it. Returns an np array of up to k_draft proposals (may be
    empty)."""
    ctx = np.asarray(context, np.int32)
    t = len(ctx)
    for n in range(min(max_ngram, t - 1), 0, -1):
        tail = ctx[t - n:]
        # most recent match strictly before the final n-gram itself
        for start in range(t - n - 1, -1, -1):
            if np.array_equal(ctx[start:start + n], tail):
                fol = ctx[start + n:start + n + k_draft]
                if len(fol):
                    return fol
    return np.zeros((0,), np.int32)


class ServingEngine:
    """Continuous-batching greedy-decoding server for the flagship model.

    >>> eng = ServingEngine(params, cfg, num_pages=64, page_size=16,
    ...                     pages_per_seq=8, max_batch=4)
    >>> eng.submit(0, prompt_tokens, max_new_tokens=12)
    >>> outputs = eng.run()   # {0: [tok, tok, ...]}

    submit() may be called between step()s — requests queue FIFO and are
    admitted as lanes and pages free up (the "continuous" part).
    """

    def __init__(self, params, cfg: ModelConfig, num_pages, page_size,
                 pages_per_seq, max_batch, reserve=1, backend=None,
                 allocator=None, prefill_chunk=None, mesh=None,
                 speculate_k=None):
        """prefill_chunk: if set (a page_size multiple), prompts prefill
        CHUNK tokens per engine step through `_chunk_prefill_body` —
        static shapes (two compiles total, vs one per padded prompt
        length for the dense path) and decode steps interleave with long
        prefills instead of waiting behind them. None = dense one-shot
        prefill (the default; bit-identical outputs either way).

        mesh: a jax.sharding.Mesh with a "tp" axis — the whole engine
        then runs tensor-parallel via GSPMD sharding propagation: params
        are placed per `transformer.param_specs` (megatron column/row
        sharding) and the page pools shard on the KV-head axis, so every
        jitted step (prefill, chunked prefill, decode, page writes) is
        partitioned automatically with no model-code changes. This is
        the jit-native complement to the explicit shard_map TP decode
        step (`_decode_body(tp_axis=...)`, tests/test_serve_tp.py);
        outputs match the unsharded engine up to tp-reduction
        ordering.

        speculate_k: if > 1, decode steps run SPECULATIVELY for greedy
        (temperature=0) requests: up to k-1 draft tokens proposed by
        prompt-lookup (the request's own context, no draft model) are
        verified alongside the pending token in ONE forward
        (`_spec_verify_body`) — bandwidth-bound decode reads weights+KV
        once either way, so every accepted draft is a free extra token.
        Exactly greedy-equivalent by construction (the acid test in
        tests/test_serve_spec.py); sampled (temperature>0) requests fall
        back to one token per step."""
        self.params = params
        self.cfg = cfg
        self.speculate_k = speculate_k
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .transformer import param_specs

            assert cfg.kv_heads % mesh.shape["tp"] == 0, (
                cfg.kv_heads, dict(mesh.shape))
            ns = lambda spec: NamedSharding(mesh, spec)  # noqa: E731
            self.params = jax.tree.map(
                lambda x, s: jax.device_put(x, ns(s)), params,
                param_specs(cfg, "tp"),
            )
            self._page_sharding = ns(P(None, "tp", None, None))
        else:
            self._page_sharding = None
        self.backend = backend
        self.alloc = allocator or PageAllocator(num_pages, page_size)
        self.sched = DecodeScheduler(self.alloc, pages_per_seq, max_batch,
                                     reserve=reserve)
        self.max_batch = max_batch
        if prefill_chunk is not None:
            assert prefill_chunk > 0 and prefill_chunk % page_size == 0, (
                prefill_chunk, page_size)
        self.prefill_chunk = prefill_chunk
        self.num_pages = num_pages
        self.caches = [
            paged.paged_init(
                max_batch, cfg.kv_heads, num_pages, page_size,
                pages_per_seq, cfg.head_dim, dtype=cfg.jdtype,
                block_tables=np.zeros((max_batch, pages_per_seq), np.int32),
            )
            for _ in params["layers"]
        ]
        if self._page_sharding is not None:
            self.caches = [
                c._replace(
                    k_pages=jax.device_put(c.k_pages, self._page_sharding),
                    v_pages=jax.device_put(c.v_pages, self._page_sharding),
                )
                for c in self.caches
            ]
        self._prompts = {}
        self._pending = {}  # req_id -> next token (int) awaiting decode
        self._prefilling = {}  # req_id -> chunked-prefill progress dict
        self._sampling = {}  # req_id -> (SamplingParams, np Generator)
        self._eos = {}  # req_id -> frozenset of stop-token ids
        self.outputs = {}
        # operational counters (observability): tokens = every recorded
        # token; spec_* track draft proposals vs acceptances — the
        # acceptance rate is THE speculation health metric (the verify
        # step costs ~1 plain step, so tokens/step ~= 1 + rate * (k-1))
        self.stats = {
            "steps": 0, "decode_steps": 0, "prefills": 0,
            "prefill_chunks": 0, "tokens": 0,
            "spec_proposed": 0, "spec_accepted": 0,
        }

    @property
    def spec_acceptance_rate(self):
        p = self.stats["spec_proposed"]
        return self.stats["spec_accepted"] / p if p else 0.0

    def submit(self, req_id, prompt_tokens, max_new_tokens,
               prefix_of=None, sampling=None, eos_token_id=None):
        """Queue a request. prefix_of: a previously submitted request id
        whose prompt shares a common prefix with this one — the shared
        page-aligned prefix is reused read-only (no page copies) and its
        forward pass is SKIPPED at prefill (automatic prefix caching).
        Best-effort: if the source retired before this request is
        admitted, it prefills normally. sampling: a SamplingParams
        (default greedy). eos_token_id: int or set of ints — generating
        any of them finishes the request early (the stop token IS
        recorded in the output, HF-style); max_new_tokens stays the hard
        cap."""
        prompt_tokens = np.asarray(prompt_tokens, np.int32).reshape(-1)
        self._prompts[req_id] = prompt_tokens
        self.outputs[req_id] = []
        if eos_token_id is None:
            self._eos[req_id] = frozenset()
        elif isinstance(eos_token_id, (int, np.integer)):
            self._eos[req_id] = frozenset([int(eos_token_id)])
        else:
            self._eos[req_id] = frozenset(int(t) for t in eos_token_id)
        sp = sampling or SamplingParams()
        self._sampling[req_id] = (sp, np.random.default_rng(sp.seed))
        prefix_len = 0
        if prefix_of is not None:
            src = self._prompts[prefix_of]
            n = min(len(src), len(prompt_tokens))
            neq = np.nonzero(src[:n] != prompt_tokens[:n])[0]
            prefix_len = int(neq[0]) if len(neq) else n
            # at least one suffix token must run (it produces the
            # first sampled token's logits)
            prefix_len = min(prefix_len, len(prompt_tokens) - 1)
        self.sched.submit(req_id, len(prompt_tokens), max_new_tokens,
                          prefix_of=prefix_of, prefix_len=prefix_len)

    def fork(self, req_id, new_req_id, next_token=None,
             max_new_tokens=None, sampling=None):
        """Beam-search fork of a RUNNING request: the new request shares
        the source's pages copy-on-write (device page copies surface in
        the next step's plan) and continues decoding from `next_token`
        (default: the source's own pending token — identical continuation
        unless the sampler diverges). Takes a free lane immediately.
        sampling: SamplingParams for the fork (default: the source's
        policy with a fork-specific generator, so stochastic branches
        diverge deterministically)."""
        assert req_id in self._pending, "can only fork a decoding request"
        r = self.sched.fork(req_id, new_req_id,
                            max_new_tokens=max_new_tokens)
        self._prompts[new_req_id] = self._prompts[req_id]
        sp = sampling or self._sampling[req_id][0]
        self._sampling[new_req_id] = (
            sp,
            np.random.default_rng([sp.seed, abs(hash(new_req_id))]),
        )
        self._eos[new_req_id] = self._eos.get(req_id, frozenset())
        # the source's last recorded token IS its pending (not-yet-decoded)
        # one; a diverging fork replaces it with the alternative
        out = list(self.outputs[req_id])
        if next_token is not None:
            out[-1] = int(next_token)
            self._pending[new_req_id] = int(next_token)
        else:
            self._pending[new_req_id] = self._pending[req_id]
        self.outputs[new_req_id] = out
        return r

    def _sample(self, req_id, logits):
        sp, rng = self._sampling[req_id]
        return sp.sample(np.asarray(logits), rng)

    def _spec_decode(self, dec, plan):
        """One speculative decode step for the pending lanes: propose,
        verify in one forward, accept the longest agreeing prefix."""
        kk = self.speculate_k
        ps = self.caches[0].page_size
        tokens = np.zeros((self.max_batch, kk), np.int32)
        n_valid = np.zeros((self.max_batch,), np.int32)
        for r in dec:
            tokens[r.lane, 0] = self._pending[r.req_id]
            # the pending token is the last element of outputs, so the
            # lookup context is exactly everything decoded so far
            ctx = np.concatenate([
                self._prompts[r.req_id],
                np.asarray(self.outputs[r.req_id], np.int32),
            ])
            sp, _ = self._sampling[r.req_id]
            props = (_prompt_lookup(ctx, kk - 1)
                     if sp.temperature <= 0.0 else np.zeros(0, np.int32))
            # candidate K/V land at positions L-1 .. L-1+n-1; they must
            # stay inside the allocator's already-reserved pages (the
            # padded block-table tail aliases a live page), and the new
            # tokens must fit the request's remaining budget
            length = int(plan.seq_lens[r.lane])  # includes the pending
            max_pages = -(-length // ps) * ps - (length - 1)
            budget = r.max_new_tokens - r.generated
            n = max(1, min(kk, 1 + len(props), max_pages, budget))
            tokens[r.lane, 1:n] = props[:n - 1]
            n_valid[r.lane] = n
        logits, self.caches = _spec_verify_fn(
            self.params, self.cfg, jnp.asarray(tokens),
            jnp.asarray(n_valid), self.caches, backend=self.backend,
        )
        logits = np.asarray(logits)
        for r in dec:
            n = int(n_valid[r.lane])
            accepted = []
            for i in range(n):
                g = self._sample(r.req_id, logits[r.lane, i])
                accepted.append(g)
                # row i+1's context is valid only if draft i+1 matched
                if i + 1 < n and tokens[r.lane, i + 1] != g:
                    break
            self.stats["spec_proposed"] += n - 1
            self.stats["spec_accepted"] += len(accepted) - 1
            for tok in accepted:
                if r.done:
                    break  # capacity truncation mid-acceptance
                self._record(r, tok)

    def _record(self, r, tok):
        self.stats["tokens"] += 1
        self.outputs[r.req_id].append(tok)
        done = (r.generated + 1 >= r.max_new_tokens
                or tok in self._eos.get(r.req_id, ()))
        self.sched.commit(r.req_id, done=done)
        if done:
            self._pending.pop(r.req_id, None)
            self._sampling.pop(r.req_id, None)
        else:
            self._pending[r.req_id] = tok

    def step(self):
        """One scheduler step: COW -> decode pending lanes -> prefill
        admissions. Returns the requests that finished this step."""
        plan = self.sched.begin_step()
        self.stats["steps"] += 1
        if len(plan.cow[0]):
            self.caches = [
                paged.copy_pages(c, plan.cow[0], plan.cow[1])
                for c in self.caches
            ]

        # decode every lane with a pending token (plan.seq_lens already
        # counts it — rewind so paged_append writes it at lens-1)
        dec = [r for r in plan.running if r.req_id in self._pending]
        live = np.zeros((self.max_batch,), bool)
        tokens = np.zeros((self.max_batch,), np.int32)
        for r in dec:
            live[r.lane] = True
            tokens[r.lane] = self._pending[r.req_id]
        # rewind live lanes (the pending token is appended at lens-1);
        # zero lanes with nothing to decode (dead, or mid-chunked-prefill)
        # so the decode kernel skips their context entirely
        lens = np.where(live, plan.seq_lens - 1, 0)
        self.caches = [
            c._replace(block_tables=jnp.asarray(plan.block_tables),
                       seq_lens=jnp.asarray(lens, jnp.int32))
            for c in self.caches
        ]
        if dec:
            self.stats["decode_steps"] += 1
        if dec and self.speculate_k and self.speculate_k > 1:
            self._spec_decode(dec, plan)
        elif dec:
            logits, self.caches = _decode_fn(
                self.params, self.cfg, jnp.asarray(tokens),
                jnp.asarray(live), self.caches, backend=self.backend,
            )
            logits = np.asarray(logits)
            for r in dec:
                self._record(r, self._sample(r.req_id, logits[r.lane]))

        # prefill newly admitted prompts (their first token samples from
        # the prompt's last logit; its K/V appends on the next step)
        for r in plan.admitted:
            self.stats["prefills"] += 1
            toks = self._prompts[r.req_id]
            plen = len(toks)
            ps = self.caches[0].page_size
            table = plan.block_tables[r.lane]
            p_shared = r.shared_len  # page-aligned, set at admission
            if self.prefill_chunk is not None:
                # chunked: queue the suffix; chunks advance below, one per
                # step, interleaved with other lanes' decodes. Prefix-
                # cached pages need no gather — they are earlier entries
                # of the same lane table the chunk attention reads.
                c = self.prefill_chunk
                suf = toks[p_shared:]
                padded = np.pad(suf, (0, -len(suf) % c))
                self._prefilling[r.req_id] = {
                    "req": r, "tokens": padded, "p0": p_shared,
                    "next": 0, "plen": plen,
                }
                continue
            if p_shared:
                # prefix caching: gather the shared pages' K/V read-only
                # and forward only the suffix
                n_shared = p_shared // ps
                view_bt = jnp.asarray(table[None, :n_shared], jnp.int32)
                pks, pvs = [], []
                for cache in self.caches:
                    k_pre, v_pre = paged.paged_gather_dense(
                        cache._replace(
                            block_tables=view_bt,
                            seq_lens=jnp.asarray([p_shared], jnp.int32),
                        )
                    )
                    pks.append(k_pre)
                    pvs.append(v_pre)
                suf = toks[p_shared:]
                pad = -len(suf) % ps
                padded = jnp.asarray(np.pad(suf, (0, pad))[None], jnp.int32)
                logits, ks, vs = _prefix_prefill_fn(
                    self.params, self.cfg, padded, tuple(pks), tuple(pvs),
                    jnp.int32(len(suf) - 1), backend=self.backend,
                )
                self.caches = _prefill_write_fn(
                    self.caches, ks, vs,
                    jnp.asarray(table[n_shared:], jnp.int32),
                )
                self._record(r, self._sample(r.req_id, logits[0, 0]))
            else:
                pad = -plen % ps
                padded = jnp.asarray(np.pad(toks, (0, pad))[None], jnp.int32)
                logits, ks, vs = _prefill_fn(self.params, self.cfg, padded,
                                             jnp.int32(plen - 1),
                                             backend=self.backend)
                self.caches = _prefill_write_fn(
                    self.caches, ks, vs, jnp.asarray(table, jnp.int32)
                )
                self._record(r, self._sample(r.req_id, logits[0, 0]))

        # advance chunked prefills: one chunk per request per step
        for req_id in list(self._prefilling):
            self.stats["prefill_chunks"] += 1
            st = self._prefilling[req_id]
            r = st["req"]
            c = self.prefill_chunk
            ps = self.caches[0].page_size
            j = st["next"]
            p_len = st["p0"] + j * c
            last = (j + 1) * c >= len(st["tokens"])
            chunk = st["tokens"][j * c:(j + 1) * c]
            # real page ids for this chunk's span; pad past the prompt's
            # allocation with num_pages (paged_prefill drops those writes)
            pages = self.alloc.block_table(r.seq)
            i0 = p_len // ps
            wt = np.full((c // ps,), self.num_pages, np.int32)
            avail = pages[i0:i0 + c // ps]
            wt[:len(avail)] = avail
            lane_table = np.zeros((self.caches[0].block_tables.shape[1],),
                                  np.int32)
            lane_table[:len(pages)] = pages
            idx = (st["plen"] - st["p0"] - 1) - j * c
            logits, self.caches = _chunk_prefill_fn(
                self.params, self.cfg, jnp.asarray(chunk[None]),
                jnp.int32(p_len), jnp.asarray(wt), jnp.asarray(lane_table),
                self.caches, with_logits=last, backend=self.backend,
                last_idx=jnp.int32(idx) if last else None,
            )
            st["next"] += 1
            if last:
                del self._prefilling[req_id]
                self._record(
                    r, self._sample(req_id, np.asarray(logits)[0, 0])
                )

        return plan.finished

    def run(self, max_steps=10_000):
        steps = 0
        while not self.sched.idle:
            steps += 1
            assert steps <= max_steps, "serving loop did not converge"
            self.step()
        return self.outputs
