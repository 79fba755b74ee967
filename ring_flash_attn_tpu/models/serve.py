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

__all__ = ["ServingEngine"]


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


def _proj_qkv(cfg, layer, xn, b, s):
    h, hkv, hd = cfg.heads, cfg.kv_heads, cfg.head_dim
    q = (xn @ layer["wq"]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = (xn @ layer["wk"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    v = (xn @ layer["wv"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    return q, k, v


@partial(jax.jit, static_argnames=("cfg", "backend"))
def _prefill_fn(params, cfg: ModelConfig, tokens, backend=None):
    """Dense causal forward over ONE padded prompt (1, Sp). Returns
    (logits (1, Sp, vocab) f32, ks, vs: per-layer (1, Hkv, Sp, hd))."""
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
    x = _rmsnorm(x, params["final_norm"])
    return (x @ params["lm_head"]).astype(jnp.float32), ks, vs


@partial(jax.jit, static_argnames=("cfg", "backend"))
def _prefix_prefill_fn(params, cfg: ModelConfig, tokens, prefix_ks,
                       prefix_vs, backend=None):
    """Suffix-only prefill: dense causal forward over the padded SUFFIX
    (1, S) of a prompt whose first P tokens' K/V are already cached
    (prefix_ks/vs: per-layer (1, Hkv, P, D) gathered from shared pages).
    Suffix queries attend [prefix ++ suffix] with a causal offset of P —
    the compute saved vs _prefill_fn is the whole prefix forward, the
    point of prefix caching. Returns (logits (1, S, vocab), suffix ks,
    vs) — only the suffix K/V need writing to pages."""
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


def _decode_body(params, cfg: ModelConfig, tokens, live, caches,
                 backend=None, append=True):
    """One decode step over all lanes. tokens (B,) int32 pending tokens;
    live (B,) bool; caches: per-layer PagedKVCache whose seq_lens are the
    REWOUND lengths (pending token not yet counted). Returns (logits
    (B, vocab) f32, caches with the pending token's K/V appended).

    append=False skips the K/V page writes (the pending token then does
    not attend to itself) — only for read-path benchmarking where buffer
    donation is unavailable and the un-donated scatter would copy the
    whole page pool per step."""
    b = tokens.shape[0]
    scale = cfg.head_dim**-0.5
    positions = caches[0].seq_lens  # (B,) = pending token's position
    x = params["embed"][tokens][:, None]  # (B, 1, d)
    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        xn = _rmsnorm(x, layer["attn_norm"])
        q, k, v = _proj_qkv(cfg, layer, xn, b, 1)
        q = _rope_batch(q, positions, cfg.rope_theta)
        k = _rope_batch(k, positions, cfg.rope_theta)
        if append:
            cache = paged.paged_append(cache, k, v, mask=live)
        out, _ = paged.paged_decode_attention(q, cache, scale,
                                              backend=backend)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, 1, -1)
        x = x + out @ layer["wo"]
        x = _mlp(x, layer)
        new_caches.append(cache)
    x = _rmsnorm(x, params["final_norm"])
    return (x[:, 0] @ params["lm_head"]).astype(jnp.float32), new_caches


_decode_fn = partial(
    jax.jit, static_argnames=("cfg", "backend", "append"),
    donate_argnums=(4,),
)(_decode_body)


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
                 allocator=None):
        self.params = params
        self.cfg = cfg
        self.backend = backend
        self.alloc = allocator or PageAllocator(num_pages, page_size)
        self.sched = DecodeScheduler(self.alloc, pages_per_seq, max_batch,
                                     reserve=reserve)
        self.max_batch = max_batch
        self.caches = [
            paged.paged_init(
                max_batch, cfg.kv_heads, num_pages, page_size,
                pages_per_seq, cfg.head_dim, dtype=cfg.jdtype,
                block_tables=np.zeros((max_batch, pages_per_seq), np.int32),
            )
            for _ in params["layers"]
        ]
        self._prompts = {}
        self._pending = {}  # req_id -> next token (int) awaiting decode
        self.outputs = {}

    def submit(self, req_id, prompt_tokens, max_new_tokens,
               prefix_of=None):
        """Queue a request. prefix_of: a previously submitted request id
        whose prompt shares a common prefix with this one — the shared
        page-aligned prefix is reused read-only (no page copies) and its
        forward pass is SKIPPED at prefill (automatic prefix caching).
        Best-effort: if the source retired before this request is
        admitted, it prefills normally."""
        prompt_tokens = np.asarray(prompt_tokens, np.int32).reshape(-1)
        self._prompts[req_id] = prompt_tokens
        self.outputs[req_id] = []
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
             max_new_tokens=None):
        """Beam-search fork of a RUNNING request: the new request shares
        the source's pages copy-on-write (device page copies surface in
        the next step's plan) and continues decoding from `next_token`
        (default: the source's own pending token — identical continuation
        unless the sampler diverges). Takes a free lane immediately."""
        assert req_id in self._pending, "can only fork a decoding request"
        r = self.sched.fork(req_id, new_req_id,
                            max_new_tokens=max_new_tokens)
        self._prompts[new_req_id] = self._prompts[req_id]
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

    def _sample(self, logits):
        return int(np.argmax(np.asarray(logits)))

    def _record(self, r, tok):
        self.outputs[r.req_id].append(tok)
        done = r.generated + 1 >= r.max_new_tokens
        self.sched.commit(r.req_id, done=done)
        if done:
            self._pending.pop(r.req_id, None)
        else:
            self._pending[r.req_id] = tok

    def step(self):
        """One scheduler step: COW -> decode pending lanes -> prefill
        admissions. Returns the requests that finished this step."""
        plan = self.sched.begin_step()
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
        lens = plan.seq_lens - live
        self.caches = [
            c._replace(block_tables=jnp.asarray(plan.block_tables),
                       seq_lens=jnp.asarray(lens, jnp.int32))
            for c in self.caches
        ]
        if dec:
            logits, self.caches = _decode_fn(
                self.params, self.cfg, jnp.asarray(tokens),
                jnp.asarray(live), self.caches, backend=self.backend,
            )
            logits = np.asarray(logits)
            for r in dec:
                self._record(r, self._sample(logits[r.lane]))

        # prefill newly admitted prompts (their first token samples from
        # the prompt's last logit; its K/V appends on the next step)
        for r in plan.admitted:
            toks = self._prompts[r.req_id]
            plen = len(toks)
            ps = self.caches[0].page_size
            table = plan.block_tables[r.lane]
            p_shared = r.shared_len  # page-aligned, set at admission
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
                    backend=self.backend,
                )
                self.caches = _prefill_write_fn(
                    self.caches, ks, vs,
                    jnp.asarray(table[n_shared:], jnp.int32),
                )
                self._record(r, self._sample(logits[0, len(suf) - 1]))
            else:
                pad = -plen % ps
                padded = jnp.asarray(np.pad(toks, (0, pad))[None], jnp.int32)
                logits, ks, vs = _prefill_fn(self.params, self.cfg, padded,
                                             backend=self.backend)
                self.caches = _prefill_write_fn(
                    self.caches, ks, vs, jnp.asarray(table, jnp.int32)
                )
                self._record(r, self._sample(logits[0, plen - 1]))

        return plan.finished

    def run(self, max_steps=10_000):
        steps = 0
        while not self.sched.idle:
            steps += 1
            assert steps <= max_steps, "serving loop did not converge"
            self.step()
        return self.outputs
