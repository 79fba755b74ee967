"""Model-level continuous-batching serving engine (models/serve.py) vs a
dense greedy-decoding oracle: the full stack — scheduler admissions under a
tight page pool, paged prefill, masked decode appends, retirement — must
reproduce, token for token, what running the dense model over the growing
sequence produces per request."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ring_flash_attn_tpu.models import ModelConfig
from ring_flash_attn_tpu.models.serve import ServingEngine
from ring_flash_attn_tpu.models.transformer import forward, init_params

CFG = ModelConfig(
    vocab=61, dim=32, layers=2, heads=4, kv_heads=2, head_dim=16,
    mlp_dim=64, dtype="float32",
)


def _dense_greedy(params, prompt, n_new):
    """Oracle: feed the whole growing sequence through the dense forward
    each step, greedy-pick the last logit."""
    toks = list(np.asarray(prompt, np.int32))
    out = []
    for _ in range(n_new):
        t = jnp.asarray(toks, jnp.int32)[None]
        logits = forward(
            params, CFG, t, jnp.arange(len(toks), dtype=jnp.int32)
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)
    return out


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def test_serving_engine_matches_dense_greedy(params):
    rng = np.random.default_rng(3)
    # tight pool (20 pages, 2 lanes) so requests queue and lanes turn over
    eng = ServingEngine(params, CFG, num_pages=20, page_size=8,
                        pages_per_seq=6, max_batch=2, reserve=1)
    specs = {0: (11, 3), 1: (19, 6), 2: (5, 4), 3: (30, 2)}
    prompts = {
        rid: rng.integers(0, CFG.vocab, size=plen).astype(np.int32)
        for rid, (plen, _new) in specs.items()
    }
    for rid, (_plen, new) in specs.items():
        eng.submit(rid, prompts[rid], new)

    outputs = eng.run(max_steps=60)

    for rid, (_plen, new) in specs.items():
        want = _dense_greedy(params, prompts[rid], new)
        assert outputs[rid] == want, (rid, outputs[rid], want)


def test_submit_mid_flight(params):
    """The continuous part: a request submitted while others are decoding
    is admitted without draining and still decodes correctly."""
    eng = ServingEngine(params, CFG, num_pages=32, page_size=8,
                        pages_per_seq=6, max_batch=2, reserve=1)
    rng = np.random.default_rng(5)
    p0 = rng.integers(0, CFG.vocab, size=9).astype(np.int32)
    p1 = rng.integers(0, CFG.vocab, size=13).astype(np.int32)
    eng.submit(0, p0, 5)
    eng.step()  # admits + prefills request 0
    eng.step()  # first decode step for request 0
    eng.submit(1, p1, 3)
    out = eng.run(max_steps=40)
    assert out[0] == _dense_greedy(params, p0, 5)
    assert out[1] == _dense_greedy(params, p1, 3)


def test_fork_beam_divergence(params):
    """COW fork at the model level: fork a mid-flight request with a
    forced alternative token; the fork must continue exactly as a dense
    run of (prompt ++ generated-so-far with the alternative), and the
    source must be unaffected by the fork touching shared pages."""
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, CFG.vocab, size=10).astype(np.int32)
    eng = ServingEngine(params, CFG, num_pages=40, page_size=8,
                        pages_per_seq=6, max_batch=3, reserve=1)
    eng.submit(0, prompt, 6)
    eng.step()   # prefill: first token sampled
    eng.step()   # decode 1
    eng.step()   # decode 2 -> outputs[0] has 3 tokens, last one pending
    base = list(eng.outputs[0])
    assert len(base) == 3
    alt = int((base[-1] + 1) % CFG.vocab)  # force divergence
    eng.fork(0, 1, next_token=alt, max_new_tokens=6)
    out = eng.run(max_steps=40)

    want_src = _dense_greedy(params, prompt, 6)
    assert out[0] == want_src

    # the fork replays: greedy from (prompt ++ first 2 tokens ++ alt)
    forced = list(np.concatenate([prompt, base[:2], [alt]]))
    want_fork = base[:2] + [alt] + _dense_greedy(params, forced, 3)
    assert out[1] == want_fork, (out[1], want_fork)


def test_fork_at_page_aligned_length(params):
    """Regression: fork when (prompt + generated) is exactly page-aligned —
    the pending token's slot is the tail page's LAST slot, which both
    branches write next step; the eager tail COW must cover this case."""
    rng = np.random.default_rng(13)
    ps = 8
    prompt = rng.integers(0, CFG.vocab, size=2 * ps - 2).astype(np.int32)
    eng = ServingEngine(params, CFG, num_pages=40, page_size=ps,
                        pages_per_seq=6, max_batch=3, reserve=1)
    eng.submit(0, prompt, 6)
    eng.step()   # prefill -> len 15
    eng.step()   # decode  -> len 16 == 2*ps: aligned, last slot pending
    base = list(eng.outputs[0])
    assert len(base) == 2
    alt = int((base[-1] + 1) % CFG.vocab)
    eng.fork(0, 1, next_token=alt, max_new_tokens=6)
    out = eng.run(max_steps=40)

    assert out[0] == _dense_greedy(params, prompt, 6)
    forced = list(np.concatenate([prompt, base[:1], [alt]]))
    want_fork = base[:1] + [alt] + _dense_greedy(params, forced, 4)
    assert out[1] == want_fork, (out[1], want_fork)


def test_prefix_cached_admission(params):
    """Automatic prefix caching: a request submitted with prefix_of= reuses
    the source's page-aligned common prefix — shared pages (no copies) and
    a suffix-only prefill — and still decodes exactly like a dense run."""
    rng = np.random.default_rng(17)
    ps = 8
    common = rng.integers(0, CFG.vocab, size=19).astype(np.int32)
    tail_a = rng.integers(0, CFG.vocab, size=3).astype(np.int32)
    tail_b = rng.integers(0, CFG.vocab, size=7).astype(np.int32)
    p_a = np.concatenate([common, tail_a])
    p_b = np.concatenate([common, tail_b])

    eng = ServingEngine(params, CFG, num_pages=40, page_size=ps,
                        pages_per_seq=6, max_batch=3, reserve=1)
    eng.submit(0, p_a, 4)
    eng.step()                     # admit + prefill A
    free_before = eng.alloc.free_pages
    eng.submit(1, p_b, 4, prefix_of=0)
    eng.step()                     # admit B sharing floor(19/8)=2 pages
    r_b = eng.sched._requests[1]
    assert r_b.shared_len == (19 // ps) * ps == 16
    # B's prompt needs ceil(26/8)=4 pages but only 2 are fresh (+1 from
    # A's decode append this step at most)
    used = free_before - eng.alloc.free_pages
    assert used <= 3, used
    t0 = eng.alloc.block_table(eng.sched._requests[0].seq)
    t1 = eng.alloc.block_table(r_b.seq)
    assert list(t0[:2]) == list(t1[:2]) and t0[2] != t1[2]

    out = eng.run(max_steps=40)
    assert out[0] == _dense_greedy(params, p_a, 4)
    assert out[1] == _dense_greedy(params, p_b, 4)


def test_prefix_source_retired_falls_back(params):
    """If the prefix source finished before admission, the request
    allocates and prefills normally (best-effort contract)."""
    rng = np.random.default_rng(19)
    p0 = rng.integers(0, CFG.vocab, size=9).astype(np.int32)
    p1 = np.concatenate([p0, [3, 1]]).astype(np.int32)
    eng = ServingEngine(params, CFG, num_pages=40, page_size=8,
                        pages_per_seq=6, max_batch=1, reserve=1)
    eng.submit(0, p0, 2)
    eng.submit(1, p1, 3, prefix_of=0)  # waits: only 1 lane
    out = eng.run(max_steps=40)
    assert eng.sched._requests[1].shared_len == 0  # source was retired
    assert out[0] == _dense_greedy(params, p0, 2)
    assert out[1] == _dense_greedy(params, p1, 3)


# ---- chunked prefill ----


def test_chunked_prefill_matches_dense(params):
    """prefill_chunk engines must be token-identical to the dense-prefill
    engine (and the dense oracle) across prompt lengths below, at, and
    above the chunk size, under a tight pool with lane turnover."""
    rng = np.random.default_rng(23)
    specs = {0: (11, 3), 1: (19, 6), 2: (5, 4), 3: (30, 2), 4: (16, 3)}
    prompts = {
        rid: rng.integers(0, CFG.vocab, size=plen).astype(np.int32)
        for rid, (plen, _new) in specs.items()
    }
    eng = ServingEngine(params, CFG, num_pages=24, page_size=8,
                        pages_per_seq=6, max_batch=2, reserve=1,
                        prefill_chunk=16)
    for rid, (_plen, new) in specs.items():
        eng.submit(rid, prompts[rid], new)
    outputs = eng.run(max_steps=120)
    for rid, (_plen, new) in specs.items():
        want = _dense_greedy(params, prompts[rid], new)
        assert outputs[rid] == want, (rid, outputs[rid], want)


def test_chunked_prefill_interleaves_decode(params):
    """The point of chunking: a long prompt's prefill spans several steps
    and the already-running request KEEPS DECODING during them instead of
    stalling behind one monolithic prefill."""
    rng = np.random.default_rng(29)
    p0 = rng.integers(0, CFG.vocab, size=6).astype(np.int32)
    p1 = rng.integers(0, CFG.vocab, size=40).astype(np.int32)  # 5 chunks
    eng = ServingEngine(params, CFG, num_pages=40, page_size=8,
                        pages_per_seq=7, max_batch=2, reserve=1,
                        prefill_chunk=8)
    eng.submit(0, p0, 10)
    eng.step()  # admit + single-chunk prefill of request 0
    eng.submit(1, p1, 2)
    n0 = len(eng.outputs[0])
    eng.step()  # admits request 1; chunk 1/5 — and request 0 decodes
    assert 1 in eng._prefilling  # still prefilling
    assert len(eng.outputs[0]) == n0 + 1  # decode was not blocked
    eng.step()  # chunk 2/5 + another decode
    assert 1 in eng._prefilling
    assert len(eng.outputs[0]) == n0 + 2
    out = eng.run(max_steps=60)
    assert out[0] == _dense_greedy(params, p0, 10)
    assert out[1] == _dense_greedy(params, p1, 2)


def test_chunked_prefill_with_prefix_cache(params):
    """Chunked prefill composes with automatic prefix caching: the chunk
    walk starts after the shared pages (no suffix gather path needed —
    the shared prefix is read through the same lane table)."""
    rng = np.random.default_rng(31)
    ps = 8
    common = rng.integers(0, CFG.vocab, size=19).astype(np.int32)
    p_a = np.concatenate([common, rng.integers(0, CFG.vocab, 3)]).astype(
        np.int32)
    p_b = np.concatenate([common, rng.integers(0, CFG.vocab, 7)]).astype(
        np.int32)
    eng = ServingEngine(params, CFG, num_pages=40, page_size=ps,
                        pages_per_seq=6, max_batch=3, reserve=1,
                        prefill_chunk=ps)
    eng.submit(0, p_a, 4)
    eng.submit(1, p_b, 4, prefix_of=0)
    out = eng.run(max_steps=60)
    assert eng.sched._requests[1].shared_len == 16
    assert out[0] == _dense_greedy(params, p_a, 4)
    assert out[1] == _dense_greedy(params, p_b, 4)


# ---- sampling ----


def test_sampling_topk1_equals_greedy(params):
    """temperature > 0 with top_k=1 must reduce to greedy."""
    from ring_flash_attn_tpu.models.serve import SamplingParams

    rng = np.random.default_rng(37)
    prompt = rng.integers(0, CFG.vocab, size=9).astype(np.int32)
    eng = ServingEngine(params, CFG, num_pages=20, page_size=8,
                        pages_per_seq=6, max_batch=2, reserve=1)
    eng.submit(0, prompt, 5,
               sampling=SamplingParams(temperature=0.7, top_k=1, seed=1))
    out = eng.run(max_steps=40)
    assert out[0] == _dense_greedy(params, prompt, 5)


def test_sampling_seed_reproducible(params):
    """Same (prompt, SamplingParams) -> same stochastic continuation
    across engines; the run is also a valid token sequence (all ids in
    vocab)."""
    from ring_flash_attn_tpu.models.serve import SamplingParams

    rng = np.random.default_rng(41)
    prompt = rng.integers(0, CFG.vocab, size=9).astype(np.int32)
    sp = SamplingParams(temperature=1.3, top_k=7, top_p=0.9, seed=123)
    outs = []
    for _ in range(2):
        eng = ServingEngine(params, CFG, num_pages=20, page_size=8,
                            pages_per_seq=6, max_batch=2, reserve=1)
        eng.submit(0, prompt, 6, sampling=sp)
        outs.append(eng.run(max_steps=40)[0])
    assert outs[0] == outs[1]
    assert all(0 <= t < CFG.vocab for t in outs[0])


def test_sampling_params_filters():
    """SamplingParams.sample unit behavior: top_k restricts the support,
    top_p keeps the smallest nucleus (a dominant token is always chosen),
    temperature=0 is argmax."""
    from ring_flash_attn_tpu.models.serve import SamplingParams

    logits = np.array([0.0, 10.0, 1.0, 2.0, 1.5], np.float32)
    rng = np.random.default_rng(0)
    assert SamplingParams().sample(logits, rng) == 1
    # top_p=0.5 with a dominant token: nucleus = {1}
    sp = SamplingParams(temperature=1.0, top_p=0.5)
    assert all(sp.sample(logits, rng) == 1 for _ in range(20))
    # top_k=2: support is {1, 3}
    sp = SamplingParams(temperature=5.0, top_k=2, seed=7)
    draws = {sp.sample(logits, rng) for _ in range(50)}
    assert draws <= {1, 3} and len(draws) == 2


def test_eos_token_stops_early(params):
    """eos_token_id finishes a request when generated (the stop token is
    recorded, HF-style), before max_new_tokens; unaffected requests run
    to their cap; works under speculation too (acceptance stops at eos)."""
    rng = np.random.default_rng(47)
    prompt = rng.integers(0, CFG.vocab, size=9).astype(np.int32)
    ref = _dense_greedy(params, prompt, 8)
    # stop at the first position whose token VALUE hasn't occurred before
    # (an earlier duplicate would legitimately stop the run there)
    stop_at = next(i for i in range(1, 8) if ref[i] not in ref[:i])
    eos = ref[stop_at]

    for spec in (None, 4):
        eng = ServingEngine(params, CFG, num_pages=40, page_size=8,
                            pages_per_seq=6, max_batch=2, reserve=1,
                            speculate_k=spec)
        eng.submit(0, prompt, 8, eos_token_id=eos)
        eng.submit(1, prompt, 8)  # no eos: runs to the cap
        out = eng.run(max_steps=60)
        assert out[0] == ref[:stop_at + 1], (spec, out[0], ref)
        assert out[1] == ref, (spec, out[1])

    # a set of stop ids works too
    eng = ServingEngine(params, CFG, num_pages=40, page_size=8,
                        pages_per_seq=6, max_batch=2, reserve=1)
    eng.submit(0, prompt, 8, eos_token_id={eos, CFG.vocab + 5})
    assert eng.run(max_steps=60)[0] == ref[:stop_at + 1]
