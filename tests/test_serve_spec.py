"""Speculative decoding (prompt-lookup drafts + one-forward verification)
must be EXACTLY greedy-equivalent: same tokens as the plain engine and
the dense oracle, in fewer steps when the text is repetitive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ring_flash_attn_tpu.models import ModelConfig
from ring_flash_attn_tpu.models.serve import (
    SamplingParams,
    ServingEngine,
    _prompt_lookup,
)
from ring_flash_attn_tpu.models.transformer import forward, init_params

CFG = ModelConfig(
    vocab=61, dim=32, layers=2, heads=4, kv_heads=2, head_dim=16,
    mlp_dim=64, dtype="float32",
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def _dense_greedy(params, prompt, n_new):
    toks = list(np.asarray(prompt, np.int32))
    out = []
    for _ in range(n_new):
        t = jnp.asarray(toks, jnp.int32)[None]
        logits = forward(params, CFG, t,
                         jnp.arange(len(toks), dtype=jnp.int32))
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)
    return out


def _run(params, prompts, news, speculate_k=None, count_steps=False,
         sampling=None):
    eng = ServingEngine(params, CFG, num_pages=40, page_size=8,
                        pages_per_seq=8, max_batch=2, reserve=1,
                        speculate_k=speculate_k)
    for rid, p in prompts.items():
        eng.submit(rid, p, news[rid],
                   sampling=(sampling or {}).get(rid))
    steps = 0
    while not eng.sched.idle:
        steps += 1
        assert steps <= 200
        eng.step()
    return (eng.outputs, steps) if count_steps else eng.outputs


def test_prompt_lookup_proposals():
    # final 2-gram (7, 8) occurred earlier; following tokens proposed
    ctx = [1, 7, 8, 9, 4, 5, 7, 8]
    assert _prompt_lookup(ctx, 3).tolist() == [9, 4, 5]
    # longest n-gram wins: ... 5, 7, 8 matches the later occurrence
    ctx = [5, 7, 8, 1, 2, 5, 7, 8]
    assert _prompt_lookup(ctx, 2).tolist() == [1, 2]
    assert _prompt_lookup([1, 2, 3], 4).tolist() == []  # no repeat
    assert _prompt_lookup([9, 9], 2).tolist() == [9]


def test_spec_matches_plain_repetitive(params):
    """Repetitive prompts (lookup hits often) — token-identical, fewer
    steps."""
    rng = np.random.default_rng(3)
    unit = rng.integers(0, CFG.vocab, size=5).astype(np.int32)
    prompts = {
        0: np.tile(unit, 4),                      # strongly repetitive
        1: rng.integers(0, CFG.vocab, 13).astype(np.int32),
    }
    news = {0: 10, 1: 6}
    plain, steps_plain = _run(params, prompts, news, count_steps=True)
    spec, steps_spec = _run(params, prompts, news, speculate_k=4,
                            count_steps=True)
    assert spec == plain
    for rid in prompts:
        assert plain[rid] == _dense_greedy(params, prompts[rid], news[rid])
    # greedy continuations of tiny random models are highly repetitive,
    # so speculation must actually save steps
    assert steps_spec < steps_plain, (steps_spec, steps_plain)


def test_spec_matches_plain_nonrepetitive(params):
    rng = np.random.default_rng(7)
    prompts = {0: rng.integers(0, CFG.vocab, 11).astype(np.int32),
               1: rng.integers(0, CFG.vocab, 24).astype(np.int32)}
    news = {0: 7, 1: 4}
    assert (_run(params, prompts, news, speculate_k=5)
            == _run(params, prompts, news))


def test_spec_sampled_lane_falls_back(params):
    """temperature>0 lanes draw exactly one token per step under
    speculation — identical stream consumption, identical outputs."""
    rng = np.random.default_rng(11)
    prompts = {0: np.tile(rng.integers(0, CFG.vocab, 4), 5).astype(np.int32),
               1: rng.integers(0, CFG.vocab, 9).astype(np.int32)}
    news = {0: 8, 1: 6}
    sampling = {1: SamplingParams(temperature=1.1, top_k=9, seed=5)}
    assert (_run(params, prompts, news, speculate_k=4, sampling=sampling)
            == _run(params, prompts, news, sampling=sampling))


def test_spec_with_fork(params):
    """COW forks mid-speculation: both branches stay oracle-exact."""
    rng = np.random.default_rng(13)
    prompt = np.tile(rng.integers(0, CFG.vocab, 4), 4).astype(np.int32)
    eng = ServingEngine(params, CFG, num_pages=60, page_size=8,
                        pages_per_seq=8, max_batch=3, reserve=1,
                        speculate_k=4)
    eng.submit(0, prompt, 9)
    eng.step()  # prefill
    eng.step()  # first (speculative) decode
    base = list(eng.outputs[0])
    alt = int((base[-1] + 1) % CFG.vocab)
    eng.fork(0, 1, next_token=alt, max_new_tokens=9)
    out = eng.run(max_steps=60)
    assert out[0] == _dense_greedy(params, prompt, 9)
    forced = list(np.concatenate([prompt, base[:-1], [alt]]))
    want = base[:-1] + [alt] + _dense_greedy(
        params, forced, 9 - len(base))
    assert out[1] == want, (out[1], want)
