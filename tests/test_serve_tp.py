"""Tensor-parallel serving decode (distributed serving, an extension —
the reference is a training-side library): `models.serve._decode_body`
with tp_axis= runs inside shard_map with megatron-sharded weights
(transformer.param_specs) and KV-head-sharded paged caches, and must
reproduce the single-device decode step exactly — logits, appended pages,
and advanced seq_lens."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ring_flash_attn_tpu.models import ModelConfig
from ring_flash_attn_tpu.models.serve import _decode_body
from ring_flash_attn_tpu.models.transformer import init_params, param_specs
from ring_flash_attn_tpu.ops import paged

CFG = ModelConfig(
    vocab=61, dim=32, layers=2, heads=4, kv_heads=4, head_dim=16,
    mlp_dim=64, dtype="float32",
)
B, PS, PPS = 3, 8, 4


def _cache_specs(tp):
    # PagedKVCache = (k_pages, v_pages, block_tables, seq_lens):
    # pages shard on the KV-head axis, tables/lens replicate
    return paged.PagedKVCache(
        P(None, tp, None, None), P(None, tp, None, None), P(), P()
    )


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_decode_matches_single_device(tp):
    if len(jax.devices()) < tp:
        pytest.skip("needs %d devices" % tp)
    params = init_params(jax.random.PRNGKey(0), CFG)
    key = jax.random.PRNGKey(1)
    caches = []
    for li in range(CFG.layers):
        c = paged.paged_init(B, CFG.kv_heads, B * PPS, PS, PPS,
                             CFG.head_dim, dtype=jnp.float32)
        k = jax.random.normal(
            jax.random.fold_in(key, 2 * li),
            (B, CFG.kv_heads, 2 * PS, CFG.head_dim), jnp.float32)
        v = jax.random.normal(
            jax.random.fold_in(key, 2 * li + 1), k.shape, jnp.float32)
        lens = jnp.asarray([2 * PS - 3, PS, 0], jnp.int32)  # incl. dead lane
        caches.append(paged.paged_prefill(c, k, v, lens))
    tokens = jnp.asarray([5, 9, 0], jnp.int32)
    live = jnp.asarray([True, True, False])

    ref_logits, ref_caches = _decode_body(params, CFG, tokens, live, caches)

    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    cspecs = [_cache_specs("tp")] * CFG.layers

    def step(p, t, lv, cs):
        return _decode_body(p, CFG, t, lv, cs, tp_axis="tp")

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(param_specs(CFG, "tp"), P(), P(), cspecs),
        out_specs=(P(), cspecs), check_vma=False,
    ))
    tp_logits, tp_caches = fn(params, tokens, live, caches)

    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits), atol=2e-5, rtol=1e-5)
    for rc, tc in zip(ref_caches, tp_caches):
        np.testing.assert_array_equal(np.asarray(rc.seq_lens),
                                      np.asarray(tc.seq_lens))
        # later layers' appended K/V inherit tiny psum-ordering noise from
        # the previous layer's tp reductions
        np.testing.assert_allclose(np.asarray(tc.k_pages),
                                   np.asarray(rc.k_pages), atol=1e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(tc.v_pages),
                                   np.asarray(rc.v_pages), atol=1e-5,
                                   rtol=1e-5)


def test_tp_decode_multi_step_greedy_chain(tp=2):
    """Three chained TP decode steps (appends feeding later reads) track
    the single-device chain token for token."""
    if len(jax.devices()) < tp:
        pytest.skip("needs 2 devices")
    params = init_params(jax.random.PRNGKey(3), CFG)
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    cspecs = [_cache_specs("tp")] * CFG.layers

    def make_caches():
        caches = []
        for li in range(CFG.layers):
            c = paged.paged_init(B, CFG.kv_heads, B * PPS, PS, PPS,
                                 CFG.head_dim, dtype=jnp.float32)
            k = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(7), li),
                (B, CFG.kv_heads, PS, CFG.head_dim), jnp.float32)
            caches.append(
                paged.paged_prefill(c, k, -k, jnp.asarray([PS - 2, 5, 3]))
            )
        return caches

    def step(p, t, lv, cs):
        return _decode_body(p, CFG, t, lv, cs, tp_axis="tp")

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(param_specs(CFG, "tp"), P(), P(), cspecs),
        out_specs=(P(), cspecs), check_vma=False,
    ))

    live = jnp.asarray([True, True, True])
    tok_ref = tok_tp = jnp.asarray([1, 2, 3], jnp.int32)
    c_ref, c_tp = make_caches(), make_caches()
    for _ in range(3):
        lg_ref, c_ref = _decode_body(params, CFG, tok_ref, live, c_ref)
        lg_tp, c_tp = fn(params, tok_tp, live, c_tp)
        nxt_ref = jnp.argmax(lg_ref, -1).astype(jnp.int32)
        nxt_tp = jnp.argmax(lg_tp, -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(nxt_ref),
                                      np.asarray(nxt_tp))
        tok_ref, tok_tp = nxt_ref, nxt_tp


def test_engine_on_tp_mesh_matches_plain():
    """The full ServingEngine on a 2-way tp mesh (GSPMD propagation:
    sharded params + KV-head-sharded page pools, unmodified step code)
    must reproduce the plain engine's tokens — admissions, chunked
    prefill, prefix caching, decode, and retirement all run sharded."""
    from ring_flash_attn_tpu.models.serve import ServingEngine

    params = init_params(jax.random.PRNGKey(5), CFG)
    rng = np.random.default_rng(43)
    common = rng.integers(0, CFG.vocab, size=17).astype(np.int32)
    prompts = {
        0: rng.integers(0, CFG.vocab, size=11).astype(np.int32),
        1: np.concatenate([common, rng.integers(0, CFG.vocab, 4)]).astype(
            np.int32),
        2: np.concatenate([common, rng.integers(0, CFG.vocab, 6)]).astype(
            np.int32),
        3: rng.integers(0, CFG.vocab, size=26).astype(np.int32),
    }

    def run(mesh):
        eng = ServingEngine(params, CFG, num_pages=32, page_size=8,
                            pages_per_seq=6, max_batch=2, reserve=1,
                            prefill_chunk=16, mesh=mesh)
        eng.submit(0, prompts[0], 4)
        eng.submit(1, prompts[1], 3)
        eng.submit(2, prompts[2], 3, prefix_of=1)
        eng.submit(3, prompts[3], 2)
        return eng.run(max_steps=120)

    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    plain, sharded = run(None), run(mesh)
    assert plain == sharded, (plain, sharded)
    for rid in prompts:
        assert plain[rid] == _dense_oracle(params, prompts[rid],
                                           len(plain[rid]))


def _dense_oracle(params, prompt, n_new):
    from ring_flash_attn_tpu.models.transformer import forward

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
