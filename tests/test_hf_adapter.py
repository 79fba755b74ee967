"""HF transformers adapter test: a real FlaxLlamaForCausalLM, patched, runs
context-parallel under shard_map and matches the unpatched full-sequence
model — the JAX analog of the reference's HF integration
(reference adapters/hf_adapter.py, usage README.md:15-69)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import ring_flash_attn_tpu as rfa
from ring_flash_attn_tpu.adapters import adapter as adapter_mod

transformers = pytest.importorskip("transformers")

W = 8
S = 256


@pytest.fixture(scope="module")
def model():
    from transformers import LlamaConfig
    from transformers.models.llama.modeling_flax_llama import (
        FlaxLlamaForCausalLM,
    )

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=S,
    )
    return FlaxLlamaForCausalLM(cfg, dtype=jnp.float32, seed=0)


def test_patched_sharded_matches_unpatched_full(devices8, model):
    mesh = Mesh(devices8, ("sp",))
    rfa.substitute_hf_flash_attn(process_group="sp")

    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, 128,
                                jnp.int32)
    # packed batch: two sequences of 96 and 160 tokens
    pos = jnp.concatenate(
        [jnp.arange(96), jnp.arange(160)]
    )[None].astype(jnp.int32)
    attn_mask = jnp.ones((1, S), jnp.int32)

    # oracle: each sequence through the (unpatched path of the) model alone
    adapter_mod.use_ring_attn(False)
    ref_a = model.module.apply(
        {"params": model.params}, tokens[:, :96], attn_mask[:, :96],
        pos[:, :96],
    )[0]
    ref_b = model.module.apply(
        {"params": model.params}, tokens[:, 96:], attn_mask[:, 96:],
        jnp.arange(160)[None].astype(jnp.int32),
    )[0]
    ref = jnp.concatenate([ref_a, ref_b], axis=1)

    adapter_mod.use_ring_attn(True)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, "sp"), P(None, "sp"), P(None, "sp")),
             out_specs=P(None, "sp"), check_vma=False)
    def sharded(params, tokens, mask, pos):
        return model.module.apply({"params": params}, tokens, mask, pos)[0]

    out = jax.jit(sharded)(model.params, tokens, attn_mask, pos)
    assert out.shape == ref.shape
    assert jnp.max(jnp.abs(out - ref)) < 2e-4, float(jnp.max(jnp.abs(out - ref)))


def test_use_ring_attn_toggle(devices8, model):
    """With the switch off, the patched model behaves exactly like stock HF
    (reference RING_ATTN_SWITCH, hf_adapter.py:33,65-67)."""
    rfa.substitute_hf_flash_attn(process_group="sp")
    adapter_mod.use_ring_attn(False)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 64), 0, 128,
                                jnp.int32)
    pos = jnp.arange(64)[None].astype(jnp.int32)
    mask = jnp.ones((1, 64), jnp.int32)
    out = model.module.apply({"params": model.params}, tokens, mask, pos)[0]
    assert out.shape == (1, 64, 128)
    adapter_mod.use_ring_attn(True)


def test_ring_attention_forward_softcap(devices8):
    """The adapter's attention override threads softcap (Gemma-2 style)
    through the llama3 path — the reference forcibly zeroes softcap
    (utils.py:19-20)."""
    mesh = Mesh(devices8, ("sp",))
    rfa.substitute_hf_flash_attn(process_group="sp")
    adapter_mod.use_ring_attn(True)

    B, H, HKV, D, CAP = 1, 4, 2, 32, 10.0
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, HKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, HKV, D), jnp.float32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]  # one packed sequence

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, "sp"),) * 3 + (P(None, "sp"),),
             out_specs=P(None, "sp"), check_vma=False)
    def sharded(q, k, v, pos):
        return adapter_mod.ring_attention_forward(
            q, k, v, causal=True, position_ids=pos, softcap=CAP
        )

    out = jax.jit(sharded)(q, k, v, pos)

    # dense capped-softmax oracle
    g = H // HKV
    qf = q[0].transpose(1, 0, 2).reshape(HKV, g, S, D)
    kf = k[0].transpose(1, 0, 2)
    logits = jnp.einsum("hgqd,hkd->hgqk", qf, kf) * (D ** -0.5)
    logits = CAP * jnp.tanh(logits / CAP)
    i = jnp.arange(S)
    logits = jnp.where(i[:, None] >= i[None, :], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("hgqk,hkd->hgqd", p, v[0].transpose(1, 0, 2))
    ref = ref.reshape(H, S, D).transpose(1, 0, 2)[None]
    assert jnp.max(jnp.abs(out - ref)) < 2e-5


@pytest.mark.parametrize("family", ["mistral", "gemma"])
def test_patched_families_match_unpatched(devices8, family):
    """The adapter claims llama/mistral/gemma coverage — verify the other
    two families' patched sharded forward matches stock HF."""
    import importlib

    if family == "mistral":
        from transformers import MistralConfig as Cfg

        mod = importlib.import_module(
            "transformers.models.mistral.modeling_flax_mistral"
        )
        model_cls = mod.FlaxMistralForCausalLM
        # NOTE: sliding_window must be >= S: HF's Flax mistral builds
        # triu(causal, k=-(sliding_window or 0)), so None degenerates to a
        # self-attention-only band — not plain causal attention
        cfg = Cfg(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=S,
            sliding_window=4096,
        )
    else:
        from transformers import GemmaConfig as Cfg

        mod = importlib.import_module(
            "transformers.models.gemma.modeling_flax_gemma"
        )
        model_cls = mod.FlaxGemmaForCausalLM
        cfg = Cfg(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=S,
        )

    model = model_cls(cfg, dtype=jnp.float32, seed=0)
    mesh = Mesh(devices8, ("sp",))
    rfa.substitute_hf_flash_attn(process_group="sp")

    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, 128,
                                jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]
    attn_mask = jnp.ones((1, S), jnp.int32)

    adapter_mod.use_ring_attn(False)
    ref = model.module.apply(
        {"params": model.params}, tokens, attn_mask, pos
    )[0]
    adapter_mod.use_ring_attn(True)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, "sp"), P(None, "sp"), P(None, "sp")),
             out_specs=P(None, "sp"), check_vma=False)
    def sharded(params, tokens, mask, pos):
        return model.module.apply({"params": params}, tokens, mask, pos)[0]

    out = jax.jit(sharded)(model.params, tokens, attn_mask, pos)
    assert jnp.max(jnp.abs(out - ref)) < 2e-4, float(jnp.max(jnp.abs(out - ref)))


def _packed_oracle(q, k, v, segids, scale):
    b, s, h, d = q.shape
    hkv = k.shape[2]
    g = h // hkv
    qf = q[0].transpose(1, 0, 2).reshape(hkv, g, s, d)
    kf = k[0].transpose(1, 0, 2)
    logits = jnp.einsum("hgqd,hkd->hgqk", qf, kf) * scale
    i = jnp.arange(s)
    allowed = (i[:, None] >= i[None, :]) & (
        segids[:, None] == segids[None, :]
    )
    logits = jnp.where(allowed, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("hgqk,hkd->hgqd", p, v[0].transpose(1, 0, 2))
    return ref.reshape(h, s, d).transpose(1, 0, 2)[None]


def test_data_params_metadata_path(devices8):
    """update_ring_flash_attn_params -> ring_attention_forward WITHOUT
    position_ids: the reference's DATA_PARAMS flow (hf_adapter.py:32,42-62).
    The implicit-constant trace warns; the traced global_segids argument
    (current_ring_params) survives a cached jit across different packings
    of the same shape."""
    import warnings as _w

    mesh = Mesh(devices8, ("sp",))
    rfa.substitute_hf_flash_attn(process_group="sp")
    adapter_mod.use_ring_attn(True)

    B, H, HKV, D = 1, 4, 2, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, HKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, HKV, D), jnp.float32)
    scale = D**-0.5

    cu_a = np.array([0, 96, S])
    cu_b = np.array([0, 192, S])  # same shape, different packing
    seg_of = lambda cu: jnp.asarray(
        np.searchsorted(cu, np.arange(S), side="right") - 1, jnp.int32
    )

    # (a) implicit DATA_PARAMS constants: correct on first trace, warns
    rfa.update_ring_flash_attn_params(cu_a, group="sp")

    @partial(shard_map, mesh=mesh, in_specs=(P(None, "sp"),) * 3,
             out_specs=P(None, "sp"), check_vma=False)
    def implicit(q, k, v):
        return adapter_mod.ring_attention_forward(q, k, v, causal=True)

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = jax.jit(implicit)(q, k, v)
    assert any("stale metadata" in str(r.message) for r in rec)
    ref_a = _packed_oracle(q, k, v, seg_of(cu_a), scale)
    assert jnp.max(jnp.abs(out - ref_a)) < 2e-5

    # (b) traced-argument path: ONE jit cache entry serves both packings
    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, "sp"),) * 3 + (P(),),
             out_specs=P(None, "sp"), check_vma=False)
    def traced(q, k, v, segids):
        return adapter_mod.ring_attention_forward(
            q, k, v, causal=True, global_segids=segids
        )

    jtraced = jax.jit(traced)
    out_a = jtraced(q, k, v, rfa.current_ring_params()["global_segids"])
    rfa.update_ring_flash_attn_params(cu_b, group="sp")
    out_b = jtraced(q, k, v, rfa.current_ring_params()["global_segids"])
    assert jnp.max(jnp.abs(out_a - ref_a)) < 2e-5
    ref_b = _packed_oracle(q, k, v, seg_of(cu_b), scale)
    assert jnp.max(jnp.abs(out_b - ref_b)) < 2e-5
    # the two packings genuinely differ — the cache isn't masking staleness
    assert jnp.max(jnp.abs(ref_a - ref_b)) > 1e-3
