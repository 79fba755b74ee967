"""End-to-end: train a real HF Flax Llama through ring attention.

The reference's flagship integration demo is "patch HF transformers, train
an unmodified causal LM with ring attention" (reference README.md:15-69,
adapters/hf_adapter.py). This example is the TPU-native analog, runnable
without hardware on the virtual CPU mesh:

  1. Build `FlaxLlamaForCausalLM` from a LlamaConfig carrying Llama-3.2's
     architecture (GQA 32q/8kv ratio, rope theta 500k, silu MLP) at reduced
     depth/width so it runs anywhere (--full-dims restores the exact 1B
     dims).
  2. `substitute_hf_flash_attn(process_group="sp")` — the model is NOT
     modified; its attention now routes through llama3-style all-gather
     context parallelism (adapters/adapter.py).
  3. Pack multiple documents into one batch_size==1 sequence (the packing
     convention the reference's adapter enforces, hf_adapter.py:145-147);
     position_ids reset per document and carry the packing metadata into
     the trace (no stale-constant DATA_PARAMS path).
  4. shard the sequence over the mesh's `sp` axis and run a jitted
     adamw train loop: per-step loss is the packed next-token
     cross-entropy, gradients flow through the ring collectives.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/train_hf_flax_ring.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import ring_flash_attn_tpu as rfa


def build_model(full_dims, seq_len):
    from transformers import LlamaConfig
    from transformers.models.llama.modeling_flax_llama import (
        FlaxLlamaForCausalLM,
    )

    if full_dims:  # Llama-3.2-1B architecture, verbatim
        cfg = LlamaConfig(
            vocab_size=128256, hidden_size=2048, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32,
            num_key_value_heads=8, rope_theta=500000.0,
            max_position_embeddings=max(seq_len, 131072),
            tie_word_embeddings=True,
        )
    else:  # same shape ratios (4:1 GQA, 4x MLP), CI-sized
        cfg = LlamaConfig(
            vocab_size=512, hidden_size=128, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=2, rope_theta=500000.0,
            max_position_embeddings=max(seq_len, 4096),
        )
    return FlaxLlamaForCausalLM(cfg, dtype=jnp.float32, seed=0)


def pack_batch(rng, vocab, doc_lens):
    """Pack documents into one (1, sum(lens)) sequence + per-doc positions."""
    total = sum(doc_lens)
    tokens = jax.random.randint(rng, (1, total), 0, vocab, jnp.int32)
    pos = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32) for n in doc_lens]
    )[None]
    return tokens, pos


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--full-dims", action="store_true",
                    help="exact Llama-3.2-1B dims (needs real memory)")
    args = ap.parse_args(argv)

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("sp",))
    world = len(devs)
    assert args.seq_len % world == 0

    model = build_model(args.full_dims, args.seq_len)
    cfg = model.config
    print(f"model: llama arch, {cfg.num_hidden_layers}L x {cfg.hidden_size}d, "
          f"{cfg.num_attention_heads}q/{cfg.num_key_value_heads}kv heads, "
          f"vocab {cfg.vocab_size}; mesh sp={world}")

    # patch HF: every decoder layer's attention now rides the ring
    rfa.substitute_hf_flash_attn(process_group="sp")

    # pack 3 documents; lengths sum to seq_len and divide evenly by world
    a = args.seq_len // 4
    doc_lens = [a, 2 * a, args.seq_len - 3 * a]
    tokens, pos = pack_batch(jax.random.PRNGKey(1), cfg.vocab_size, doc_lens)
    attn_mask = jnp.ones_like(tokens)
    # next-token targets stay within each document: the last token of each
    # doc predicts nothing (weight 0)
    starts = np.cumsum([0] + doc_lens)[:-1]
    weights = np.ones((1, args.seq_len), np.float32)
    weights[0, np.array([s - 1 for s in starts[1:]] + [args.seq_len - 1])] = 0
    weights = jnp.asarray(weights)
    targets = jnp.roll(tokens, -1, axis=1)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, "sp"), P(None, "sp"), P(None, "sp")),
             out_specs=P(None, "sp", None), check_vma=False)
    def forward(params, tokens_, mask_, pos_):
        return model.module.apply(
            {"params": params}, tokens_, mask_, pos_
        )[0]

    def loss_fn(params):
        logits = forward(params, tokens, attn_mask, pos)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * weights) / jnp.sum(weights)

    tx = optax.adamw(3e-3)
    opt_state = tx.init(model.params)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = model.params
    first = last = None
    for step in range(args.steps):
        params, opt_state, loss = train_step(params, opt_state)
        loss = float(loss)
        first = loss if first is None else first
        last = loss
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step:3d}  loss {loss:.4f}")
    assert last < first, (first, last)
    print(f"OK: loss {first:.4f} -> {last:.4f} over {args.steps} steps "
          f"through ring attention on the sp={world} mesh")


if __name__ == "__main__":
    main()
