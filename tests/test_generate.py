"""End-to-end long-context inference test: sharded prefill + quantized
decode vs a full-precision single-device forward."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ring_flash_attn_tpu.models import ModelConfig, forward, init_params
from ring_flash_attn_tpu.models.generate import generate

SP = 8
CFG = ModelConfig(
    vocab=128, dim=64, layers=2, heads=4, kv_heads=2, head_dim=16,
    mlp_dim=128, attention="llama3", dtype="float32",
)
S = 128  # prompt length
STEPS = 6


def test_generate_matches_full_forward(devices8):
    mesh = Mesh(devices8, ("sp",))
    params = init_params(jax.random.PRNGKey(0), CFG)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, CFG.vocab,
                                jnp.int32)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P(None, "sp")),
             out_specs=P(), check_vma=False)
    def gen(params, prompt_local):
        return generate(params, CFG, prompt_local, STEPS, "sp")

    toks = gen(params, prompt)
    assert toks.shape == (1, STEPS)

    # reference: greedy single-device full-precision decode
    seq = prompt
    ref_toks = []
    for _ in range(STEPS):
        logits = forward(
            params, CFG, seq, jnp.arange(seq.shape[1], dtype=jnp.int32),
            axis_name=None,
        )
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        ref_toks.append(int(nxt[0]))
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)

    # int8 KV quantization can flip near-ties; require >= 5/6 agreement and
    # exact agreement on the first token.
    got = [int(t) for t in np.asarray(toks[0])]
    assert got[0] == ref_toks[0], (got, ref_toks)
    agree = sum(g == r for g, r in zip(got, ref_toks))
    assert agree >= STEPS - 1, (got, ref_toks)
