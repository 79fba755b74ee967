"""Monolithic single-device attention oracle for the equivalence tests.

Plays the role flash_attn_qkvpacked_func on the full sequence plays in the
reference tests (reference test/test_ring_flash_attn_func.py:46-54): an
independent implementation (plain masked softmax + autodiff, not the
framework's blockwise code) that distributed results must match.
"""

import jax
import jax.numpy as jnp


def full_attention(q, k, v, scale, causal=False, segids=None, positions=None,
                   window_left=None):
    """q (B,Hq,S,D), k/v (B,Hkv,S,D) -> out (B,Hq,S,D), via plain softmax."""
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, s, d)
    logits = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qf, k.astype(jnp.float32)
    ) * scale
    allowed = jnp.ones((s, s), bool)
    if causal:
        if positions is None:
            positions = jnp.arange(s)
        allowed &= positions[:, None] >= positions[None, :]
        if window_left is not None:
            allowed &= (positions[:, None] - positions[None, :]) <= window_left
    if segids is not None:
        allowed &= segids[:, None] == segids[None, :]
    logits = jnp.where(allowed, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", p, v.astype(jnp.float32))
    return out.reshape(b, hq, s, d)


def full_attention_lse(q, k, v, scale, causal=False, segids=None,
                       positions=None):
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, s, d)
    logits = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qf, k.astype(jnp.float32)
    ) * scale
    allowed = jnp.ones((s, s), bool)
    if causal:
        if positions is None:
            positions = jnp.arange(s)
        allowed &= positions[:, None] >= positions[None, :]
    if segids is not None:
        allowed &= segids[:, None] == segids[None, :]
    logits = jnp.where(allowed, logits, -jnp.inf)
    return jax.scipy.special.logsumexp(logits, axis=-1).reshape(b, hq, s)


def grads(loss_fn, *args):
    return jax.grad(loss_fn, tuple(range(len(args))))(*args)
