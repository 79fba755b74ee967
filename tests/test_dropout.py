"""Deterministic dropout tests — an EXTENSION over the reference, which
documents dropout as unsupported (torch rng states can't ride the ring,
reference README.md:158).

The keep decision is a stateless hash of absolute coordinates
(ops/mask.py), so:
- the XLA and Pallas backends produce BIT-IDENTICAL dropout patterns,
- forward and backward see the same mask (gradients match an oracle that
  applies the same mask explicitly),
- ring-distributed dropout equals single-device dropout EXACTLY — the
  property the reference cannot provide.
"""

from functools import partial

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ring_flash_attn_tpu.ops.flash import flash_attention
from ring_flash_attn_tpu.ops.mask import (
    MaskArgs,
    dropout_keep,
    dropout_row_hash,
    dropout_threshold,
)
from ring_flash_attn_tpu.parallel.ring import ring_attention

B, HQ, HKV, S, D = 1, 4, 2, 256, 64
SCALE = D**-0.5
P_DROP = 0.2
SEED = 1234
W = 8
SPEC4 = P(None, None, "sp", None)
SPEC3 = P(None, None, "sp")


@pytest.fixture(scope="module")
def data():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D), jnp.float32)
    return q, k, v, dout


def explicit_keep(causal=True):
    """The dense keep mask, built with the public hash helpers —
    the oracle applies it explicitly inside plain softmax attention."""
    i = jnp.arange(S, dtype=jnp.int32)
    heads = jnp.arange(HQ, dtype=jnp.int32).reshape(HKV, HQ // HKV)
    rh = dropout_row_hash(
        i[None, None, None, :], None,
        heads[None, :, :, None],
        jnp.arange(B, dtype=jnp.int32)[:, None, None, None],
        jnp.int32(SEED),
    )
    return dropout_keep(
        rh[..., None], i[None, None, None, None, :],
        dropout_threshold(P_DROP),
    )  # (B, HKV, G, S, S)


def oracle(q, k, v, causal=True):
    """Plain softmax attention with the SAME keep mask applied explicitly."""
    b, hq, s, d = q.shape
    g = hq // HKV
    qf = q.astype(jnp.float32).reshape(b, HKV, g, s, d)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qf, k.astype(jnp.float32)) * SCALE
    if causal:
        i = jnp.arange(s)
        logits = jnp.where(i[:, None] >= i[None, :], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(explicit_keep(causal), p, 0.0) / (1.0 - P_DROP)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", p, v.astype(jnp.float32))
    return out.reshape(b, hq, s, d)


def _ref(q, k, v, dout, causal=True):
    ref = oracle(q, k, v, causal)

    def loss(q, k, v):
        return jnp.sum(oracle(q, k, v, causal) * dout)

    return (ref,) + jax.grad(loss, (0, 1, 2))(q, k, v)


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_dropout_vs_oracle(data, backend, causal):
    q, k, v, dout = data
    ref, dq_r, dk_r, dv_r = _ref(q, k, v, dout, causal)
    mask = MaskArgs(causal=causal, dropout_p=P_DROP, dropout_seed=SEED)

    def loss(q, k, v):
        o, _ = flash_attention(q, k, v, SCALE, mask, backend=backend)
        return jnp.sum(o * dout)

    out, _ = flash_attention(q, k, v, SCALE, mask, backend=backend)
    dq, dk, dv = jax.grad(loss, (0, 1, 2))(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5
    assert jnp.max(jnp.abs(dq - dq_r)) < 1e-4
    assert jnp.max(jnp.abs(dk - dk_r)) < 1e-4
    assert jnp.max(jnp.abs(dv - dv_r)) < 1e-4


def test_backends_bit_identical(data):
    """xla and pallas (interpret) produce the same dropout pattern."""
    q, k, v, _ = data
    mask = MaskArgs(causal=True, dropout_p=P_DROP, dropout_seed=SEED)
    a, _ = flash_attention(q, k, v, SCALE, mask, backend="xla")
    b_, _ = flash_attention(q, k, v, SCALE, mask, backend="pallas_interpret")
    assert jnp.max(jnp.abs(a - b_)) < 2e-6


def test_seed_determinism_and_variation(data):
    q, k, v, _ = data
    m1 = MaskArgs(causal=True, dropout_p=P_DROP, dropout_seed=SEED)
    a, _ = flash_attention(q, k, v, SCALE, m1, backend="xla")
    b_, _ = flash_attention(q, k, v, SCALE, m1, backend="xla")
    assert jnp.array_equal(a, b_)
    m2 = MaskArgs(causal=True, dropout_p=P_DROP, dropout_seed=SEED + 1)
    c, _ = flash_attention(q, k, v, SCALE, m2, backend="xla")
    assert jnp.max(jnp.abs(a - c)) > 1e-3


def test_keep_rate(data):
    keep = explicit_keep()
    rate = jnp.mean(keep.astype(jnp.float32))
    assert abs(float(rate) - (1.0 - P_DROP)) < 0.01


def test_ring_dropout_equals_single_device(devices8, data):
    """The headline property: distributed dropout == single-device dropout,
    exactly (same backend, same hash of absolute coordinates)."""
    mesh = Mesh(devices8, ("sp",))
    q, k, v, dout = data

    mask = MaskArgs(causal=True, dropout_p=P_DROP, dropout_seed=SEED)
    ref, _ = flash_attention(q, k, v, SCALE, mask, backend="xla")

    def loss_ref(q, k, v):
        o, _ = flash_attention(q, k, v, SCALE, mask, backend="xla")
        return jnp.sum(o * dout)

    dq_r, dk_r, dv_r = jax.grad(loss_ref, (0, 1, 2))(q, k, v)

    @partial(shard_map, mesh=mesh, in_specs=(SPEC4,) * 3,
             out_specs=(SPEC4, SPEC3), check_vma=False)
    def sharded(q, k, v):
        return ring_attention(
            q, k, v, scale=SCALE, causal=True, axis_name="sp",
            dropout_p=P_DROP, dropout_seed=SEED,
        )

    out, _ = jax.jit(sharded)(q, k, v)

    def loss(q, k, v):
        o, _ = sharded(q, k, v)
        return jnp.sum(o * dout)

    dq, dk, dv = jax.jit(jax.grad(loss, (0, 1, 2)))(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < 2e-6
    assert jnp.max(jnp.abs(dq - dq_r)) < 1e-5
    assert jnp.max(jnp.abs(dk - dk_r)) < 1e-5
    assert jnp.max(jnp.abs(dv - dv_r)) < 1e-5


def test_api_dropout(data):
    from ring_flash_attn_tpu.api import flash_attn_func

    q, k, v, dout = data
    ref, *_ = _ref(q, k, v, dout, causal=True)
    out = flash_attn_func(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), dropout_p=P_DROP, causal=True,
        dropout_seed=SEED,
    )
    assert jnp.max(jnp.abs(out.transpose(0, 2, 1, 3) - ref)) < 2e-5


def test_api_dropout_traced_seed(data):
    """Per-step training seeds are traced scalars; must work under jit."""
    from ring_flash_attn_tpu.api import flash_attn_func

    q, k, v, _ = data
    qs, ks, vs = (x.transpose(0, 2, 1, 3) for x in (q, k, v))

    @jax.jit
    def f(seed):
        return flash_attn_func(
            qs, ks, vs, dropout_p=P_DROP, causal=True, dropout_seed=seed
        )

    a = f(jnp.int32(SEED))
    b_ = f(jnp.int32(SEED))
    c = f(jnp.int32(SEED + 7))
    assert jnp.array_equal(a, b_)
    assert jnp.max(jnp.abs(a - c)) > 1e-3


def test_api_dropout_traced_seed_grad(data):
    """jax.grad through the single-device path with a TRACED seed — the
    custom_vjp must thread the seed as an explicit argument, not close over
    the tracer (ADVICE round 1, flash.py)."""
    from ring_flash_attn_tpu.api import flash_attn_func

    q, k, v, dout = data
    qs, ks, vs = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    douts = dout.transpose(0, 2, 1, 3)

    @jax.jit
    def g(q, k, v, seed):
        def loss(q, k, v):
            o = flash_attn_func(
                q, k, v, dropout_p=P_DROP, causal=True, dropout_seed=seed
            )
            return jnp.sum(o * douts)

        return jax.grad(loss, (0, 1, 2))(q, k, v)

    dq1, dk1, dv1 = g(qs, ks, vs, jnp.int32(SEED))
    dq2, _, _ = g(qs, ks, vs, jnp.int32(SEED))
    dq3, _, _ = g(qs, ks, vs, jnp.int32(SEED + 7))
    assert jnp.array_equal(dq1, dq2)
    assert jnp.max(jnp.abs(dq1 - dq3)) > 1e-5
    assert all(jnp.all(jnp.isfinite(x)) for x in (dq1, dk1, dv1))


@pytest.mark.parametrize("kind", ["zigzag", "stripe"])
def test_layout_dropout_equals_single_device(devices8, data, kind):
    """Zigzag/stripe dropout uses the layouts' closed-form global positions:
    still bit-identical to single-device dropout."""
    from ring_flash_attn_tpu.parallel import layouts
    from ring_flash_attn_tpu.parallel.stripe import stripe_attention
    from ring_flash_attn_tpu.parallel.zigzag import zigzag_ring_attention

    mesh = Mesh(devices8, ("sp",))
    q, k, v, dout = data

    mask = MaskArgs(causal=True, dropout_p=P_DROP, dropout_seed=SEED)
    ref, _ = flash_attention(q, k, v, SCALE, mask, backend="xla")

    def loss_ref(q, k, v):
        o, _ = flash_attention(q, k, v, SCALE, mask, backend="xla")
        return jnp.sum(o * dout)

    dq_r, dk_r, dv_r = jax.grad(loss_ref, (0, 1, 2))(q, k, v)

    if kind == "zigzag":
        fn = lambda q, k, v: zigzag_ring_attention(
            q, k, v, scale=SCALE, axis_name="sp", dropout_p=P_DROP,
            dropout_seed=SEED,
        )
        tolocal, restore = layouts.all_local_zigzag, layouts.restore_zigzag
    else:
        fn = lambda q, k, v: stripe_attention(
            q, k, v, scale=SCALE, axis_name="sp", dropout_p=P_DROP,
            dropout_seed=SEED,
        )
        tolocal, restore = layouts.all_local_stripe, layouts.restore_stripe

    ql, kl, vl, doutl = (tolocal(x, W, axis=2) for x in (q, k, v, dout))

    @partial(shard_map, mesh=mesh, in_specs=(SPEC4,) * 3,
             out_specs=(SPEC4, SPEC3), check_vma=False)
    def sharded(q, k, v):
        return fn(q, k, v)

    out, _ = jax.jit(sharded)(ql, kl, vl)

    def loss(q, k, v):
        o, _ = sharded(q, k, v)
        return jnp.sum(o * doutl)

    dq, dk, dv = jax.jit(jax.grad(loss, (0, 1, 2)))(ql, kl, vl)
    rs = lambda x: restore(x, W, axis=2)
    assert jnp.max(jnp.abs(rs(out) - ref)) < 2e-6
    assert jnp.max(jnp.abs(rs(dq) - dq_r)) < 1e-5
    assert jnp.max(jnp.abs(rs(dk) - dk_r)) < 1e-5
    assert jnp.max(jnp.abs(rs(dv) - dv_r)) < 1e-5


def test_ring_varlen_dropout_equals_single_device(devices8, data):
    """Varlen ring dropout: within-sequence positions + segment ids feed
    the same hash as single-device varlen dropout — exact equality."""
    import numpy as np
    from ring_flash_attn_tpu.api import (
        flash_attn_varlen_func,
        ring_flash_attn_varlen_func,
    )
    from ring_flash_attn_tpu.ops import varlen as V

    mesh = Mesh(devices8, ("sp",))
    q, k, v, _ = data
    q1, k1, v1 = (x[0].transpose(1, 0, 2) for x in (q, k, v))  # (S,H,D)
    CU = np.array([0, 96, 160, 256])

    ref = flash_attn_varlen_func(
        q1, k1, v1, jnp.asarray(CU), causal=True, dropout_p=P_DROP,
        dropout_seed=SEED,
    )

    def tolocal(x):
        return jnp.concatenate(
            [jnp.asarray(V.extract_local_ring_varlen(np.asarray(x), CU,
                                                     r, W, axis=0))
             for r in range(W)], axis=0)

    ql, kl, vl = map(tolocal, (q1, k1, v1))
    cu_local = jnp.asarray(CU // W, jnp.int32)

    @partial(shard_map, mesh=mesh, in_specs=(P("sp"),) * 3,
             out_specs=P("sp"), check_vma=False)
    def f(q, k, v):
        return ring_flash_attn_varlen_func(
            q, k, v, cu_local, causal=True, group="sp", dropout_p=P_DROP,
            dropout_seed=SEED,
        )

    out = jax.jit(f)(ql, kl, vl)
    # restore the per-rank packing to global order
    out_g = np.zeros_like(np.asarray(out))
    t_local = 256 // W
    for r in range(W):
        shard = np.asarray(out)[r * t_local:(r + 1) * t_local]
        off = 0
        for i in range(len(CU) - 1):
            li = (CU[i + 1] - CU[i]) // W
            out_g[CU[i] + r * li: CU[i] + (r + 1) * li] = shard[off:off + li]
            off += li
    assert np.max(np.abs(out_g - np.asarray(ref))) < 2e-6


def test_llama3_dropout_world_invariant_and_vs_oracle(devices8, data):
    """llama3 dropout keys off (absolute token index, segment label, global
    head id, seed) — world-size invariant, and equal to a single-device
    oracle fed the same coordinates."""
    from ring_flash_attn_tpu.parallel.llama3 import llama3_attention

    q, k, v, dout = data
    labels = jnp.zeros((S,), jnp.int32)  # one sequence: one label

    # oracle: single-device flash with explicit absolute positions + labels
    mask = MaskArgs(
        causal=True, q_pos=jnp.arange(S, dtype=jnp.int32),
        kv_pos=jnp.arange(S, dtype=jnp.int32),
        q_segids=labels, kv_segids=labels,
        dropout_p=P_DROP, dropout_seed=SEED,
    )
    ref, _ = flash_attention(q, k, v, SCALE, mask, backend="xla")

    def run(n):
        mesh = Mesh(devices8[:n], ("sp",))

        @partial(shard_map, mesh=mesh,
                 in_specs=(SPEC4,) * 3 + (P("sp"),),
                 out_specs=(SPEC4, SPEC3), check_vma=False)
        def f(q, k, v, seg):
            return llama3_attention(
                q, k, v, seg, scale=SCALE, causal=True, heads_k_stride=1,
                axis_name="sp", dropout_p=P_DROP, dropout_seed=SEED,
            )

        out, _ = jax.jit(f)(q, k, v, labels)
        return out

    import numpy as np

    out8 = np.asarray(run(8))
    out4 = np.asarray(run(4))
    assert np.max(np.abs(out8 - out4)) < 2e-6  # world-size invariant
    assert np.max(np.abs(out8 - np.asarray(ref))) < 2e-6  # equals the oracle
