"""Distributed-equivalence tests for the batch schedules on an 8-device
virtual CPU mesh.

Pattern = the reference's (SURVEY.md §4): run the monolithic oracle on the
full sequence, extract each rank's shard with the schedule's layout
transform, run the distributed function under shard_map, compare out/lse and
dq/dk/dv — but with asserted tolerances instead of eyeballing.
"""

from functools import partial

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ring_flash_attn_tpu.parallel import layouts
from ring_flash_attn_tpu.parallel.ring import ring_attention
from ring_flash_attn_tpu.parallel.stripe import stripe_attention
from ring_flash_attn_tpu.parallel.zigzag import zigzag_ring_attention

from oracle import full_attention, full_attention_lse

W = 8
B, HQ, HKV, S, D = 1, 4, 2, 512, 64
SCALE = D**-0.5
SPEC4 = P(None, None, "sp", None)
SPEC3 = P(None, None, "sp")


@pytest.fixture(scope="module")
def mesh(devices8):
    return Mesh(devices8, ("sp",))


@pytest.fixture(scope="module")
def data():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D), jnp.float32)
    return q, k, v, dout


def _identity(x, w, axis):
    return x


def _run(mesh, fn, q, k, v, dout, tolocal, restore):
    ql, kl, vl, doutl = (tolocal(x, W, axis=2) for x in (q, k, v, dout))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(SPEC4, SPEC4, SPEC4),
        out_specs=(SPEC4, SPEC3),
        check_vma=False,
    )
    def sharded(q, k, v):
        return fn(q, k, v)

    out, lse = jax.jit(sharded)(ql, kl, vl)

    def loss(q, k, v):
        o, _ = sharded(q, k, v)
        return jnp.sum(o * doutl)

    dq, dk, dv = jax.jit(jax.grad(loss, (0, 1, 2)))(ql, kl, vl)
    rs = lambda x: restore(x, W, axis=2)
    return rs(out), rs(lse), rs(dq), rs(dk), rs(dv)


def _check(q, k, v, dout, got, causal=True, tol=2e-5, gtol=1e-4):
    out, lse, dq, dk, dv = got
    ref = full_attention(q, k, v, SCALE, causal=causal)
    ref_lse = full_attention_lse(q, k, v, SCALE, causal=causal)

    def loss(q, k, v):
        return jnp.sum(full_attention(q, k, v, SCALE, causal=causal) * dout)

    dq_r, dk_r, dv_r = jax.grad(loss, (0, 1, 2))(q, k, v)
    assert jnp.max(jnp.abs(out - ref)) < tol
    assert jnp.max(jnp.abs(lse - ref_lse)) < tol
    assert jnp.max(jnp.abs(dq - dq_r)) < gtol
    assert jnp.max(jnp.abs(dk - dk_r)) < gtol
    assert jnp.max(jnp.abs(dv - dv_r)) < gtol


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention(mesh, data, causal):
    q, k, v, dout = data
    fn = lambda q, k, v: ring_attention(
        q, k, v, scale=SCALE, causal=causal, axis_name="sp"
    )
    got = _run(mesh, fn, q, k, v, dout, _identity, _identity)
    _check(q, k, v, dout, got, causal=causal)


def test_zigzag_ring_attention(mesh, data):
    q, k, v, dout = data
    fn = lambda q, k, v: zigzag_ring_attention(
        q, k, v, scale=SCALE, axis_name="sp"
    )
    got = _run(
        mesh, fn, q, k, v, dout, layouts.all_local_zigzag,
        layouts.restore_zigzag,
    )
    _check(q, k, v, dout, got)


def test_stripe_attention(mesh, data):
    q, k, v, dout = data
    fn = lambda q, k, v: stripe_attention(q, k, v, scale=SCALE, axis_name="sp")
    got = _run(
        mesh, fn, q, k, v, dout, layouts.all_local_stripe,
        layouts.restore_stripe,
    )
    _check(q, k, v, dout, got)


def test_layout_roundtrip():
    x = jnp.arange(2 * 32 * 3, dtype=jnp.float32).reshape(2, 32, 3)
    for tolocal, restore in [
        (layouts.all_local_zigzag, layouts.restore_zigzag),
        (layouts.all_local_stripe, layouts.restore_stripe),
    ]:
        y = restore(tolocal(x, 8, axis=1), 8, axis=1)
        assert jnp.array_equal(x, y)


def test_zigzag_matches_reference_chunk_layout():
    """Rank r must hold chunks [r, 2W-1-r] of 2W chunks
    (reference test_zigzag_ring_flash_attn_func.py:9-14)."""
    x = jnp.arange(16)[None, :]
    shard = layouts.extract_local_zigzag(x, rank=1, world=4, axis=1)
    assert shard.tolist() == [[2, 3, 12, 13]]


def test_stripe_matches_reference_stride_layout():
    """Token t lives on rank t % W (reference
    test_stripe_flash_attn_func.py:9-14)."""
    x = jnp.arange(16)[None, :]
    shard = layouts.extract_local_stripe(x, rank=1, world=4, axis=1)
    assert shard.tolist() == [[1, 5, 9, 13]]


def test_psum_exact_transpose(devices8):
    """psum_exact: forward sums over the axis; backward is the identity —
    unlike raw lax.psum under shard_map, whose transpose is psum (cotangent
    scaled by the axis size)."""
    from ring_flash_attn_tpu.parallel.mesh import psum_exact

    mesh = Mesh(devices8[:4], ("x",))

    @partial(shard_map, mesh=mesh, in_specs=(P("x"),), out_specs=P("x"),
             check_vma=False)
    def g(w):
        return jax.grad(lambda w: psum_exact(3.0 * w[0], "x"))(w)

    grad = g(jnp.arange(4, dtype=jnp.float32))
    # true d(psum(3*w_r))/d w_r = 3 on every shard; raw psum would give 12
    assert jnp.allclose(grad, 3.0), grad
