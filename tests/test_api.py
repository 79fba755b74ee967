"""API-surface tests: the reference's 18 entry points + metadata prep.

Mirrors the reference test files' shapes/patterns (SURVEY.md §4):
- distributed *_func vs monolithic oracle (test_ring_flash_attn_func.py etc.)
- llama3_flash_attn_prepare_cu_seqlens self-consistency WITHOUT any
  distributed init (test_llama3_prepare_cu_seqlens.py:11-26)
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

import ring_flash_attn_tpu as rfa
from ring_flash_attn_tpu.ops import varlen as V
from ring_flash_attn_tpu.parallel import layouts

from oracle import full_attention

W = 8
B, HQ, HKV, S, D = 1, 4, 2, 512, 64


@pytest.fixture(scope="module")
def mesh(devices8):
    return Mesh(devices8, ("sp",))


@pytest.fixture(scope="module")
def data():
    # (B, S, H, D) flash-attn layout
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, HQ, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, HKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, HKV, D), jnp.float32)
    return q, k, v


def _oracle_bshd(q, k, v, causal, segids=None):
    o = full_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        D**-0.5, causal=causal, segids=segids,
    )
    return jnp.swapaxes(o, 1, 2)


def test_public_api_surface():
    """Exactly the reference's exported names exist
    (reference ring_flash_attn/__init__.py)."""
    for base in ("ring_flash_attn", "ring_flash_attn_varlen",
                 "zigzag_ring_flash_attn", "zigzag_ring_flash_attn_varlen",
                 "stripe_flash_attn", "llama3_flash_attn_varlen"):
        for suffix in ("func", "kvpacked_func", "qkvpacked_func"):
            assert hasattr(rfa, f"{base}_{suffix}"), f"{base}_{suffix}"
    assert hasattr(rfa, "llama3_flash_attn_prepare_cu_seqlens")
    assert hasattr(rfa, "substitute_hf_flash_attn")
    assert hasattr(rfa, "update_ring_flash_attn_params")


def test_flash_attn_func_single_device(data):
    q, k, v = data
    out = rfa.flash_attn_func(q, k, v, causal=True)
    ref = _oracle_bshd(q, k, v, causal=True)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5


def test_flash_attn_qkvpacked_and_kvpacked(data):
    q, k, v = data
    kq = jax.random.normal(jax.random.PRNGKey(9), (B, S, HQ, D), jnp.float32)
    qkv = jnp.stack([q, kq, kq], axis=2)  # needs equal head counts
    out = rfa.flash_attn_qkvpacked_func(qkv, causal=True)
    ref = _oracle_bshd(q, kq, kq, causal=True)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5
    kv = jnp.stack([k, v], axis=2)
    out = rfa.flash_attn_kvpacked_func(q, kv, causal=False)
    ref = _oracle_bshd(q, k, v, causal=False)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5


@pytest.mark.parametrize(
    "func_name,tolocal,restore,causal",
    [
        ("ring_flash_attn_func", None, None, False),
        ("ring_flash_attn_func", None, None, True),
        ("zigzag_ring_flash_attn_func", layouts.all_local_zigzag,
         layouts.restore_zigzag, True),
        ("stripe_flash_attn_func", layouts.all_local_stripe,
         layouts.restore_stripe, True),
    ],
)
def test_batch_distributed_funcs(mesh, data, func_name, tolocal, restore,
                                 causal):
    q, k, v = data
    func = getattr(rfa, func_name)
    if tolocal is not None:
        ql, kl, vl = (tolocal(x, W, axis=1) for x in (q, k, v))
    else:
        ql, kl, vl = q, k, v

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"), check_vma=False,
    )
    def f(q, k, v):
        return func(q, k, v, causal=causal, group="sp")

    out = jax.jit(f)(ql, kl, vl)
    if restore is not None:
        out = restore(out, W, axis=1)
    ref = _oracle_bshd(q, k, v, causal=causal)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5


CU_GLOBAL = np.array([0, 160, 352, 512])


def test_ring_varlen_func(mesh, data):
    q, k, v = data
    q1, k1, v1 = (x[0] for x in data)  # (S, H, D) packed
    cu_local = jnp.asarray(CU_GLOBAL // W, jnp.int32)

    def tolocal(x):
        return jnp.concatenate(
            [jnp.asarray(V.extract_local_ring_varlen(np.asarray(x), CU_GLOBAL,
                                                     r, W, axis=0))
             for r in range(W)], axis=0)

    ql, kl, vl = map(tolocal, (q1, k1, v1))

    @partial(shard_map, mesh=mesh, in_specs=(P("sp"), P("sp"), P("sp")),
             out_specs=P("sp"), check_vma=False)
    def f(q, k, v):
        return rfa.ring_flash_attn_varlen_func(
            q, k, v, cu_local, causal=True, group="sp"
        )

    out = jax.jit(f)(ql, kl, vl)
    segids = jnp.asarray(V.cu_seqlens_to_segids(jnp.asarray(CU_GLOBAL), S))
    ref = _oracle_bshd(q, k, v, causal=True, segids=segids)[0]
    # restore
    out_g = np.zeros_like(np.asarray(out))
    t_local = S // W
    for r in range(W):
        shard = np.asarray(out)[r * t_local : (r + 1) * t_local]
        off = 0
        for i in range(len(CU_GLOBAL) - 1):
            li = (CU_GLOBAL[i + 1] - CU_GLOBAL[i]) // W
            out_g[CU_GLOBAL[i] + r * li : CU_GLOBAL[i] + (r + 1) * li] = (
                shard[off : off + li]
            )
            off += li
    assert np.max(np.abs(out_g - np.asarray(ref))) < 2e-5


def test_llama3_varlen_func(mesh, data):
    q, k, v = data
    q1, k1, v1 = (x[0] for x in data)
    l = S // W

    # per-rank metadata (host, like the reference's per-batch DATA_PARAMS)
    metas = [
        rfa.llama3_flash_attn_prepare_cu_seqlens(CU_GLOBAL, True, r, W)
        for r in range(W)
    ]
    # all ranks must agree on array SHAPES for SPMD; pad cu arrays to the max
    max_len = max(len(m[0]) for m in metas)

    outs = []
    # run per-rank with its own metadata via per-rank shard selection:
    # simplest faithful emulation — one shard_map call per rank's metadata is
    # wrong; instead pass segids computed outside (the api already supports
    # that path through llama3_attention). Here we emulate the reference
    # test by computing q_segids per rank and concatenating.
    from ring_flash_attn_tpu.parallel.llama3 import llama3_attention

    seg_all = []
    for r in range(W):
        cu_q, cu_k, _, _, k_slice = metas[r]
        seg_local = np.searchsorted(cu_q, np.arange(l), side="right") - 1
        seg_all.append(k_slice.start + cu_k[seg_local])
    seg_all = jnp.asarray(np.concatenate(seg_all), jnp.int32)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, None, "sp", None),) * 3 + (P("sp"),),
             out_specs=(P(None, None, "sp", None), P(None, None, "sp")),
             check_vma=False)
    def f(q, k, v, seg):
        return llama3_attention(
            q, k, v, seg, scale=D**-0.5, causal=True, heads_k_stride=1,
            axis_name="sp",
        )

    qi, ki, vi = (jnp.swapaxes(x, 1, 2) for x in data)
    out, _ = jax.jit(f)(qi, ki, vi, seg_all)
    segids = jnp.asarray(V.cu_seqlens_to_segids(jnp.asarray(CU_GLOBAL), S))
    ref = full_attention(qi, ki, vi, D**-0.5, causal=True, segids=segids)
    assert jnp.max(jnp.abs(out - ref)) < 2e-5


def test_llama3_prepare_cu_seqlens_consistency():
    """The reference's metadata self-consistency test, no distributed init
    (reference test_llama3_prepare_cu_seqlens.py:11-26)."""
    cu = np.array([0, 13, 56, 200, 300, 1024])
    world = 8
    for causal in (True, False):
        for rank in range(world):
            cu_q, cu_k, max_q, max_k, k_slice = (
                rfa.llama3_flash_attn_prepare_cu_seqlens(
                    cu, causal, rank, world
                )
            )
            assert cu_q[0] == 0 and cu_k[0] == 0
            assert (np.diff(cu_q) > 0).all(), (rank, causal, cu_q)
            assert (np.diff(cu_k) > 0).all(), (rank, causal, cu_k)
            assert max_q == np.diff(cu_q).max()
            assert max_k == np.diff(cu_k).max()
            assert cu_q[-1] == 1024 // world
            # the gathered-k slice matches the k cu range
            assert k_slice.stop - k_slice.start == cu_k[-1]
            if causal:
                assert k_slice.stop == (rank + 1) * (1024 // world)


def test_unsupported_kwargs_raise(data):
    q, k, v = data
    with pytest.raises(NotImplementedError):
        # windows require causal=True (varlen windows themselves are now
        # supported — an extension over reference README.md:159)
        rfa.flash_attn_varlen_func(
            q.reshape(-1, HQ, D), k.reshape(-1, HKV, D),
            v.reshape(-1, HKV, D), jnp.asarray([0, q.shape[1]]),
            causal=False, window_size=(64, 0),
        )
    with pytest.raises(NotImplementedError):
        # zigzag/stripe keep causal (left, 0)-only windows; the ring now
        # forwards full (left, right) semantics like the reference's
        # batch ring (r5, reference ring_flash_attn.py:44-52)
        rfa.zigzag_ring_flash_attn_func(q, k, v, causal=True,
                                        window_size=(128, 128))



def test_sliding_window_flash(data):
    q, k, v = data
    window = 64
    out = rfa.flash_attn_func(q, k, v, causal=True, window_size=(window, 0))
    # oracle with explicit band mask
    qi, ki, vi = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    g = HQ // HKV
    qf = qi.astype(jnp.float32).reshape(B, HKV, g, S, D)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qf, ki) * D**-0.5
    i = jnp.arange(S)
    allowed = (i[:, None] >= i[None, :]) & ((i[:, None] - i[None, :]) <= window)
    logits = jnp.where(allowed, logits, -jnp.inf)
    p = jax.nn.softmax(logits, -1)
    ref = jnp.einsum("bhgqk,bhkd->bhgqd", p, vi).reshape(B, HQ, S, D)
    assert jnp.max(jnp.abs(jnp.swapaxes(out, 1, 2) - ref)) < 2e-5

    # grads agree with autodiff through the banded oracle
    dout = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(
            rfa.flash_attn_func(q, k, v, causal=True,
                                window_size=(window, 0)) * dout
        )

    def loss_ref(q, k, v):
        qi, ki, vi = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        qf = qi.astype(jnp.float32).reshape(B, HKV, g, S, D)
        logits = jnp.einsum("bhgqd,bhkd->bhgqk", qf, ki) * D**-0.5
        logits = jnp.where(allowed, logits, -jnp.inf)
        p = jax.nn.softmax(logits, -1)
        o = jnp.einsum("bhgqk,bhkd->bhgqd", p, vi).reshape(B, HQ, S, D)
        return jnp.sum(jnp.swapaxes(o, 1, 2) * dout)

    g1 = jax.grad(loss, (0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert jnp.max(jnp.abs(a - b)) < 1e-4


@pytest.mark.parametrize("win", [(64, 32), (-1, 32), (64, -1), (100, 0)])
def test_noncausal_window_flash(data, win):
    """Non-causal (l, r) windows on the single-device path — flash-attn
    window semantics the reference forwards verbatim
    (reference ring_flash_attn.py:44-52); round-4 parity item."""
    q, k, v = data
    wl, wr = win
    out = rfa.flash_attn_func(q, k, v, causal=False, window_size=win)

    qi, ki, vi = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    g = HQ // HKV
    i = jnp.arange(S)
    diff = i[:, None] - i[None, :]
    allowed = jnp.ones((S, S), bool)
    if wl >= 0:
        allowed &= diff <= wl
    if wr >= 0:
        allowed &= diff >= -wr

    def ref_out(qi, ki, vi):
        qf = qi.astype(jnp.float32).reshape(B, HKV, g, S, D)
        logits = jnp.einsum("bhgqd,bhkd->bhgqk", qf, ki) * D**-0.5
        logits = jnp.where(allowed, logits, -jnp.inf)
        p = jax.nn.softmax(logits, -1)
        return jnp.einsum("bhgqk,bhkd->bhgqd", p, vi).reshape(B, HQ, S, D)

    ref = ref_out(qi, ki, vi)
    assert jnp.max(jnp.abs(jnp.swapaxes(out, 1, 2) - ref)) < 2e-5

    dout = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(
            rfa.flash_attn_func(q, k, v, causal=False, window_size=win)
            * dout
        )

    def loss_ref(q, k, v):
        qi, ki, vi = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        return jnp.sum(
            jnp.swapaxes(ref_out(qi, ki, vi), 1, 2) * dout
        )

    g1 = jax.grad(loss, (0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert jnp.max(jnp.abs(a - b)) < 1e-4
