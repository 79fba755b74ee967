"""Paged KV cache + paged decode attention vs the dense oracle.

Serving-side extension (the reference has no inference path at all): the
cache lives in a global page pool with per-sequence block tables; the
Pallas kernel streams pages via scalar-prefetched table lookups."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ring_flash_attn_tpu.ops.paged import (
    paged_append,
    paged_decode_attention,
    paged_init,
    paged_prefill,
)

B, HQ, HKV, D = 2, 4, 2, 64
PS = 128  # page size
NPAGES_SEQ = 4
S = PS * NPAGES_SEQ
SCALE = D**-0.5


def _dense_ref(q, k, v, lens, softcap=None):
    """Masked decode attention oracle on dense (B, Hkv, S, D)."""
    b, hq, tq, d = q.shape
    g = hq // HKV
    qf = q.astype(jnp.float32).reshape(b, HKV, g * tq, d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32)) * SCALE
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    valid = jnp.arange(k.shape[2])[None, None, None, :] < lens[:, None, None, None]
    logits = jnp.where(valid, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    lse = jax.scipy.special.logsumexp(
        jnp.where(valid, logits, -jnp.inf), axis=-1
    )
    return out.reshape(b, hq, tq, d), lse.reshape(b, hq, tq)


@pytest.fixture(scope="module")
def filled():
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    lens = jnp.asarray([300, 512 - 17 * PS // PS], jnp.int32)
    lens = jnp.asarray([300, 450], jnp.int32)
    # shuffled block tables: pages deliberately non-contiguous
    rng = np.random.RandomState(0)
    perm = rng.permutation(B * NPAGES_SEQ).reshape(B, NPAGES_SEQ)
    cache = paged_init(
        B, HKV, B * NPAGES_SEQ, PS, NPAGES_SEQ, D, dtype=jnp.float32,
        block_tables=perm,
    )
    cache = paged_prefill(cache, k, v, lens)
    return cache, k, v, lens


def test_prefill_roundtrip(filled):
    from ring_flash_attn_tpu.ops.paged import paged_gather_dense

    cache, k, v, lens = filled
    kd, vd = paged_gather_dense(cache)
    # valid positions must round-trip exactly
    for b in range(B):
        n = int(lens[b])
        assert jnp.array_equal(kd[b, :, :n], k[b, :, :n])
        assert jnp.array_equal(vd[b, :, :n], v[b, :, :n])


@pytest.mark.parametrize("softcap", [None, 12.0])
def test_paged_decode_xla_vs_oracle(filled, softcap):
    cache, k, v, lens = filled
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    ro, rl = _dense_ref(q, k, v, lens, softcap)
    go, gl = paged_decode_attention(q, cache, SCALE, softcap=softcap,
                                    backend="xla")
    assert jnp.max(jnp.abs(go - ro)) < 1e-5
    assert jnp.max(jnp.abs(gl - rl)) < 1e-5


@pytest.mark.parametrize("softcap", [None, 12.0])
def test_paged_decode_pallas_vs_xla(filled, softcap):
    cache, k, v, lens = filled
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    ro, rl = paged_decode_attention(q, cache, SCALE, softcap=softcap,
                                    backend="xla")
    go, gl = paged_decode_attention(q, cache, SCALE, softcap=softcap,
                                    backend="pallas_interpret")
    assert jnp.max(jnp.abs(go - ro)) < 5e-3
    assert jnp.max(jnp.abs(gl - rl)) < 5e-3


def test_paged_append_decode_steps(filled):
    """A few autoregressive steps: append one token per sequence, decode,
    compare against the dense oracle each step."""
    cache, k, v, lens = filled
    key = jax.random.PRNGKey(7)
    kd, vd = jnp.array(k), jnp.array(v)
    step_append = jax.jit(paged_append)
    for step in range(3):
        key, k1, k2, k3 = jax.random.split(key, 4)
        knew = jax.random.normal(k1, (B, HKV, 1, D), jnp.float32)
        vnew = jax.random.normal(k2, (B, HKV, 1, D), jnp.float32)
        cache = step_append(cache, knew, vnew)
        # mirror into the dense copy at each sequence's position
        for b in range(B):
            pos = int(lens[b]) + step
            kd = kd.at[b, :, pos].set(knew[b, :, 0])
            vd = vd.at[b, :, pos].set(vnew[b, :, 0])
        q = jax.random.normal(k3, (B, HQ, 1, D), jnp.float32)
        ro, rl = _dense_ref(q, kd, vd, lens + step + 1)
        go, gl = paged_decode_attention(q, cache, SCALE, backend="xla")
        assert jnp.max(jnp.abs(go - ro)) < 1e-5, step
        po, plse = paged_decode_attention(q, cache, SCALE,
                                          backend="pallas_interpret")
        assert jnp.max(jnp.abs(po - ro)) < 5e-3, step


def test_paged_lse_merge_contract(filled):
    """The (out, lse) partials from two disjoint caches merge to the
    attention over their union — the sequence-sharded serving contract."""
    from ring_flash_attn_tpu.ops.merge import merge_partials

    cache, k, v, lens = filled
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)
    half = S // 2
    lens_a = jnp.minimum(lens, half)
    lens_b = jnp.maximum(lens - half, 0)

    ca = paged_init(B, HKV, B * NPAGES_SEQ, PS, NPAGES_SEQ, D, jnp.float32)
    ca = paged_prefill(ca, k[:, :, :half], v[:, :, :half], lens_a)
    cb = paged_init(B, HKV, B * NPAGES_SEQ, PS, NPAGES_SEQ, D, jnp.float32)
    cb = paged_prefill(cb, k[:, :, half:], v[:, :, half:], lens_b)

    oa, la = paged_decode_attention(q, ca, SCALE, backend="xla")
    ob, lb = paged_decode_attention(q, cb, SCALE, backend="xla")
    out, _ = merge_partials(oa, la, ob, lb)
    ro, _ = _dense_ref(q, k, v, lens)
    assert jnp.max(jnp.abs(out - ro)) < 1e-5


# ---------------------------------------------------------------------------
# Quantized paged cache (int8/fp8 pages + per-token scales)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("qdtype,tol", [("int8", 0.02), ("fp8_e4m3", 0.12)])
def test_quant_paged_decode_vs_oracle(filled, qdtype, tol):
    from ring_flash_attn_tpu.ops.paged import (
        paged_quant_init, paged_quant_prefill, paged_quant_decode_attention,
    )

    cache_f, k, v, lens = filled
    rng = np.random.RandomState(1)
    perm = rng.permutation(B * NPAGES_SEQ).reshape(B, NPAGES_SEQ)
    qc = paged_quant_init(B, HKV, B * NPAGES_SEQ, PS, NPAGES_SEQ, D,
                          qdtype=qdtype, block_tables=perm)
    qc = paged_quant_prefill(qc, k, v, lens)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, 1, D), jnp.float32)

    ro, rl = _dense_ref(q, k, v, lens)
    go, gl = paged_quant_decode_attention(q, qc, SCALE, backend="xla")
    assert jnp.max(jnp.abs(go - ro)) < tol, qdtype
    po, plse = paged_quant_decode_attention(q, qc, SCALE,
                                            backend="pallas_interpret")
    # pallas vs xla on the SAME quantized cache: tight (the production
    # kernel dequantizes V to bf16 for PV — same math as the XLA path;
    # flipping paged._INT8_NATIVE_PV adds ~1e-2 of p-quantization error,
    # a measured-slower experiment, so it is not the default)
    assert jnp.max(jnp.abs(po - go)) < 5e-3
    assert jnp.max(jnp.abs(plse - gl)) < 5e-3


def test_quant_paged_append(filled):
    from ring_flash_attn_tpu.ops.paged import (
        paged_quant_init, paged_quant_prefill, paged_quant_append,
        paged_quant_decode_attention,
    )

    _, k, v, lens = filled
    qc = paged_quant_init(B, HKV, B * NPAGES_SEQ, PS, NPAGES_SEQ, D)
    qc = paged_quant_prefill(qc, k, v, lens)
    knew = jax.random.normal(jax.random.PRNGKey(5), (B, HKV, 1, D),
                             jnp.float32)
    vnew = jax.random.normal(jax.random.PRNGKey(6), (B, HKV, 1, D),
                             jnp.float32)
    qc = paged_quant_append(qc, knew, vnew)
    kd, vd = jnp.array(k), jnp.array(v)
    for b in range(B):
        pos = int(lens[b])
        kd = kd.at[b, :, pos].set(knew[b, :, 0])
        vd = vd.at[b, :, pos].set(vnew[b, :, 0])
    q = jax.random.normal(jax.random.PRNGKey(7), (B, HQ, 1, D), jnp.float32)
    ro, _ = _dense_ref(q, kd, vd, lens + 1)
    go, _ = paged_quant_decode_attention(q, qc, SCALE, backend="xla")
    assert jnp.max(jnp.abs(go - ro)) < 0.02


def test_paged_append_capacity_guard(filled):
    """Appending past capacity must not clobber live pages: the write is
    dropped and seq_lens pins at capacity (ADVICE r2)."""
    cache, k, v, lens = filled
    cap = cache.block_tables.shape[1] * cache.page_size
    full = cache._replace(seq_lens=jnp.full_like(cache.seq_lens, cap))
    kn = jnp.full((B, HKV, 1, D), 7.0, jnp.float32)
    out = paged_append(full, kn, kn)
    assert int(out.seq_lens.max()) == cap
    np.testing.assert_array_equal(
        np.asarray(out.k_pages), np.asarray(full.k_pages)
    )
    np.testing.assert_array_equal(
        np.asarray(out.v_pages), np.asarray(full.v_pages)
    )


def test_paged_decode_dead_row_backend_parity(filled):
    """seq_lens==0 rows: XLA oracle and Pallas kernel must both return
    out=0 / lse=NEG_INF (ADVICE r2)."""
    from ring_flash_attn_tpu.ops.mask import NEG_INF

    cache, k, v, lens = filled
    dead = cache._replace(
        seq_lens=cache.seq_lens.at[0].set(0)
    )
    q = jax.random.normal(jax.random.PRNGKey(5), (B, HQ, 1, D), jnp.float32)
    ox, lx = paged_decode_attention(q, dead, SCALE, backend="xla")
    op, lp = paged_decode_attention(
        q, dead, SCALE, backend="pallas_interpret"
    )
    np.testing.assert_array_equal(np.asarray(ox[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(op[0]), 0.0)
    assert float(lx[0].max()) <= NEG_INF / 2
    assert float(lp[0].max()) <= NEG_INF / 2
    np.testing.assert_allclose(
        np.asarray(ox[1]), np.asarray(op[1]), atol=2e-3, rtol=2e-3
    )


def test_multi_query_row_causal_counts():
    """new_counts row causality (speculative verification): row t of a
    Tq-query decode attends exactly the first seq_len-(counts-1-t)
    positions. Pallas (interpret) and XLA agree with a hand-built dense
    oracle, including a padding row and a plain (counts=None) call."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ring_flash_attn_tpu.ops import paged

    B, HKV, G, TQ, PS, PPS, D = 2, 2, 2, 3, 8, 4, 16
    HQ = HKV * G
    key = jax.random.PRNGKey(0)
    cache = paged.paged_init(B, HKV, B * PPS, PS, PPS, D,
                             dtype=jnp.float32)
    S = PPS * PS
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D))
    lens = jnp.asarray([19, 9], jnp.int32)  # incl. the TQ new tokens
    cache = paged.paged_prefill(cache, k, v, lens)
    q = jax.random.normal(key, (B, HQ, TQ, D))
    counts = jnp.asarray([3, 2], jnp.int32)  # lane 1 has a padding row
    scale = D**-0.5

    out_p, lse_p = paged.paged_decode_attention(
        q, cache, scale, backend="pallas_interpret", new_counts=counts)
    out_x, lse_x = paged.paged_decode_attention(
        q, cache, scale, backend="xla", new_counts=counts)

    # dense oracle with explicit per-row bounds
    for b in range(B):
        for t in range(TQ):
            bound = int(lens[b]) - max(0, int(counts[b]) - 1 - t)
            for h in range(HQ):
                kk = np.asarray(k[b, h // G, :bound])
                vv = np.asarray(v[b, h // G, :bound])
                s = kk @ np.asarray(q[b, h, t]) * scale
                p = np.exp(s - s.max())
                want = (p / p.sum()) @ vv
                got_p = np.asarray(out_p[b, h, t])
                got_x = np.asarray(out_x[b, h, t])
                # kernel matmuls run bf16 on the MXU by design
                np.testing.assert_allclose(got_p, want, atol=1e-2,
                                           err_msg=f"pallas b{b} t{t}")
                np.testing.assert_allclose(got_x, want, atol=1e-5,
                                           err_msg=f"xla b{b} t{t}")
                want_lse = s.max() + np.log(np.exp(s - s.max()).sum())
                np.testing.assert_allclose(np.asarray(lse_p[b, h, t]),
                                           want_lse, atol=1e-2)
                np.testing.assert_allclose(np.asarray(lse_x[b, h, t]),
                                           want_lse, atol=1e-5)

    # counts=None on Tq>1 keeps the old no-row-causality semantics
    out_n, _ = paged.paged_decode_attention(
        q, cache, scale, backend="pallas_interpret")
    out_nx, _ = paged.paged_decode_attention(q, cache, scale, backend="xla")
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_nx),
                               atol=1e-2)
