"""Native page allocator: differential vs the Python twin, invariants,
and an end-to-end COW beam-search decode against a dense oracle."""

import numpy as np
import pytest

from ring_flash_attn_tpu.serving import (
    PageAllocatorError,
    PyPageAllocator,
    gather_block_tables,
)
from ring_flash_attn_tpu.serving.page_allocator import (
    NativePageAllocator,
    _native_lib,
)

native_available = _native_lib() is not None


def _mk(num_pages=64, page_size=16):
    allocs = [PyPageAllocator(num_pages, page_size)]
    if native_available:
        allocs.append(NativePageAllocator(num_pages, page_size))
    return allocs


@pytest.mark.skipif(not native_available, reason="no C++ toolchain")
def test_native_matches_python_randomized():
    rng = np.random.default_rng(0)
    py, nat = PyPageAllocator(128, 8), NativePageAllocator(128, 8)
    live = []
    for _ in range(2000):
        op = rng.integers(0, 6)
        if op == 5 and live:  # prefix-sharing alloc
            sid = int(rng.choice(live))
            pref = int(rng.integers(0, py.seq_len(sid) + 1))
            total = pref + int(rng.integers(0, 20))
            try:
                a = py.alloc_prefix_seq(sid, pref, total)
            except PageAllocatorError:
                with pytest.raises(PageAllocatorError):
                    nat.alloc_prefix_seq(sid, pref, total)
                continue
            assert a == nat.alloc_prefix_seq(sid, pref, total)
            live.append(a)
        elif op == 0 or not live:  # alloc
            n = int(rng.integers(0, 40))
            try:
                a = py.alloc_seq(n)
            except PageAllocatorError:
                with pytest.raises(PageAllocatorError):
                    nat.alloc_seq(n)
                continue
            b = nat.alloc_seq(n)
            assert a == b
            live.append(a)
        elif op == 1:  # append
            sid = int(rng.choice(live))
            try:
                pa, ca = py.append_token(sid)
            except PageAllocatorError:
                with pytest.raises(PageAllocatorError):
                    nat.append_token(sid)
                continue
            pb, cb = nat.append_token(sid)
            assert (pa, ca) == (pb, cb)
        elif op == 2:  # fork
            sid = int(rng.choice(live))
            a, b = py.fork_seq(sid), nat.fork_seq(sid)
            assert a == b
            live.append(a)
        elif op == 3:  # eager tail COW (fork-time protocol)
            sid = int(rng.choice(live))
            try:
                a = py.cow_tail(sid)
            except PageAllocatorError:  # OOM: both sides refuse, unchanged
                with pytest.raises(PageAllocatorError):
                    nat.cow_tail(sid)
                continue
            assert a == nat.cow_tail(sid)
        else:  # free
            sid = live.pop(int(rng.integers(0, len(live))))
            py.free_seq(sid)
            nat.free_seq(sid)
        assert py.free_pages == nat.free_pages
        for sid in live:
            assert py.seq_len(sid) == nat.seq_len(sid)
            assert np.array_equal(py.block_table(sid), nat.block_table(sid))


@pytest.mark.parametrize("alloc", _mk(), ids=lambda a: type(a).__name__)
def test_basic_lifecycle(alloc):
    ps = alloc.page_size
    assert alloc.free_pages == alloc.num_pages
    s = alloc.alloc_seq(3 * ps + 1)
    assert alloc.free_pages == alloc.num_pages - 4
    assert alloc.seq_len(s) == 3 * ps + 1
    assert len(alloc.block_table(s)) == 4
    # fill the partial page: no new pages until it rolls over
    for i in range(ps - 1):
        page, cow = alloc.append_token(s)
        assert cow is None and page == alloc.block_table(s)[-1]
    assert alloc.free_pages == alloc.num_pages - 4
    page, cow = alloc.append_token(s)
    assert cow is None and len(alloc.block_table(s)) == 5
    alloc.free_seq(s)
    assert alloc.free_pages == alloc.num_pages
    with pytest.raises(PageAllocatorError):
        alloc.seq_len(s)


@pytest.mark.parametrize("alloc", _mk(), ids=lambda a: type(a).__name__)
def test_oom_leaves_allocator_unchanged(alloc):
    ps = alloc.page_size
    s = alloc.alloc_seq((alloc.num_pages - 1) * ps)
    with pytest.raises(PageAllocatorError):
        alloc.alloc_seq(2 * ps)  # needs 2, only 1 free
    assert alloc.free_pages == 1
    s2 = alloc.alloc_seq(ps)  # the 1 remaining fits
    with pytest.raises(PageAllocatorError):
        alloc.append_token(s)  # rolls to a new page: OOM
    alloc.free_seq(s2)
    page, cow = alloc.append_token(s)  # now fits
    assert cow is None
    assert alloc.seq_len(s) == (alloc.num_pages - 1) * ps + 1


@pytest.mark.parametrize("alloc", _mk(), ids=lambda a: type(a).__name__)
def test_fork_shares_then_cow_on_append(alloc):
    ps = alloc.page_size
    s1 = alloc.alloc_seq(ps + 3)  # 2 pages, tail partially filled
    base = alloc.free_pages
    s2 = alloc.fork_seq(s1)
    assert alloc.free_pages == base  # fork allocates nothing
    assert np.array_equal(alloc.block_table(s1), alloc.block_table(s2))
    tail = int(alloc.block_table(s1)[-1])
    assert alloc.page_refcount(tail) == 2
    # appending to the fork COWs the shared tail only
    page, cow = alloc.append_token(s2)
    assert cow == (tail, page) and page != tail
    assert alloc.free_pages == base - 1
    assert alloc.page_refcount(tail) == 1
    assert alloc.block_table(s1)[-1] == tail
    assert alloc.block_table(s2)[-1] == page
    # first (full) page still shared — no COW for either on later appends
    assert alloc.page_refcount(int(alloc.block_table(s1)[0])) == 2
    _, cow = alloc.append_token(s1)
    assert cow is None
    alloc.free_seq(s1)
    alloc.free_seq(s2)
    assert alloc.free_pages == alloc.num_pages


def test_cow_beam_search_decode_matches_dense():
    """Prefix-shared two-beam decode through the REAL paged cache: fork,
    COW copies applied with ops.paged.copy_pages, decode == dense oracle."""
    import jax
    import jax.numpy as jnp

    from ring_flash_attn_tpu.ops import paged

    ps, hkv, hq, d = 8, 2, 4, 32
    prefix, steps = 3 * ps + 5, 6
    pages_per_seq = 8
    alloc = _mk(num_pages=64, page_size=ps)[-1]  # native when available

    cache = paged.paged_init(2, hkv, 64, ps, pages_per_seq, d)
    key = iter(jax.random.split(jax.random.PRNGKey(0), 1024))

    # beam 0: prefill the shared prefix (padded to a page multiple for the
    # bulk write; reads mask by seq_lens)
    s0 = alloc.alloc_seq(prefix)
    kp = jax.random.normal(next(key), (1, hkv, prefix, d), jnp.bfloat16)
    vp = jax.random.normal(next(key), (1, hkv, prefix, d), jnp.bfloat16)
    dense_k = [np.asarray(kp[0], np.float32)]  # per-beam dense mirrors
    dense_v = [np.asarray(vp[0], np.float32)]
    pad = -prefix % ps
    kp = jnp.pad(kp, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(vp, ((0, 0), (0, 0), (0, pad), (0, 0)))

    # prefill through a 1-row view of the (shared) page pool, then widen
    # the table/len arrays to 2 beams below
    tables, lens = gather_block_tables(alloc, [s0], pages_per_seq)
    cache = cache._replace(
        block_tables=jnp.asarray(tables),
        seq_lens=jnp.zeros((1,), jnp.int32),
    )
    cache = paged.paged_prefill(
        cache, kp, vp, jnp.asarray([prefix], jnp.int32)
    )

    # fork beam 1 off beam 0 (shares every page incl. the partial tail)
    s1 = alloc.fork_seq(s0)
    dense_k.append(dense_k[0].copy())
    dense_v.append(dense_v[0].copy())
    sids = [s0, s1]

    for _ in range(steps):
        k_new = jax.random.normal(next(key), (2, hkv, 1, d), jnp.bfloat16)
        v_new = jax.random.normal(next(key), (2, hkv, 1, d), jnp.bfloat16)
        cows = []
        for b, sid in enumerate(sids):
            _, cow = alloc.append_token(sid)
            if cow:
                cows.append(cow)
            dense_k[b] = np.concatenate(
                [dense_k[b], np.asarray(k_new[b], np.float32)], axis=1
            )
            dense_v[b] = np.concatenate(
                [dense_v[b], np.asarray(v_new[b], np.float32)], axis=1
            )
        if cows:
            cache = paged.copy_pages(
                cache, [c[0] for c in cows], [c[1] for c in cows]
            )
        tables, lens = gather_block_tables(alloc, sids, pages_per_seq)
        # the allocator's tables/lens REPLACE the cache's own counters:
        # paged_append only writes the new token at lens-1
        cache = cache._replace(
            block_tables=jnp.asarray(tables),
            seq_lens=jnp.asarray(lens - 1, jnp.int32),
        )
        cache = paged.paged_append(cache, k_new, v_new)

    # decode both beams vs the dense oracle
    q = jax.random.normal(next(key), (2, hq, 1, d), jnp.bfloat16)
    out, lse = paged.paged_decode_attention(q, cache, d**-0.5, backend="xla")
    total = prefix + steps
    for b in range(2):
        qb = np.asarray(q[b], np.float32).reshape(hkv, hq // hkv, d)
        kb, vb = dense_k[b], dense_v[b]  # (hkv, total, d)
        logits = np.einsum("hgd,hkd->hgk", qb, kb) * d**-0.5
        p = np.exp(logits - logits.max(-1, keepdims=True))
        ref = np.einsum("hgk,hkd->hgd", p / p.sum(-1, keepdims=True), vb)
        got = np.asarray(out[b], np.float32).reshape(hkv, hq // hkv, d)
        assert kb.shape[1] == total
        np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
    # beams diverged: tails differ, prefix pages shared
    t0, t1 = alloc.block_table(s0), alloc.block_table(s1)
    assert t0[0] == t1[0] and t0[-1] != t1[-1]
