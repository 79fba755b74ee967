"""Continuous-batching scheduler: lifecycle invariants + numerics of the
full drive loop (admission -> prefill -> decode steps -> retirement)
against per-request dense oracles, on the real paged cache."""

import jax
import jax.numpy as jnp
import numpy as np

from ring_flash_attn_tpu.ops import paged
from ring_flash_attn_tpu.serving import PageAllocator
from ring_flash_attn_tpu.serving.scheduler import DecodeScheduler

PS, HKV, HQ, D = 8, 2, 4, 32
PAGES_PER_SEQ = 6  # capacity 48 tokens per request


def _kv(req_id, pos, n=1):
    """Deterministic per-request K/V stream (the 'model')."""
    key = jax.random.fold_in(jax.random.PRNGKey(7), req_id * 1000 + pos)
    k = jax.random.normal(key, (1, HKV, n, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 1), (1, HKV, n, D),
                          jnp.bfloat16)
    return k, v


def _q(req_id, pos):
    key = jax.random.fold_in(jax.random.PRNGKey(11), req_id * 1000 + pos)
    return jax.random.normal(key, (1, HQ, 1, D), jnp.bfloat16)


def _dense_attn(q, k, v):
    qb = np.asarray(q[0], np.float32).reshape(HKV, HQ // HKV, D)
    logits = np.einsum("hgd,hkd->hgk", qb, k) * D**-0.5
    p = np.exp(logits - logits.max(-1, keepdims=True))
    return np.einsum("hgk,hkd->hgd", p / p.sum(-1, keepdims=True), v)


def test_continuous_batching_lifecycle_and_numerics():
    num_pages, max_batch = 20, 2  # tight pool: forces queueing
    alloc = PageAllocator(num_pages, PS)
    sched = DecodeScheduler(alloc, PAGES_PER_SEQ, max_batch, reserve=1)
    cache = paged.paged_init(
        max_batch, HKV, num_pages, PS, PAGES_PER_SEQ, D,
        block_tables=np.zeros((max_batch, PAGES_PER_SEQ), np.int32),
    )

    # 4 requests over 2 lanes; lengths chosen to finish at different steps
    specs = {0: (11, 3), 1: (19, 6), 2: (5, 4), 3: (30, 2)}  # id: (plen, new)
    for rid, (plen, new) in specs.items():
        sched.submit(rid, plen, new)

    dense = {}          # rid -> [k (HKV,T,D), v]
    outs = {}           # rid -> list of (decode out, oracle out)
    pending = {}        # rid -> (k_new, v_new) awaiting device append
    steps = 0
    while not sched.idle:
        steps += 1
        assert steps < 50, "scheduler deadlocked"
        plan = sched.begin_step()
        # 0. execute device-side COW copies surfaced by last step's commits
        if len(plan.cow[0]):
            cache = paged.copy_pages(cache, plan.cow[0], plan.cow[1])
        cache = cache._replace(
            block_tables=jnp.asarray(plan.block_tables),
            seq_lens=jnp.asarray(plan.seq_lens, jnp.int32),
        )
        # 1. append last step's generated K/V (token t's kv lands before
        # the step that computes token t+1)
        appends = [r for r in plan.running if r.req_id in pending]
        if appends:
            k_new = jnp.zeros((max_batch, HKV, 1, D), jnp.bfloat16)
            v_new = jnp.zeros_like(k_new)
            mask = np.zeros((max_batch,), bool)
            for r in appends:
                kn, vn = pending.pop(r.req_id)
                k_new = k_new.at[r.lane].set(kn[0])
                v_new = v_new.at[r.lane].set(vn[0])
                mask[r.lane] = True
            # plan.seq_lens already counts the committed token: rewind the
            # appending lanes so paged_append writes it at lens-1
            rewound = np.asarray(plan.seq_lens) - mask
            cache = cache._replace(seq_lens=jnp.asarray(rewound, jnp.int32))
            cache = paged.paged_append(cache, k_new, v_new, mask=mask)
            assert np.array_equal(np.asarray(cache.seq_lens), plan.seq_lens)

        # 2. prefill newly admitted prompts
        for r in plan.admitted:
            plen = r.prompt_len
            k, v = _kv(r.req_id, 0, plen)
            dense[r.req_id] = [
                np.asarray(k[0], np.float32), np.asarray(v[0], np.float32),
            ]
            outs[r.req_id] = []
            pad = -plen % PS
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            one = cache._replace(
                block_tables=cache.block_tables[r.lane:r.lane + 1],
                seq_lens=cache.seq_lens[r.lane:r.lane + 1],
            )
            one = paged.paged_prefill(
                one, kp, vp, jnp.asarray([plen], jnp.int32)
            )
            cache = cache._replace(k_pages=one.k_pages, v_pages=one.v_pages)

        # 3. one decode step over ALL lanes (static shape, dead lanes ride)
        qs = jnp.zeros((max_batch, HQ, 1, D), jnp.bfloat16)
        for r in plan.running:
            qs = qs.at[r.lane].set(
                _q(r.req_id, dense[r.req_id][0].shape[1])[0]
            )
        out, _ = paged.paged_decode_attention(qs, cache, D**-0.5,
                                              backend="xla")
        for r in plan.running:
            kd, vd = dense[r.req_id]
            ref = _dense_attn(qs[r.lane][None], kd, vd)
            got = np.asarray(out[r.lane], np.float32).reshape(
                HKV, HQ // HKV, D)
            outs[r.req_id].append((got, ref))
            # 4. 'sample' the next token -> its K/V appends NEXT step
            t = kd.shape[1]
            kn, vn = _kv(r.req_id, t)
            dense[r.req_id][0] = np.concatenate(
                [kd, np.asarray(kn[0], np.float32)], axis=1)
            dense[r.req_id][1] = np.concatenate(
                [vd, np.asarray(vn[0], np.float32)], axis=1)
            pending[r.req_id] = (kn, vn)
            sched.commit(r.req_id)

    # every request ran to its token budget and matched its oracle
    for rid, (plen, new) in specs.items():
        assert len(outs[rid]) == new, (rid, len(outs[rid]))
        for got, ref in outs[rid]:
            np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
    # all pages returned
    assert alloc.free_pages == num_pages
    assert steps > max(n for _, n in specs.values()), "no queueing happened"


def test_admission_is_page_gated_fifo():
    alloc = PageAllocator(8, PS)
    sched = DecodeScheduler(alloc, 6, max_batch=4, reserve=0)
    sched.submit(0, 5 * PS, 1)   # 5 pages
    sched.submit(1, 4 * PS, 1)   # 4 pages — must wait (only 3 free)
    sched.submit(2, PS, 1)       # 1 page — fits but must NOT jump the queue
    plan = sched.begin_step()
    assert [r.req_id for r in plan.admitted] == [0]
    assert [r.req_id for r in sched.waiting] == [1, 2]
    sched.commit(0, done=True)
    plan = sched.begin_step()   # 0 retires -> both admitted in order
    assert [r.req_id for r in plan.finished] == [0]
    assert [r.req_id for r in plan.admitted] == [1, 2]


def test_fork_shares_pages_and_cows():
    alloc = PageAllocator(16, PS)
    sched = DecodeScheduler(alloc, 4, max_batch=3)
    sched.submit(0, PS + 2, 10)
    plan = sched.begin_step()
    assert len(plan.admitted) == 1
    sched.commit(0)
    base_free = alloc.free_pages
    f = sched.fork(0, 100)
    assert f.lane != sched._requests[0].lane
    # the partially-filled tail is COWed EAGERLY at fork (one page), so
    # the committed-but-not-yet-appended token's device write cannot
    # collide in the shared page; full pages stay shared at no cost
    assert alloc.free_pages == base_free - 1
    sched.commit(100)                 # appends into the now-private tail
    assert alloc.free_pages == base_free - 1
    plan = sched.begin_step()
    assert len(plan.cow[0]) == 1                   # copy surfaced to driver
    assert {r.req_id for r in plan.running} == {0, 100}
    # distinct tails, shared first page
    t0 = alloc.block_table(sched._requests[0].seq)
    t1 = alloc.block_table(sched._requests[100].seq)
    assert t0[0] == t1[0] and t0[-1] != t1[-1]


def test_fork_aligned_tail_still_cows():
    """A page-aligned fork must STILL COW the tail: the source's pending
    (committed, not-yet-device-written) token occupies the tail page's
    LAST slot, so without the copy both branches' next device appends
    would collide in the shared page."""
    alloc = PageAllocator(16, PS)
    sched = DecodeScheduler(alloc, 4, max_batch=3)
    sched.submit(0, 2 * PS - 1, 10)
    sched.begin_step()
    sched.commit(0)            # seq_len -> 2*PS: aligned, slot pending
    base_free = alloc.free_pages
    sched.fork(0, 100)
    assert alloc.free_pages == base_free - 1       # eager tail copy
    plan = sched.begin_step()
    assert len(plan.cow[0]) == 1                   # surfaced to driver
    t0 = alloc.block_table(sched._requests[0].seq)
    t1 = alloc.block_table(sched._requests[100].seq)
    assert t0[0] == t1[0] and t0[-1] != t1[-1]


def test_capacity_truncates_request():
    """Generation hitting pages_per_seq * page_size is truncated: the
    final token is recorded but gets no cache slot, the request is forced
    done, and begin_step's static tables never overflow."""
    alloc = PageAllocator(16, PS)
    sched = DecodeScheduler(alloc, pages_per_seq=2, max_batch=1)
    sched.submit(0, 2 * PS - 2, 100)   # 2 slots of headroom
    sched.begin_step()
    sched.commit(0)                     # fills slot 2*PS-2
    sched.commit(0)                     # fills the last slot
    assert not sched._requests[0].done
    sched.commit(0)                     # at capacity: truncated + done
    r = sched._requests[0]
    assert r.done and r.generated == 3
    assert alloc.seq_len(r.seq) == 2 * PS
    plan = sched.begin_step()           # retires cleanly, no broadcast
    assert plan.finished and sched.idle
