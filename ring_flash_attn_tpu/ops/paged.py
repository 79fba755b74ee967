"""Paged KV cache + paged decode attention (TPU-native serving extension).

The reference stops at training-time context parallelism; production
serving needs a vLLM-style paged KV cache: the cache lives in a global
pool of fixed-size pages, sequences map logical blocks to arbitrary pages
through a block table, and decode attention gathers pages by table lookup.
On TPU the natural formulation is a Pallas kernel whose page indices ride
as SCALAR-PREFETCHED block tables driving the BlockSpec index maps — the
kernel streams exactly the pages a sequence owns, in order, with zero
gather materialization (the same scalar-prefetch machinery as the
triangular causal grids in ops/pallas_fwd.py).

Layout:
  k_pages, v_pages  (num_pages, Hkv, page_size, D)  — global page pool
                    (page-major: one page's ALL heads are contiguous, so
                    the kernel fetches them in a single per-step DMA —
                    head-major pools make each step a tiny per-head copy
                    and leave the decode DMA-latency-bound)
  block_tables      (B, pages_per_seq) int32        — logical -> physical
  seq_lens          (B,) int32                      — valid tokens per seq

`paged_decode_attention` returns fp32 ``(out, lse)`` partials, the same
mergeable contract as quant_decode_attention (ops/quant.py), so paged
caches compose with sequence-sharded decode via merge_partials.

The XLA path (backend="xla") gathers pages dense and is the numerics
oracle; the Pallas kernel is the production path. Unwritten page slots may
hold garbage — reads mask by seq_lens, and block_tables must point at
valid (allocatable) page ids everywhere (pad with any real page id).

Measured on v5e (B=4, 32q/8kv heads, D=128, page_size 256, 8k contexts,
on-device trace timing): bf16 pages 185.6 us/step = 88% of the HBM
roofline; int8 pages 125.6 us = 67%. The kernel streams F pages per grid
step, folds all KV heads into one grid step, and computes each page as a
single block-diagonal all-heads matmul (static head-match mask) — see
docs/DESIGN.md §7c for the progression from the r2 kernel's ~1 ms.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mask import NEG_INF

# int8 paged decode: run the PV matmul int8-native (quantize p per row)
# instead of dequantizing the V page to bf16. A/B-toggled by
# tools/exp_int8_pv.py; the measured winner is the default: dequant PV
# (110.7 vs 117.8 us at B=4x8k pg=256 — the V int8->bf16 cast fuses into
# the MXU operand load, while p's rowmax/divide/round chain is real VPU
# work; round-4 negative result, DESIGN.md 7c2).
_INT8_NATIVE_PV = False


class PagedKVCache(NamedTuple):
    k_pages: jnp.ndarray  # (num_pages, Hkv, page_size, D)
    v_pages: jnp.ndarray  # (num_pages, Hkv, page_size, D)
    block_tables: jnp.ndarray  # (B, pages_per_seq) int32
    seq_lens: jnp.ndarray  # (B,) int32

    @property
    def page_size(self):
        return self.k_pages.shape[2]


def paged_init(batch, hkv, num_pages, page_size, pages_per_seq, d,
               dtype=jnp.bfloat16, block_tables=None):
    """Empty cache. Default block_tables gives sequence b the contiguous
    page range [b * pages_per_seq, (b+1) * pages_per_seq) — callers with a
    real allocator pass their own tables."""
    if block_tables is None:
        assert num_pages >= batch * pages_per_seq
        block_tables = (
            jnp.arange(batch * pages_per_seq, dtype=jnp.int32)
            .reshape(batch, pages_per_seq)
        )
    z = jnp.zeros((num_pages, hkv, page_size, d), dtype)
    return PagedKVCache(
        z, jnp.zeros_like(z), jnp.asarray(block_tables, jnp.int32),
        jnp.zeros((batch,), jnp.int32),
    )


def paged_prefill(cache: PagedKVCache, k, v, seq_lens):
    """Bulk-write dense k/v (B, Hkv, S, D) into the cache's pages and set
    seq_lens. S must be a multiple of page_size; positions past seq_lens[b]
    are written but masked at read.

    Out-of-range page ids in block_tables (>= num_pages) DROP their write
    (jax scatter mode="drop") instead of clamping onto the last page —
    callers with fewer real pages than S/page_size (e.g. a chunked
    prefill's padded final chunk) pad the table with num_pages."""
    _, hkv, ps, d = cache.k_pages.shape
    b, _, s, _ = k.shape
    assert s % ps == 0, (s, ps)
    nblk = s // ps
    bt = cache.block_tables[:, :nblk]  # (B, nblk)

    def scatter(pages, x):
        # x (B, Hkv, S, D) -> blocks (B, nblk, Hkv, ps, D)
        xb = x.reshape(b, hkv, nblk, ps, d).transpose(0, 2, 1, 3, 4)
        return pages.at[bt].set(xb.astype(pages.dtype), mode="drop")

    return cache._replace(
        k_pages=scatter(cache.k_pages, k),
        v_pages=scatter(cache.v_pages, v),
        seq_lens=jnp.asarray(seq_lens, jnp.int32),
    )


def paged_append(cache: PagedKVCache, k_new, v_new, mask=None):
    """Append ONE token per sequence (the decode step): k_new/v_new
    (B, Hkv, 1, D). Returns the cache with seq_lens advanced.

    Appending past capacity (seq_lens == pages_per_seq * page_size) would
    silently clobber the last page (the block-table gather clamps), so the
    write is dropped and seq_lens pinned at capacity instead — decode reads
    stay correct over the tokens that actually fit.

    mask (B,) bool: rows with mask=False append nothing (their slot
    rewrites its current contents and seq_lens stays put). This is how a
    continuous-batching step appends only its live lanes — a dead lane's
    zeroed block table aliases page 0, which may belong to ANOTHER
    sequence, so an unmasked write from it would corrupt live data."""
    ps = cache.page_size
    capacity = cache.block_tables.shape[1] * ps
    pos = jnp.minimum(cache.seq_lens, capacity - 1)  # (B,) write slot
    skip = cache.seq_lens >= capacity
    if mask is not None:
        skip = skip | jnp.logical_not(jnp.asarray(mask, bool))
    page = jnp.take_along_axis(
        cache.block_tables, (pos // ps)[:, None], axis=1
    )[:, 0]  # (B,)
    # skipped rows scatter to page index num_pages: out-of-bounds scatter
    # updates are DROPPED (jax default), so they write nothing at all —
    # in particular they can't race a live row appending to the same slot
    page = jnp.where(skip, cache.k_pages.shape[0], page)
    off = pos % ps

    def scatter(pages, x):
        xt = x[:, :, 0, :].astype(pages.dtype)  # (B, Hkv, D)
        return pages.at[page, :, off, :].set(xt)

    return cache._replace(
        k_pages=scatter(cache.k_pages, k_new),
        v_pages=scatter(cache.v_pages, v_new),
        seq_lens=jnp.minimum(
            cache.seq_lens + jnp.logical_not(skip), capacity
        ),
    )


def copy_pages(cache, src, dst):
    """Execute copy-on-write page copies from the serving allocator:
    copy pages `src` (M,) over pages `dst` (M,) in both pools. Whole pages
    are copied — slots past the sequence's valid offset are never read
    (decode masks by seq_lens) and the appended token overwrites its slot.
    Works for PagedKVCache and QuantPagedKVCache (scales ride along)."""
    src = jnp.asarray(src, jnp.int32)
    dst = jnp.asarray(dst, jnp.int32)

    def cp(pages):
        return pages.at[dst].set(pages[src])

    fields = {"k_pages": cp(cache.k_pages), "v_pages": cp(cache.v_pages)}
    if hasattr(cache, "k_scales"):
        fields["k_scales"] = cp(cache.k_scales)
        fields["v_scales"] = cp(cache.v_scales)
    return cache._replace(**fields)


def paged_gather_dense(cache: PagedKVCache):
    """(k, v) dense (B, Hkv, pages_per_seq * page_size, D) — the XLA
    oracle's gather; positions past seq_lens are garbage (mask by length)."""
    _, hkv, ps, d = cache.k_pages.shape
    b, npages = cache.block_tables.shape

    def gather(pages):
        g = pages[cache.block_tables]  # (B, npages, Hkv, ps, D)
        return g.transpose(0, 2, 1, 3, 4).reshape(b, hkv, npages * ps, d)

    return gather(cache.k_pages), gather(cache.v_pages)


def paged_decode_attention(q, cache: PagedKVCache, scale, softcap=None,
                           backend=None, new_counts=None):
    """Decode attention of q (B, Hq, Tq, D) against the paged cache.

    new_counts (B,) int32 (optional): row-causal bounds for MULTI-QUERY
    decode (speculative-decoding verification): the cache's last
    new_counts[b] positions belong to q's Tq rows, and row t attends
    only kv index j < seq_lens[b] - (new_counts[b] - 1 - t) — i.e. the
    context up to and including its own token. None (the default)
    applies no causality within the new tokens (plain decode, Tq
    typically 1). Rows t >= new_counts[b] are padding (they see the full
    context — garbage, callers discard); dead lanes stay keyed off
    seq_lens == 0 (out=0, lse=NEG_INF) exactly as without new_counts.

    Returns fp32 (out (B, Hq, Tq, D), lse (B, Hq, Tq)) partials for
    cross-shard merging. backend: None/"pallas" (default on TPU),
    "pallas_interpret", "xla"."""
    from ..config import get_backend

    resolved = get_backend(backend)
    if resolved == "xla":
        return _xla_paged_decode(q, cache, scale, softcap, new_counts)
    return _pallas_paged_decode(
        q, cache, scale, softcap, new_counts,
        interpret=(resolved == "pallas_interpret"),
    )


def _xla_paged_decode(q, cache, scale, softcap, new_counts=None):
    b, hq, tq, d = q.shape
    hkv = cache.k_pages.shape[1]
    g = hq // hkv
    k, v = paged_gather_dense(cache)
    s_tot = k.shape[2]
    qf = q.astype(jnp.float32).reshape(b, hkv, g * tq, d)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qf, k.astype(jnp.float32)
    ) * scale
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    # per-row causal bound; rows are (g major, tq minor) so t = row % tq
    t_idx = jnp.arange(g * tq, dtype=jnp.int32) % tq  # (g*tq,)
    counts = (jnp.ones((b,), jnp.int32) if new_counts is None
              else jnp.asarray(new_counts, jnp.int32))
    bound = cache.seq_lens[:, None] - jnp.maximum(
        0, counts[:, None] - 1 - t_idx[None]
    )  # (B, g*tq)
    valid = (
        jnp.arange(s_tot, dtype=jnp.int32)[None, None, :]
        < bound[:, :, None]
    )[:, None]  # (B, 1, g*tq, s_tot)
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)) / l
    lse = (m + jnp.log(l))[..., 0]
    # Dead rows (seq_lens == 0: every logit at the sentinel) must match the
    # Pallas kernel's out=0 / lse=NEG_INF so standalone use agrees across
    # backends (merge_partials already weight-zeroes them either way).
    dead = (cache.seq_lens == 0)[:, None, None]
    out = jnp.where(dead[..., None], 0.0, out)
    lse = jnp.where(dead, NEG_INF, lse)
    return (
        out.reshape(b, hq, tq, d),
        lse.reshape(b, hq, tq),
    )


def _paged_kernel(
    bt_ref,  # (B * npages,) int32 scalar prefetch: block tables
    len_ref,  # (B,) int32 scalar prefetch: seq lens
    cnt_ref,  # (B,) int32 scalar prefetch: new-token counts (row causal)
    *refs,  # q, k_0..k_{F-1}, v_0..v_{F-1}, out, lse, m_s, l_s, acc_s
    softcap,
    hkv,
    rows,
    tq,
    page_size,
    npages,
    fanout,
):
    it = iter(refs)
    q_ref = next(it)  # (1, Hkv*rows, D) f32 pre-scaled
    k_refs = [next(it) for _ in range(fanout)]  # (1, Hkv*ps, D) each
    v_refs = [next(it) for _ in range(fanout)]
    out_ref = next(it)  # (1, Hkv*rows, D) f32
    lse_ref = next(it)  # (1, Hkv*rows, 1) f32
    m_s = next(it)  # (Hkv*rows, 128) f32
    l_s = next(it)  # (Hkv*rows, 128) f32
    acc_s = next(it)  # (Hkv*rows, D) f32

    b_id = pl.program_id(0)
    i = pl.program_id(1)
    seq_len = len_ref[b_id]
    valid_pages = jnp.maximum((seq_len + page_size - 1) // page_size, 1)
    nrows = hkv * rows

    @pl.when(i == 0)
    def _():
        m_s[:, :1] = jnp.full((nrows, 1), NEG_INF, jnp.float32)
        l_s[:, :1] = jnp.zeros((nrows, 1), jnp.float32)
        acc_s[...] = jnp.zeros_like(acc_s)

    # One grid step streams `fanout` pages (F independent DMAs in flight),
    # amortizing the per-grid-step fixed cost that dominated the r2 kernel.
    # Each page is ONE block-diagonal matmul over ALL kv heads: logits are
    # (Hkv*rows, Hkv*ps) with a static head-match mask killing cross-head
    # products — the MXU eats the 8x redundant FLOPs for free while the
    # VPU softmax chain runs 1 wide op instead of Hkv tiny (rows, ps) ones
    # (which left the r3 int8 paged kernel at 26% of the HBM roofline; the
    # per-op issue overhead, not bandwidth, dominated). Pages past the
    # valid range revisit the last valid page (no DMA) and skip compute.
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
    row_head = row_iota // rows
    col_head = jax.lax.broadcasted_iota(
        jnp.int32, (1, hkv * page_size), 1
    ) // page_size
    head_match = row_head == col_head
    col_pos = jax.lax.broadcasted_iota(
        jnp.int32, (1, hkv * page_size), 1
    ) % page_size
    # multi-query row causality: rows are (g major, tq minor); row t's
    # bound is seq_len - max(0, counts - 1 - t) (counts=1 or tq=1 gives
    # the plain-decode bound seq_len for every row)
    t_idx = (row_iota % rows) % tq
    row_bound = seq_len - jnp.maximum(0, cnt_ref[b_id] - 1 - t_idx)

    for f in range(fanout):
        page = i * fanout + f

        @pl.when(page < valid_pages)
        def _compute(f=f, page=page):
            s = jax.lax.dot_general(
                q_ref[0].astype(jnp.bfloat16),
                k_refs[f][0].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Hkv*rows, Hkv*ps), natural units (scale folded into q)
            if softcap:
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            live = head_match & (page * page_size + col_pos < row_bound)
            s = jnp.where(live, s, NEG_INF)
            m_prev = m_s[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_s[:, :1] = l_s[:, :1] * alpha + jnp.sum(
                p, axis=1, keepdims=True
            )
            # masked rows of p are exactly 0, so the flat PV matmul only
            # accumulates each row's own head's page slice
            acc_s[...] = acc_s[...] * alpha + jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                v_refs[f][0].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_s[:, :1] = m_new

    @pl.when(i == pl.num_programs(1) - 1)
    def _flush():
        l = l_s[:, :1]
        dead = jnp.logical_or(l == 0.0, m_s[:, :1] <= NEG_INF / 2)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = jnp.where(dead, 0.0, acc_s[...] / l_safe)
        lse_ref[0] = jnp.where(
            dead, NEG_INF, m_s[:, :1] + jnp.log(l_safe)
        )


def _pallas_paged_decode(q, cache, scale, softcap, new_counts=None,
                         interpret=False, pages_per_step=None):
    b, hq, tq, d = q.shape
    num_pages, hkv, ps, _ = cache.k_pages.shape
    g = hq // hkv
    rows = g * tq
    npages = cache.block_tables.shape[1]
    if pages_per_step is None:
        # ~8 pages (1k tokens) per grid step amortizes the fixed cost;
        # clamp so tiny caches keep a valid grid
        pages_per_step = max(1, min(8, npages))
    while npages % pages_per_step:
        pages_per_step -= 1
    f_n = pages_per_step

    qf = (q.astype(jnp.float32) * scale).reshape(b, hkv * rows, d)
    bt = cache.block_tables.reshape(-1)
    lens = jnp.asarray(cache.seq_lens, jnp.int32)
    counts = (jnp.ones((b,), jnp.int32) if new_counts is None
              else jnp.asarray(new_counts, jnp.int32))
    # (P, hkv, ps, d) -> (P, hkv*ps, d) is a contiguous collapse (free
    # bitcast); the kernel sees each page as one flat all-heads matrix
    k_flat = cache.k_pages.reshape(num_pages, hkv * ps, d)
    v_flat = cache.v_pages.reshape(num_pages, hkv * ps, d)

    def q_index(bi, i, bt_ref, len_ref, cnt_ref):
        return (bi, 0, 0)

    # one (step, f) fetch = one page with ALL its KV heads (a single
    # contiguous DMA — the page-major pool layout exists for this). Pages
    # past the sequence's last valid page revisit it (no DMA re-issued);
    # their compute is skipped in-kernel.
    def page_index(f):
        def idx(bi, i, bt_ref, len_ref, cnt_ref):
            seq_len = len_ref[bi]
            valid = jnp.maximum((seq_len + ps - 1) // ps, 1)
            ii = jnp.minimum(i * f_n + f, valid - 1)
            return (bt_ref[bi * npages + ii], 0, 0)

        return idx

    kv_specs = [
        pl.BlockSpec((1, hkv * ps, d), page_index(f),
                     memory_space=pltpu.VMEM)
        for f in range(f_n)
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, npages // f_n),
        in_specs=[
            pl.BlockSpec((1, hkv * rows, d), q_index,
                         memory_space=pltpu.VMEM),
            *kv_specs,
            *kv_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, hkv * rows, d), q_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv * rows, 1), q_index,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv * rows, 128), jnp.float32),
            pltpu.VMEM((hkv * rows, 128), jnp.float32),
            pltpu.VMEM((hkv * rows, d), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        functools.partial(
            _paged_kernel, softcap=softcap, hkv=hkv, rows=rows, tq=tq,
            page_size=ps, npages=npages, fanout=f_n,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv * rows, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv * rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # F page blocks of all heads per step (x2 pipeline buffers)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bt, lens, counts, qf, *([k_flat] * f_n), *([v_flat] * f_n))
    return (
        out.reshape(b, hq, tq, d),
        lse.reshape(b, hq, tq),
    )


# ---------------------------------------------------------------------------
# Quantized paged cache: int8/fp8 pages + per-token scales — paging and
# KV quantization composed (halves/quarters the page-pool bandwidth the
# decode step must stream; see ops/quant.py for the quantization scheme).
# ---------------------------------------------------------------------------


class QuantPagedKVCache(NamedTuple):
    k_pages: jnp.ndarray  # int8/fp8 (num_pages, Hkv, page_size, D)
    k_scales: jnp.ndarray  # f32 (num_pages, Hkv, 1, page_size)
    v_pages: jnp.ndarray
    v_scales: jnp.ndarray
    block_tables: jnp.ndarray  # (B, pages_per_seq) int32
    seq_lens: jnp.ndarray  # (B,) int32

    @property
    def page_size(self):
        return self.k_pages.shape[2]


def paged_quant_init(batch, hkv, num_pages, page_size, pages_per_seq, d,
                     qdtype="int8", block_tables=None):
    from .quant import _QDTYPES

    dt, _ = _QDTYPES[qdtype]
    if block_tables is None:
        assert num_pages >= batch * pages_per_seq
        block_tables = (
            jnp.arange(batch * pages_per_seq, dtype=jnp.int32)
            .reshape(batch, pages_per_seq)
        )
    z = jnp.zeros((num_pages, hkv, page_size, d), dt)
    zs = jnp.ones((num_pages, hkv, 1, page_size), jnp.float32)
    return QuantPagedKVCache(
        z, zs, jnp.zeros_like(z), jnp.ones_like(zs),
        jnp.asarray(block_tables, jnp.int32),
        jnp.zeros((batch,), jnp.int32),
    )


def _qdtype_of(cache):
    from .quant import _QDTYPES

    return next(
        name for name, (dt, _) in _QDTYPES.items()
        if dt == cache.k_pages.dtype
    )


def paged_quant_prefill(cache: QuantPagedKVCache, k, v, seq_lens):
    """Quantize dense k/v (B, Hkv, S, D) per token and write into pages."""
    from .quant import quantize_tensor

    _, hkv, ps, d = cache.k_pages.shape
    b, _, s, _ = k.shape
    assert s % ps == 0, (s, ps)
    nblk = s // ps
    bt = cache.block_tables[:, :nblk]
    qdtype = _qdtype_of(cache)

    # per-token scales: (B, Hkv, S) -> (B, nblk, Hkv, 1, ps)
    def scatter2(pages, scales, x):
        x_q, x_s = quantize_tensor(x, qdtype)
        xb = x_q.reshape(b, hkv, nblk, ps, d).transpose(0, 2, 1, 3, 4)
        sb = x_s.reshape(b, hkv, nblk, ps).transpose(0, 2, 1, 3)[:, :, :, None, :]
        return (
            pages.at[bt].set(xb.astype(pages.dtype), mode="drop"),
            scales.at[bt].set(sb, mode="drop"),
        )

    kp, ks = scatter2(cache.k_pages, cache.k_scales, k)
    vp, vs = scatter2(cache.v_pages, cache.v_scales, v)
    return cache._replace(
        k_pages=kp, k_scales=ks, v_pages=vp, v_scales=vs,
        seq_lens=jnp.asarray(seq_lens, jnp.int32),
    )


def paged_quant_append(cache: QuantPagedKVCache, k_new, v_new, mask=None):
    """Quantize + append ONE token per sequence. Same capacity/mask
    semantics as paged_append: at-capacity or mask=False rows write
    nothing (OOB-dropped scatter) and their seq_lens stay put."""
    from .quant import quantize_tensor

    ps = cache.page_size
    capacity = cache.block_tables.shape[1] * ps
    pos = jnp.minimum(cache.seq_lens, capacity - 1)
    skip = cache.seq_lens >= capacity
    if mask is not None:
        skip = skip | jnp.logical_not(jnp.asarray(mask, bool))
    page = jnp.take_along_axis(
        cache.block_tables, (pos // ps)[:, None], axis=1
    )[:, 0]
    page = jnp.where(skip, cache.k_pages.shape[0], page)
    off = pos % ps
    qdtype = _qdtype_of(cache)

    def scatter(pages, scales, x):
        x_q, x_s = quantize_tensor(x, qdtype)  # (B,Hkv,1,D), (B,Hkv,1)
        return (
            pages.at[page, :, off, :].set(
                x_q[:, :, 0, :].astype(pages.dtype)
            ),
            scales.at[page, :, 0, off].set(x_s[:, :, 0]),
        )

    kp, ks = scatter(cache.k_pages, cache.k_scales, k_new)
    vp, vs = scatter(cache.v_pages, cache.v_scales, v_new)
    return cache._replace(
        k_pages=kp, k_scales=ks, v_pages=vp, v_scales=vs,
        seq_lens=jnp.minimum(
            cache.seq_lens + jnp.logical_not(skip), capacity
        ),
    )


def paged_quant_decode_attention(q, cache: QuantPagedKVCache, scale,
                                 softcap=None, backend=None,
                                 pages_per_step=None):
    """Decode attention against the quantized paged cache; same (out, lse)
    partial contract as paged_decode_attention."""
    from ..config import get_backend

    resolved = get_backend(backend)
    if resolved == "xla":
        return _xla_quant_paged_decode(q, cache, scale, softcap)
    return _pallas_quant_paged_decode(
        q, cache, scale, softcap,
        interpret=(resolved == "pallas_interpret"),
        pages_per_step=pages_per_step,
    )


def _xla_quant_paged_decode(q, cache, scale, softcap):
    _, hkv, ps, d = cache.k_pages.shape
    b, npages = cache.block_tables.shape

    def gather(pages, scales):
        g = pages[cache.block_tables].astype(jnp.float32)
        s_ = scales[cache.block_tables]  # (B, npages, Hkv, 1, ps)
        deq = g * s_.transpose(0, 1, 2, 4, 3)  # (B,npages,Hkv,ps,D)
        return deq.transpose(0, 2, 1, 3, 4).reshape(b, hkv, npages * ps, d)

    k = gather(cache.k_pages, cache.k_scales)
    v = gather(cache.v_pages, cache.v_scales)
    hq, tq = q.shape[1], q.shape[2]
    g_ = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g_ * tq, d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k) * scale
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    valid = (
        jnp.arange(k.shape[2], dtype=jnp.int32)[None, None, None, :]
        < cache.seq_lens[:, None, None, None]
    )
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v) / l
    lse = (m + jnp.log(l))[..., 0]
    return out.reshape(b, hq, tq, d), lse.reshape(b, hq, tq)


def _quant_paged_kernel(
    bt_ref,
    len_ref,
    *refs,  # q, [qs], k_0.., ks_0.., v_0.., vs_0.., out, lse, m_s, l_s, acc_s
    softcap,
    hkv,
    rows,
    page_size,
    npages,
    fanout,
    int8_qk,
):
    int8_pv = int8_qk and _INT8_NATIVE_PV
    it = iter(refs)
    q_ref = next(it)  # (1, Hkv*rows, D): int8 rows when int8_qk, else f32
    qs_ref = next(it) if int8_qk else None  # (1, Hkv*rows, 1) f32 row scales
    k_refs = [next(it) for _ in range(fanout)]  # (1, Hkv*ps, D) quantized
    ks_refs = [next(it) for _ in range(fanout)]  # (1, 1, Hkv*ps) f32
    v_refs = [next(it) for _ in range(fanout)]
    vs_refs = [next(it) for _ in range(fanout)]
    out_ref = next(it)
    lse_ref = next(it)
    m_s = next(it)
    l_s = next(it)
    acc_s = next(it)

    b_id = pl.program_id(0)
    i = pl.program_id(1)
    seq_len = len_ref[b_id]
    valid_pages = jnp.maximum((seq_len + page_size - 1) // page_size, 1)
    nrows = hkv * rows

    @pl.when(i == 0)
    def _():
        m_s[:, :1] = jnp.full((nrows, 1), NEG_INF, jnp.float32)
        l_s[:, :1] = jnp.zeros((nrows, 1), jnp.float32)
        acc_s[...] = jnp.zeros_like(acc_s)

    # F pages per grid step, each page ONE block-diagonal all-heads matmul
    # — see _paged_kernel for the rationale. Per-token k scales fold into
    # the (nrows, Hkv*ps) logits columns; v scales into the PV operand.
    row_head = jax.lax.broadcasted_iota(
        jnp.int32, (nrows, 1), 0
    ) // rows
    col_head = jax.lax.broadcasted_iota(
        jnp.int32, (1, hkv * page_size), 1
    ) // page_size
    head_match = row_head == col_head
    col_pos = jax.lax.broadcasted_iota(
        jnp.int32, (1, hkv * page_size), 1
    ) % page_size

    for f in range(fanout):
        page = i * fanout + f

        @pl.when(page < valid_pages)
        def _compute(f=f, page=page):
            if int8_qk:
                # int8-NATIVE QK on the MXU (s8 x s8 -> s32 exact): the
                # wrapper pre-quantizes q per row, so the page's int8 K
                # feeds the matmul directly — no per-element K dequant
                # cast, which was the dominant VPU cost of this
                # bandwidth-bound kernel (67% of SoL; VERDICT r3 item 7).
                # Two (nrows, Hkv*ps) scale multiplies replace a
                # (Hkv*ps, D) cast.
                s = jax.lax.dot_general(
                    q_ref[0],
                    k_refs[f][0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                s = s * qs_ref[0] * ks_refs[f][0]  # (nrows, Hkv*ps)
            else:
                # fp8 pages: cast to bf16 feeds the MXU at full rate
                s = jax.lax.dot_general(
                    q_ref[0].astype(jnp.bfloat16),
                    k_refs[f][0].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * ks_refs[f][0]  # (nrows, Hkv*ps)
            if softcap:
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            live = head_match & (page * page_size + col_pos < seq_len)
            s = jnp.where(live, s, NEG_INF)
            m_prev = m_s[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_s[:, :1] = l_s[:, :1] * alpha + jnp.sum(
                p, axis=1, keepdims=True
            )
            pv_f = p * vs_refs[f][0]  # fold per-token v scales (contracted
            # dim — they cannot move past the matmul)
            if int8_pv:
                # int8-NATIVE PV: quantize the probability operand per row
                # (values in [0, rowmax], so round(pv/rowmax*127) is exact
                # at the max and ~0.4% relative elsewhere — far inside the
                # cache's own int8 error) and feed the page's int8 V to
                # the MXU directly. Deletes the (Hkv*ps, D) per-element V
                # dequant cast, 4x the p-side element count.
                row_s = jnp.maximum(
                    jnp.max(pv_f, axis=1, keepdims=True) / 127.0, 1e-20
                )
                pq = jnp.round(pv_f / row_s).astype(jnp.int8)
                acc_s[...] = acc_s[...] * alpha + row_s * jax.lax.dot_general(
                    pq, v_refs[f][0],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            else:
                acc_s[...] = acc_s[...] * alpha + jax.lax.dot_general(
                    pv_f.astype(jnp.bfloat16),
                    v_refs[f][0].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            m_s[:, :1] = m_new

    @pl.when(i == pl.num_programs(1) - 1)
    def _flush():
        l = l_s[:, :1]
        dead = jnp.logical_or(l == 0.0, m_s[:, :1] <= NEG_INF / 2)
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = jnp.where(dead, 0.0, acc_s[...] / l_safe)
        lse_ref[0] = jnp.where(
            dead, NEG_INF, m_s[:, :1] + jnp.log(l_safe)
        )


def _pallas_quant_paged_decode(q, cache, scale, softcap, interpret=False,
                               pages_per_step=None):
    b, hq, tq, d = q.shape
    num_pages, hkv, ps, _ = cache.k_pages.shape
    g = hq // hkv
    rows = g * tq
    npages = cache.block_tables.shape[1]
    if pages_per_step is None:
        # keep ~1MB of K pages in flight per grid step: quantized pages
        # are 1-byte, so a fixed fanout=8 leaves the block-table gather
        # DMAs too small to reach HBM bandwidth (r4 sweep,
        # tools/exp_int8_pv.py: pg=256 fanout 4/8/16 -> 76.3/75.9/72.8%
        # of SoL; pg=512 fanout 2 -> 87.5%, matching the bf16 kernel)
        page_k_bytes = hkv * ps * d * cache.k_pages.dtype.itemsize
        pages_per_step = max(1, min(8, npages,
                                    (1 << 20) // max(page_k_bytes, 1)))
    while npages % pages_per_step:
        pages_per_step -= 1
    f_n = pages_per_step

    int8_qk = cache.k_pages.dtype == jnp.int8
    qf = (q.astype(jnp.float32) * scale).reshape(b, hkv * rows, d)
    if int8_qk:
        # per-row int8 quantization of q (tiny: nrows x D work) so the
        # kernel runs the QK matmul int8-native against the int8 pages
        qs_row = jnp.maximum(
            jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0, 1e-20
        )  # (b, nrows, 1) f32
        q_in = jnp.clip(jnp.round(qf / qs_row), -127, 127).astype(jnp.int8)
    else:
        q_in = qf
    bt = cache.block_tables.reshape(-1)
    lens = jnp.asarray(cache.seq_lens, jnp.int32)
    # contiguous collapses: pages (P, hkv, ps, d) -> (P, hkv*ps, d) is a
    # free bitcast; scales (P, hkv, 1, ps) -> (P, 1, hkv*ps) keeps linear
    # order (XLA pays one small relayout for the padded middle dim)
    k_flat = cache.k_pages.reshape(num_pages, hkv * ps, d)
    v_flat = cache.v_pages.reshape(num_pages, hkv * ps, d)
    ks_flat = cache.k_scales.reshape(num_pages, 1, hkv * ps)
    vs_flat = cache.v_scales.reshape(num_pages, 1, hkv * ps)

    def q_index(bi, i, bt_ref, len_ref):
        return (bi, 0, 0)

    def page_index(f):
        def idx(bi, i, bt_ref, len_ref):
            seq_len = len_ref[bi]
            valid = jnp.maximum((seq_len + ps - 1) // ps, 1)
            ii = jnp.minimum(i * f_n + f, valid - 1)
            return (bt_ref[bi * npages + ii], 0, 0)

        return idx

    def kv_specs(shape):
        return [
            pl.BlockSpec(shape, page_index(f), memory_space=pltpu.VMEM)
            for f in range(f_n)
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, npages // f_n),
        in_specs=[
            pl.BlockSpec((1, hkv * rows, d), q_index,
                         memory_space=pltpu.VMEM),
            *([pl.BlockSpec((1, hkv * rows, 1), q_index,
                            memory_space=pltpu.VMEM)] if int8_qk else []),
            *kv_specs((1, hkv * ps, d)),
            *kv_specs((1, 1, hkv * ps)),
            *kv_specs((1, hkv * ps, d)),
            *kv_specs((1, 1, hkv * ps)),
        ],
        out_specs=[
            pl.BlockSpec((1, hkv * rows, d), q_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv * rows, 1), q_index,
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv * rows, 128), jnp.float32),
            pltpu.VMEM((hkv * rows, 128), jnp.float32),
            pltpu.VMEM((hkv * rows, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(
            _quant_paged_kernel, softcap=softcap, hkv=hkv, rows=rows,
            page_size=ps, npages=npages, fanout=f_n, int8_qk=int8_qk,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv * rows, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv * rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bt, lens, q_in, *([qs_row] if int8_qk else []),
      *([k_flat] * f_n), *([ks_flat] * f_n),
      *([v_flat] * f_n), *([vs_flat] * f_n))
    return out.reshape(b, hq, tq, d), lse.reshape(b, hq, tq)
