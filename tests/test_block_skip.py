"""Segment/position-aware block skipping (r3): the three-way sub-tile
dispatch (skip / mask-free / masked) must be exact against the naive
backend for packed, adversarial, and fully-disjoint layouts.

The skipping is the Pallas analog of flash-attn varlen's cu_seqlens block
skipping (reference ring_flash_attn_varlen.py:56-59); these cases pick
block sizes so all three dispatch branches trigger."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ring_flash_attn_tpu.ops.mask import MaskArgs, NEG_INF
from ring_flash_attn_tpu.ops.naive import naive_block_fwd, naive_block_bwd
from ring_flash_attn_tpu.ops.flash import compute_delta
from ring_flash_attn_tpu.ops.pallas_fwd import pallas_block_fwd, block_meta
from ring_flash_attn_tpu.ops.pallas_bwd_fused import pallas_block_bwd_fused

B, HQ, HKV, S, D = 1, 4, 2, 256, 64
SCALE = D**-0.5
BLK = dict(blk_q=64, blk_kv=64, kv_sub=32)


def _data():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    do = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D), jnp.float32)
    return q, k, v, do


def _packed(cu):
    """Sorted packed segids + restarting positions from cu_seqlens."""
    from ring_flash_attn_tpu.ops.varlen import (
        cu_seqlens_to_positions,
        cu_seqlens_to_segids,
    )

    cu = jnp.asarray(cu, jnp.int32)
    return cu_seqlens_to_segids(cu, S), cu_seqlens_to_positions(cu, S)


SEG_SORTED, POS_SORTED = _packed([0, 16, 160, 224, 256])
# interleaved: segment ids alternate across blocks — ranges overlap
# everywhere so NOTHING can be skipped; correctness must not depend on
# sortedness
SEG_SHUF = jnp.asarray(
    np.random.RandomState(0).permutation(np.repeat(np.arange(8), S // 8)),
    jnp.int32,
)

CASES = {
    "varlen_causal": MaskArgs(
        causal=True, q_segids=SEG_SORTED, kv_segids=SEG_SORTED,
        q_pos=POS_SORTED, kv_pos=POS_SORTED,
    ),
    "varlen_noncausal": MaskArgs(
        q_segids=SEG_SORTED, kv_segids=SEG_SORTED
    ),
    "varlen_window": MaskArgs(
        causal=True, q_segids=SEG_SORTED, kv_segids=SEG_SORTED,
        q_pos=POS_SORTED, kv_pos=POS_SORTED, window_left=40,
    ),
    "shuffled_segs": MaskArgs(q_segids=SEG_SHUF, kv_segids=SEG_SHUF),
    "seg_causal_iota": MaskArgs(
        causal=True, q_segids=SEG_SORTED, kv_segids=SEG_SORTED
    ),
    "window_batch": MaskArgs(causal=True, window_left=100),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_fwd_skipping_matches_naive(case):
    q, k, v, _ = _data()
    mask = CASES[case]
    o1, l1 = naive_block_fwd(q, k, v, SCALE, mask)
    o2, l2 = pallas_block_fwd(q, k, v, SCALE, mask, interpret=True, **BLK)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-5)


@pytest.mark.parametrize(
    "case", ["varlen_causal", "varlen_window", "shuffled_segs"]
)
def test_fused_bwd_skipping_matches_naive(case):
    q, k, v, do = _data()
    mask = CASES[case]
    out, lse = naive_block_fwd(q, k, v, SCALE, mask)
    delta = compute_delta(do, out)
    r1 = naive_block_bwd(do, q, k, v, lse, delta, SCALE, mask)
    r2 = pallas_block_bwd_fused(
        do, q, k, v, lse, delta, SCALE, mask, interpret=True, **BLK
    )
    for g1, g2, name in zip(r1, r2, "dq dk dv".split()):
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g1), atol=5e-5, err_msg=name
        )


@pytest.mark.parametrize("case", sorted(CASES))
def test_fwd_strips_match_naive(case):
    """Mixed-granularity masked strips (round 4, kv_fine < kv_sub): masked
    sub-tiles re-dispatch in fine strips; results must be identical."""
    q, k, v, _ = _data()
    mask = CASES[case]
    o1, l1 = naive_block_fwd(q, k, v, SCALE, mask)
    o2, l2 = pallas_block_fwd(q, k, v, SCALE, mask, interpret=True,
                              kv_fine=16, **BLK)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-5)


@pytest.mark.parametrize(
    "case", ["varlen_causal", "varlen_window", "shuffled_segs",
             "window_batch"]
)
def test_fused_bwd_strips_match_naive(case):
    """Strips + in-kernel delta + narrow dk/dv together (round 4)."""
    q, k, v, do = _data()
    mask = CASES[case]
    out, lse = naive_block_fwd(q, k, v, SCALE, mask)
    r1 = naive_block_bwd(
        do, q, k, v, lse, compute_delta(do, out), SCALE, mask
    )
    r2 = pallas_block_bwd_fused(
        do, q, k, v, lse, None, SCALE, mask, interpret=True,
        out=out.astype(q.dtype), kv_fine=16, dkv_dtype=jnp.float32, **BLK
    )
    for g1, g2, name in zip(r1, r2, "dq dk dv".split()):
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g1), atol=5e-5, err_msg=name
        )


def test_disjoint_shards_all_skipped():
    """Ring-step shape: q's segments never appear in kv — every tile is
    skipped, out must be exactly 0 / lse exactly NEG_INF (dead rows)."""
    q, k, v, _ = _data()
    mask = MaskArgs(
        q_segids=jnp.zeros((S,), jnp.int32),
        kv_segids=jnp.ones((S,), jnp.int32),
    )
    out, lse = pallas_block_fwd(q, k, v, SCALE, mask, interpret=True, **BLK)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    assert float(np.asarray(lse).max()) <= NEG_INF / 2


def test_block_meta_bounds():
    """first/last needed kv macro blocks must COVER (be a superset of) the
    blocks containing any allowed (q, kv) pair, per the dense mask."""
    from ring_flash_attn_tpu.ops.mask import allowed_mask

    blk = 64
    for name in ("varlen_causal", "varlen_window", "varlen_noncausal",
                 "shuffled_segs"):
        mask = CASES[name]
        n = S // blk
        q_meta, _ = block_meta(mask, blk, blk, 32, n, n)
        q_meta = np.asarray(q_meta)
        dense = np.asarray(allowed_mask(mask, S, S))
        # dense per-block needed matrix (ground truth)
        needed = dense.reshape(n, blk, n, blk).any(axis=(1, 3))
        for i in range(n):
            js = np.nonzero(needed[i])[0]
            if len(js):
                assert q_meta[4, i] <= js.min(), (name, i)
                assert q_meta[5, i] >= js.max(), (name, i)


@pytest.mark.parametrize(
    "case", ["varlen_causal", "varlen_window", "shuffled_segs",
             "varlen_noncausal"]
)
def test_split_bwd_skipping_matches_naive(case):
    """The split (long-KV fallback) kernels get the same block-granular
    three-way dispatch; must stay exact."""
    from ring_flash_attn_tpu.ops.pallas_bwd import pallas_block_bwd

    q, k, v, do = _data()
    mask = CASES[case]
    out, lse = naive_block_fwd(q, k, v, SCALE, mask)
    delta = compute_delta(do, out)
    r1 = naive_block_bwd(do, q, k, v, lse, delta, SCALE, mask)
    r2 = pallas_block_bwd(
        do, q, k, v, lse, delta, SCALE, mask, interpret=True,
        blk_q=64, blk_kv=64, fused=False,
    )
    for g1, g2, name in zip(r1, r2, "dq dk dv".split()):
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g1), atol=5e-5, err_msg=name
        )


PACKED_CASES = {
    "packed_self": MaskArgs(
        causal=True, q_segids=SEG_SORTED, kv_segids=SEG_SORTED,
        q_pos=POS_SORTED, kv_pos=POS_SORTED, packed_self=True,
    ),
    "packed_self_window": MaskArgs(
        causal=True, q_segids=SEG_SORTED, kv_segids=SEG_SORTED,
        q_pos=POS_SORTED, kv_pos=POS_SORTED, window_left=40,
        packed_self=True,
    ),
}


@pytest.mark.parametrize("case", sorted(PACKED_CASES))
def test_packed_self_triangular_grid_exact(case):
    """packed_self=True switches the varlen kernels to the triangular
    pair grid; results must be IDENTICAL to the rectangular grid and the
    naive oracle (fwd + both backward kernels)."""
    from ring_flash_attn_tpu.ops.pallas_bwd import pallas_block_bwd

    q, k, v, do = _data()
    mask = PACKED_CASES[case]
    o1, l1 = naive_block_fwd(q, k, v, SCALE, mask)
    o2, l2 = pallas_block_fwd(q, k, v, SCALE, mask, interpret=True, **BLK)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-5)

    out, lse = o1, l1
    delta = compute_delta(do, out)
    r1 = naive_block_bwd(do, q, k, v, lse, delta, SCALE, mask)
    for fused in (True, False):
        r2 = pallas_block_bwd(
            do, q, k, v, lse, delta, SCALE, mask, interpret=True,
            blk_q=64, blk_kv=64, fused=fused,
        )
        for g1, g2, name in zip(r1, r2, "dq dk dv".split()):
            np.testing.assert_allclose(
                np.asarray(g2), np.asarray(g1), atol=5e-5,
                err_msg=f"{name} fused={fused}",
            )


def test_packed_self_zigzag_grouped_layout():
    """The grouped zigzag diagonal-step layout (repeating segid runs,
    per-segment increasing positions) must stay exact under packed_self."""
    from ring_flash_attn_tpu.ops.varlen import zigzag_varlen_info

    q, k, v, _ = _data()
    # rank 1 of world 2: packs [chunk 1] ++ [chunk 2] of each sequence
    cu_half = jnp.asarray([0, 32, 96, 128], jnp.int32)
    seg, pos = zigzag_varlen_info(cu_half, S, 1, 2)
    mask = MaskArgs(
        causal=True, q_segids=seg, kv_segids=seg, q_pos=pos, kv_pos=pos,
        packed_self=True,
    )
    ref = MaskArgs(
        causal=True, q_segids=seg, kv_segids=seg, q_pos=pos, kv_pos=pos
    )
    o1, l1 = naive_block_fwd(q, k, v, SCALE, ref)
    o2, l2 = pallas_block_fwd(q, k, v, SCALE, mask, interpret=True, **BLK)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-5)


def _np_mask(mask):
    """MaskArgs with metadata as numpy — opts into the compact grid."""
    rep = {
        f: np.asarray(getattr(mask, f))
        for f in ("q_segids", "kv_segids", "q_pos", "kv_pos")
        if getattr(mask, f) is not None
    }
    return mask._replace(**rep)


@pytest.mark.parametrize("case", sorted(PACKED_CASES))
def test_compact_grid_matches_naive(case):
    """numpy (static) metadata compacts the triangular pair grid to only
    the needed (q, kv-macro) pairs — flash-attn varlen's dynamic launch
    config, the TPU way. Results must equal the traced-metadata path and
    the oracle, and the grid must actually shrink."""
    import functools
    import unittest.mock as um

    from ring_flash_attn_tpu.ops import pallas_fwd as pf

    q, k, v, _ = _data()
    mask = _np_mask(PACKED_CASES[case])
    o1, l1 = naive_block_fwd(q, k, v, SCALE, mask)

    grids = []
    real_call = pf.pl.pallas_call

    def spy(kernel, *a, **kw):
        grids.append(kw["grid_spec"].grid)
        return real_call(kernel, *a, **kw)

    with um.patch.object(pf.pl, "pallas_call", spy):
        o2, l2 = pallas_block_fwd(q, k, v, SCALE, mask, interpret=True,
                                  **BLK)
        traced = PACKED_CASES[case]
        o3, l3 = pallas_block_fwd(q, k, v, SCALE, traced, interpret=True,
                                  **BLK)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o3), atol=2e-6)
    compact_pairs, full_pairs = grids[0][2], grids[1][2]
    assert compact_pairs < full_pairs, (compact_pairs, full_pairs)


def test_compact_grid_segments_only():
    """Compact grid with segments but no positions (batch causal layout
    with static segids): the diagonal comes from block arithmetic, the
    needed range from segments."""
    seg = np.repeat(np.arange(4), S // 4).astype(np.int32)
    mask = MaskArgs(causal=True, q_segids=seg, kv_segids=seg)
    q, k, v, _ = _data()
    o1, l1 = naive_block_fwd(q, k, v, SCALE, mask)
    o2, l2 = pallas_block_fwd(q, k, v, SCALE, mask, interpret=True, **BLK)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-5)


@pytest.mark.parametrize("case", sorted(PACKED_CASES))
def test_compact_grid_fused_bwd(case):
    """Compact pair enumeration in the fused backward (flags map: bit0
    flush / bit1 init) must match the traced-metadata path and naive."""
    import unittest.mock as um

    from ring_flash_attn_tpu.ops import pallas_bwd_fused as pbf

    q, k, v, do = _data()
    traced = PACKED_CASES[case]
    mask = _np_mask(traced)
    out, lse = naive_block_fwd(q, k, v, SCALE, traced)
    delta = compute_delta(do, out)
    r1 = naive_block_bwd(do, q, k, v, lse, delta, SCALE, traced)

    grids = []
    real_call = pbf.pl.pallas_call

    def spy(kernel, *a, **kw):
        grids.append(kw["grid_spec"].grid)
        return real_call(kernel, *a, **kw)

    with um.patch.object(pbf.pl, "pallas_call", spy):
        r2 = pallas_block_bwd_fused(
            do, q, k, v, lse, delta, SCALE, mask, interpret=True, **BLK
        )
        r3 = pallas_block_bwd_fused(
            do, q, k, v, lse, delta, SCALE, traced, interpret=True, **BLK
        )
    for g1, g2, g3, name in zip(r1, r2, r3, "dq dk dv".split()):
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g1), atol=5e-5, err_msg=name
        )
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g3), atol=2e-6, err_msg=name
        )
    assert grids[0][2] < grids[1][2], grids
