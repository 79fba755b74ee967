"""Block-kernel and numerics tests (single device, CPU).

Mirrors the role of the reference's kernel-level checks
(test_triton_kernels.py exact-equality pattern) but with asserted
tolerances, which the reference's functional tests lack (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import pytest

from ring_flash_attn_tpu.ops.flash import (
    flash_attention,
    compute_delta,
)
from ring_flash_attn_tpu.ops.mask import MaskArgs, NEG_INF
from ring_flash_attn_tpu.ops.merge import merge_partials
from ring_flash_attn_tpu.ops.naive import naive_block_fwd, naive_block_bwd
from ring_flash_attn_tpu.ops.pallas_bwd import pallas_block_bwd
from ring_flash_attn_tpu.ops.pallas_fwd import pallas_block_fwd

from oracle import full_attention, full_attention_lse

B, HQ, HKV, S, D = 1, 4, 2, 256, 64
SCALE = D**-0.5


@pytest.fixture(scope="module")
def data():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D), jnp.float32)
    return q, k, v, dout


SEGIDS = jnp.repeat(jnp.arange(4, dtype=jnp.int32), S // 4)
POS = jnp.concatenate(
    [jnp.arange(S, dtype=jnp.int32)[::2], jnp.arange(S, dtype=jnp.int32)[1::2]]
)

MASK_CASES = {
    "noncausal": MaskArgs(),
    "causal": MaskArgs(causal=True),
    "stripe_offset": MaskArgs(causal=True, offset=-1),
    "segments": MaskArgs(q_segids=SEGIDS, kv_segids=SEGIDS),
    "segments_causal": MaskArgs(causal=True, q_segids=SEGIDS, kv_segids=SEGIDS),
    "positions": MaskArgs(causal=True, q_pos=POS, kv_pos=POS),
}


@pytest.mark.parametrize("case", ["noncausal", "causal", "segments_causal"])
def test_naive_fwd_matches_oracle(data, case):
    q, k, v, _ = data
    mask = MASK_CASES[case]
    out, lse = naive_block_fwd(q, k, v, SCALE, mask)
    ref = full_attention(
        q, k, v, SCALE, causal=mask.causal, segids=mask.q_segids
    )
    ref_lse = full_attention_lse(
        q, k, v, SCALE, causal=mask.causal, segids=mask.q_segids
    )
    assert jnp.max(jnp.abs(out - ref)) < 2e-5
    assert jnp.max(jnp.abs(lse - ref_lse)) < 2e-5


@pytest.mark.parametrize("case", ["noncausal", "causal", "segments_causal"])
def test_naive_bwd_matches_autodiff(data, case):
    q, k, v, dout = data
    mask = MASK_CASES[case]
    out, lse = naive_block_fwd(q, k, v, SCALE, mask)
    delta = compute_delta(dout, out)
    dq, dk, dv = naive_block_bwd(dout, q, k, v, lse, delta, SCALE, mask)

    def loss(q, k, v):
        ref = full_attention(
            q, k, v, SCALE, causal=mask.causal, segids=mask.q_segids
        )
        return jnp.sum(ref * dout)

    dq_r, dk_r, dv_r = jax.grad(loss, (0, 1, 2))(q, k, v)
    assert jnp.max(jnp.abs(dq - dq_r)) < 5e-5
    assert jnp.max(jnp.abs(dk - dk_r)) < 5e-5
    assert jnp.max(jnp.abs(dv - dv_r)) < 5e-5


@pytest.mark.parametrize("case", list(MASK_CASES))
def test_pallas_fwd_interpret_matches_naive(data, case):
    q, k, v, _ = data
    mask = MASK_CASES[case]
    o1, l1 = naive_block_fwd(q, k, v, SCALE, mask)
    o2, l2 = pallas_block_fwd(
        q, k, v, SCALE, mask, interpret=True, blk_q=64, blk_kv=64
    )
    assert jnp.max(jnp.abs(o1 - o2)) < 2e-5
    assert jnp.max(jnp.abs(l1 - l2)) < 2e-5


@pytest.mark.parametrize("case", list(MASK_CASES))
def test_pallas_bwd_interpret_matches_naive(data, case):
    q, k, v, dout = data
    mask = MASK_CASES[case]
    out, lse = naive_block_fwd(q, k, v, SCALE, mask)
    delta = compute_delta(dout, out)
    r1 = naive_block_bwd(dout, q, k, v, lse, delta, SCALE, mask)
    r2 = pallas_block_bwd(
        dout, q, k, v, lse, delta, SCALE, mask,
        interpret=True, blk_q=64, blk_kv=64,
    )
    for a, b, name in zip(r1, r2, ("dq", "dk", "dv")):
        assert jnp.max(jnp.abs(a - b)) < 5e-5, name


def test_pallas_gqa_asymmetric_interpret():
    """GQA with Sq != Skv (the per-step ring shape)."""
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 128, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 256, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 256, 64), jnp.float32)
    m = MaskArgs()
    o1, l1 = naive_block_fwd(q, k, v, SCALE, m)
    o2, l2 = pallas_block_fwd(q, k, v, SCALE, m, interpret=True, blk_q=64, blk_kv=64)
    assert jnp.max(jnp.abs(o1 - o2)) < 2e-5
    assert jnp.max(jnp.abs(l1 - l2)) < 2e-5


def test_merge_partials_equals_full_softmax(data):
    q, k, v, _ = data
    m = MaskArgs()
    o1, l1 = naive_block_fwd(q, k[:, :, : S // 2], v[:, :, : S // 2], SCALE, m)
    o2, l2 = naive_block_fwd(q, k[:, :, S // 2 :], v[:, :, S // 2 :], SCALE, m)
    out, lse = merge_partials(*merge_partials(None, None, o1, l1), o2, l2)
    of, lf = naive_block_fwd(q, k, v, SCALE, m)
    assert jnp.max(jnp.abs(out - of)) < 2e-5
    assert jnp.max(jnp.abs(lse - lf)) < 2e-5


def test_merge_handles_dead_partial(data):
    """A fully-masked partial (lse=NEG_INF) must be a no-op in the merge."""
    q, k, v, _ = data
    o1, l1 = naive_block_fwd(q, k, v, SCALE, MaskArgs())
    dead_out = jnp.zeros_like(o1)
    dead_lse = jnp.full_like(l1, NEG_INF)
    out, lse = merge_partials(o1, l1, dead_out, dead_lse)
    assert jnp.max(jnp.abs(out - o1)) == 0.0
    assert jnp.max(jnp.abs(lse - l1)) == 0.0
    # and the other order: dead accumulator is replaced by the live block
    out2, lse2 = merge_partials(dead_out, dead_lse, o1, l1)
    assert jnp.max(jnp.abs(out2 - o1)) < 1e-6
    assert jnp.max(jnp.abs(lse2 - l1)) < 1e-6


def test_flash_attention_custom_vjp(data):
    q, k, v, dout = data
    mask = MaskArgs(causal=True)

    def loss(q, k, v):
        o, _ = flash_attention(q, k, v, SCALE, mask, "xla")
        return jnp.sum(o * dout)

    def loss_ref(q, k, v):
        return jnp.sum(full_attention(q, k, v, SCALE, causal=True) * dout)

    g1 = jax.grad(loss, (0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert jnp.max(jnp.abs(a - b)) < 5e-5


def test_bwd_fused_gate_long_kv():
    """pallas_block_bwd auto-selects the split kernels when the fused
    kernel's resident dk/dv accumulators would exceed the VMEM budget."""
    from ring_flash_attn_tpu.ops.pallas_bwd_fused import fused_bwd_supported

    assert fused_bwd_supported(8192, 128)  # headline shape fits
    assert not fused_bwd_supported(64 * 1024, 128)  # 64k KV falls back
