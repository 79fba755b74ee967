"""Round-5 forward-kernel VPU-chain attack (VERDICT r4 task #1).

The fwd's mask-free ceiling is 77.8% vs the fused bwd's 93.1%; the verdict
points at the online-softmax VPU chain. This tool measures WHERE the VPU
time goes with diagnostic mini-kernels (each deletes one pass — invalid
numerics, timing only), then A/Bs candidate fixes:

  base      production pallas_block_fwd (mask-free / causal)
  mini      stripped local replica of the production inner loop (sanity)
  nomax     m pinned to 0: no max-reduce, no alpha, no acc rescale
  noexp     pr = s (skip exp2 only)
  nosum     skip the l row-sum reduce
  nopv      skip the PV matmul + acc (bounds matmul share)
  specmax   m_ref from the FIRST sub-tile only; later tiles reuse it with
            no max-reduce/rescale (exact when later maxes don't exceed the
            first; overflow-detectable via isinf(l) — candidate fix)
  skipresc  per-subtile max kept, but alpha/acc-rescale branch-skipped via
            pl.when on a scalar "max unchanged" predicate (candidate fix)

Run alone (no concurrent chip jobs): memory gotcha #6.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ring_flash_attn_tpu.utils.timing import timed
from ring_flash_attn_tpu.ops.mask import MaskArgs, NEG_INF
from ring_flash_attn_tpu.ops import pallas_fwd

B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
PEAK = 197e12
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _mini_kernel(info_ref, *refs, variant, causal, blk_q, blk_kv, sub,
                 num_kv_blocks):
    q_ref, k_ref, v_ref, out_ref, lse_ref, m_s, l_s, acc_s = refs
    n_sub = blk_kv // sub
    iq = pl.program_id(2)
    ikv = pl.program_id(3)
    is_last = ikv == num_kv_blocks - 1

    @pl.when(ikv == 0)
    def _init():
        m_s[:, :1] = jnp.full((blk_q, 1), NEG_INF, jnp.float32)
        l_s[:, :1] = jnp.zeros((blk_q, 1), jnp.float32)
        acc_s[...] = jnp.zeros_like(acc_s)

    def _logits(start):
        return jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0, start:start + sub, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _mask(s, start):
        if not causal:
            return s
        qp = iq * blk_q + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, 1), 0)
        kp = ikv * blk_kv + start + jax.lax.broadcasted_iota(
            jnp.int32, (1, sub), 1)
        return jnp.where(qp >= kp, s, NEG_INF)

    def _pv(pr_v, start):
        return jax.lax.dot_general(
            pr_v.astype(v_ref.dtype), v_ref[0, 0, start:start + sub, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _update_base(start, masked):
        s = _logits(start)
        if masked:
            s = _mask(s, start)
        m_prev = m_s[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        pr = jnp.exp2(s - m_new)
        l_s[:, :1] = l_s[:, :1] * alpha + jnp.sum(pr, axis=1, keepdims=True)
        acc_s[...] = acc_s[...] * alpha + _pv(pr, start)
        m_s[:, :1] = m_new

    def _update_nomax(start, masked):
        s = _logits(start)
        if masked:
            s = _mask(s, start)
        pr = jnp.exp2(s)  # WRONG numerics; timing only
        l_s[:, :1] = l_s[:, :1] + jnp.sum(pr, axis=1, keepdims=True)
        acc_s[...] = acc_s[...] + _pv(pr, start)

    def _update_noexp(start, masked):
        s = _logits(start)
        if masked:
            s = _mask(s, start)
        m_prev = m_s[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        pr = s - m_new  # WRONG: no exp2
        l_s[:, :1] = l_s[:, :1] * alpha + jnp.sum(pr, axis=1, keepdims=True)
        acc_s[...] = acc_s[...] * alpha + _pv(pr, start)
        m_s[:, :1] = m_new

    def _update_nosum(start, masked):
        s = _logits(start)
        if masked:
            s = _mask(s, start)
        m_prev = m_s[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        pr = jnp.exp2(s - m_new)
        acc_s[...] = acc_s[...] * alpha + _pv(pr, start)
        m_s[:, :1] = m_new

    def _update_nopv(start, masked):
        s = _logits(start)
        if masked:
            s = _mask(s, start)
        m_prev = m_s[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        pr = jnp.exp2(s - m_new)
        l_s[:, :1] = l_s[:, :1] * alpha + jnp.sum(pr, axis=1, keepdims=True)
        acc_s[:, :1] = acc_s[:, :1] * alpha + jnp.sum(
            pr, axis=1, keepdims=True)
        m_s[:, :1] = m_new

    def _update_specmax(start, masked, first):
        s = _logits(start)
        if masked:
            s = _mask(s, start)
        if first:
            m_ref = jnp.max(s, axis=1, keepdims=True)
            m_s[:, :1] = m_ref
        else:
            m_ref = m_s[:, :1]
        pr = jnp.exp2(s - m_ref)
        l_s[:, :1] = l_s[:, :1] + jnp.sum(pr, axis=1, keepdims=True)
        acc_s[...] = acc_s[...] + _pv(pr, start)

    def _update_skipresc(start, masked):
        s = _logits(start)
        if masked:
            s = _mask(s, start)
        m_prev = m_s[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        # scalar: does ANY row's max grow?
        grew = jnp.any(m_cur > m_prev)

        @pl.when(grew)
        def _rescale():
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_new)
            l_s[:, :1] = l_s[:, :1] * alpha
            acc_s[...] = acc_s[...] * alpha
            m_s[:, :1] = m_new

        m_now = m_s[:, :1]
        pr = jnp.exp2(s - m_now)
        l_s[:, :1] = l_s[:, :1] + jnp.sum(pr, axis=1, keepdims=True)
        acc_s[...] = acc_s[...] + _pv(pr, start)

    for t in range(n_sub):
        masked = causal  # mini kernel: no diagonal detection, mask always
        if variant == "base":
            _update_base(t * sub, masked)
        elif variant == "nomax":
            _update_nomax(t * sub, masked)
        elif variant == "noexp":
            _update_noexp(t * sub, masked)
        elif variant == "nosum":
            _update_nosum(t * sub, masked)
        elif variant == "nopv":
            _update_nopv(t * sub, masked)
        elif variant == "specmax":
            first = t == 0
            if not first:
                _update_specmax(t * sub, masked, False)
            else:
                @pl.when(ikv == 0)
                def _f():
                    _update_specmax(t * sub, masked, True)

                @pl.when(ikv != 0)
                def _nf():
                    _update_specmax(t * sub, masked, False)
        elif variant == "skipresc":
            _update_skipresc(t * sub, masked)
        else:
            raise ValueError(variant)

    @pl.when(is_last)
    def _flush():
        l = l_s[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_s[...] / l_safe).astype(out_ref.dtype)
        lse_ref[0, 0] = (m_s[:, :1] + jnp.log2(l_safe)) * jnp.float32(_LN2)


def mini_fwd(q, k, v, scale, variant, causal=False, blk_q=1024,
             blk_kv=2048, sub=1024):
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv
    k = (k.astype(jnp.float32) * (scale * _LOG2E)).astype(k.dtype)
    n_q, n_kv = sq // blk_q, skv // blk_kv
    grid = (b, hq, n_q, n_kv)
    kernel = functools.partial(
        _mini_kernel, variant=variant, causal=causal, blk_q=blk_q,
        blk_kv=blk_kv, sub=sub, num_kv_blocks=n_kv)
    info = np.zeros((4,), np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, d),
                         lambda bi, hi, qi, ki, i: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_kv, d),
                         lambda bi, hi, qi, ki, i: (bi, hi // group, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_kv, d),
                         lambda bi, hi, qi, ki, i: (bi, hi // group, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk_q, d),
                         lambda bi, hi, qi, ki, i: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q, 1),
                         lambda bi, hi, qi, ki, i: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sq, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, hq, sq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(info, q, k, v)
    return out, lse


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)
    scale = D**-0.5
    flops_f = 4 * S * S * HQ * D

    def run(name, fn, flops=flops_f):
        f = jax.jit(fn)
        try:
            dt = timed(lambda q_: f(q_, k, v), q)
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}")
            return None
        print(f"{name:32s} {dt*1e3:7.2f} ms  {flops/dt/PEAK*100:5.1f}% peak",
              flush=True)
        return dt

    # production mask-free reference (today's chip state)
    run("prod maskfree", lambda q_, k_, v_: pallas_fwd.pallas_block_fwd(
        q_, k_, v_, scale, MaskArgs(), out_dtype=jnp.bfloat16)[0])

    for variant in ["base", "nomax", "noexp", "nosum", "nopv",
                    "specmax", "skipresc"]:
        run(f"mini {variant} maskfree",
            lambda q_, k_, v_, variant=variant: mini_fwd(
                q_, k_, v_, scale=scale, variant=variant)[0])

    # numerics sanity for the two candidate fixes (mask-free, exact cases)
    o0, l0 = jax.jit(functools.partial(
        mini_fwd, scale=scale, variant="base"))(q, k, v)
    for variant in ["specmax", "skipresc"]:
        o1, l1 = jax.jit(functools.partial(
            mini_fwd, scale=scale, variant=variant))(q, k, v)
        do = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                   - o0.astype(jnp.float32))))
        dl = float(jnp.max(jnp.abs(l1 - l0)))
        print(f"  {variant} vs base: max|dout|={do:.2e} max|dlse|={dl:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
