"""Block flash-attention entry points + single-device differentiable API.

`block_fwd` / `block_bwd` are the L1 kernel boundary of the framework — the
role flash-attn's private `_flash_attn_forward/_backward` play in the
reference (imported at reference ring_flash_attn.py:3). Schedules call these
directly; `flash_attention` wraps them in a `jax.custom_vjp` for standalone
single-device use (and as the oracle the distributed tests compare against).

Internal layout is (B, H, S, D); the public api layer handles flash-attn's
(B, S, H, D) convention.
"""

import jax
import jax.numpy as jnp
import numpy as _np

from ..config import get_backend
from .mask import MaskArgs
from .naive import naive_block_fwd, naive_block_bwd


def block_fwd(q, k, v, scale, mask: MaskArgs, backend=None, out_dtype=None):
    """One attention block: returns (out (B,Hq,Sq,D), lse f32 (B,Hq,Sq)).

    out is fp32 (the mergeable contract) unless out_dtype narrows it —
    single-call paths pass q.dtype so the kernel writes the final dtype
    directly instead of paying an extra cast pass over HBM."""
    backend = get_backend(backend)
    if backend == "xla":
        out, lse = naive_block_fwd(q, k, v, scale, mask)
        return (out.astype(out_dtype) if out_dtype else out), lse
    from .pallas_fwd import pallas_block_fwd

    return pallas_block_fwd(
        q, k, v, scale, mask, interpret=(backend == "pallas_interpret"),
        out_dtype=out_dtype,
    )


def block_bwd(dout, q, k, v, lse, delta, scale, mask: MaskArgs, backend=None,
              dq_dtype=None, out=None, dkv_dtype=None):
    """Block backward: returns (dq, dk, dv) fp32, dk/dv reduced over GQA group.

    dq is fp32 (the schedules accumulate it across ring steps) unless
    dq_dtype narrows it — single-call paths pass q.dtype so the kernel
    writes the final dtype directly instead of paying a cast pass.

    `delta = rowsum(dout * out)` is computed once by the caller (it only
    depends on the final merged out), unlike the reference which lets each
    flash-bwd call recompute it internally. Single-call paths may instead
    pass delta=None + out=<forward out>: the fused kernel then computes
    delta in-kernel from the streamed blocks, deleting the separate XLA
    pass over dout/out (one fewer full HBM round-trip).
    """
    backend = get_backend(backend)
    if delta is None:
        assert out is not None, "delta=None requires the forward out"
    if backend == "xla":
        if delta is None:
            delta = compute_delta(dout, out)
        dq, dk, dv = naive_block_bwd(dout, q, k, v, lse, delta, scale, mask)
        if dkv_dtype is not None:
            dk, dv = dk.astype(dkv_dtype), dv.astype(dkv_dtype)
        return (dq.astype(dq_dtype) if dq_dtype else dq), dk, dv
    from .pallas_bwd import pallas_block_bwd

    return pallas_block_bwd(
        dout, q, k, v, lse, delta, scale, mask,
        interpret=(backend == "pallas_interpret"), dq_dtype=dq_dtype,
        out=out, dkv_dtype=dkv_dtype,
    )


def compute_delta(dout, out):
    """delta_i = sum_d dout[i,d] * out[i,d], fp32, shape (B, H, S)."""
    return jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )


# ---------------------------------------------------------------------------
# Single-device differentiable flash attention (internal layout).
# ---------------------------------------------------------------------------


_STATIC_MASK_TYPES = (bool, int, float, _np.integer, _np.floating, type(None))


def flash_attention(q, k, v, scale, mask: MaskArgs, backend=None):
    """Differentiable single-device flash attention; returns (out, lse).

    out is cast to q.dtype, lse stays fp32 — the contract the reference's
    autograd Functions expose (reference ring_flash_attn.py:192-200).
    Dynamic mask fields (traced dropout_seed / segids / positions / offsets)
    ride as an explicit zero-cotangent custom_vjp argument — closing over a
    tracer would fail at grad time — mirroring how the distributed
    schedules thread the seed (parallel/ring.py:175-201).
    """
    dyn = {
        name: val for name, val in mask._asdict().items()
        if not isinstance(val, _STATIC_MASK_TYPES)
    }

    @jax.custom_vjp
    def f(q, k, v, dyn):
        out, lse = block_fwd(q, k, v, scale, mask._replace(**dyn), backend,
                             out_dtype=q.dtype)
        return out, lse

    def f_fwd(q, k, v, dyn):
        out, lse = block_fwd(q, k, v, scale, mask._replace(**dyn), backend,
                             out_dtype=q.dtype)
        return (out, lse), (q, k, v, dyn, out, lse)

    def f_bwd(res, grads):
        q, k, v, dyn, out, lse = res
        dout, _ = grads  # no gradient path through lse, as in the reference
        # delta=None: the fused kernel computes delta in-kernel from the
        # streamed dout/out blocks (saves the separate XLA HBM pass);
        # dq/dk/dv emitted in the caller dtypes directly (no cast passes)
        dq, dk, dv = block_bwd(dout, q, k, v, lse, None, scale,
                               mask._replace(**dyn), backend,
                               dq_dtype=q.dtype, out=out,
                               dkv_dtype=k.dtype)
        return (dq, dk.astype(k.dtype), dv.astype(v.dtype), None)

    f.defvjp(f_fwd, f_bwd)
    return f(q, k, v, dyn)
