"""Framework-agnostic attention registry — the durable L5 integration
surface.

The HF-Flax monkeypatch (adapter.py) mirrors the reference's transformers
integration (reference adapters/hf_adapter.py:361-393), but HF is
deprecating Flax; any JAX LLM stack (flax linen, flax NNX, haiku, a
MaxText-style AttentionOp) ultimately needs one thing: a callable with a
stable signature it can drop in as its attention function. This module
provides that contract:

    fn(q, k, v, *, scale=None, causal=True, axis_name=None,
       segment_ids=None, positions=None, softcap=None, alibi_slopes=None,
       dropout_p=None, dropout_seed=None, window_left=None, **impl_kw)
       -> out  (same (B, S, H, D) layout and dtype as q)

- Layout is (B, S, H, D) — the flash-attn/public-api convention every HF
  and MaxText-style stack already uses; GQA via fewer K/V heads.
- Distributed impls must be called inside shard_map over `axis_name` with
  the sequence dim sharded in that impl's layout (contiguous for
  ring/llama3, zigzag/stripe interleavings per parallel.layouts).
- `segment_ids`/`positions` are per-shard (S_local,) int32 for packed
  (varlen) batches; batch impls ignore them being None.

Registered out of the box: flash, ring, zigzag, stripe, llama3, ulysses,
fused_ring, ring_varlen, zigzag_varlen. `register_attention` adds custom
ones (a training framework can register its own wrapper and select by
config string).

`RingAttentionLayer` wraps a registry entry as a flax NNX module so NNX
model definitions can hold it as a submodule.
"""

import jax.numpy as jnp

from ..ops.flash import flash_attention as _flash
from ..ops.mask import MaskArgs
from ..parallel.fused_ring import fused_ring_attention
from ..parallel.llama3 import llama3_attention
from ..parallel.ring import ring_attention
from ..parallel.ring_varlen import ring_attention_varlen
from ..parallel.stripe import stripe_attention
from ..parallel.ulysses import ulysses_attention
from ..parallel.zigzag import zigzag_ring_attention
from ..parallel.zigzag_varlen import zigzag_ring_attention_varlen

_REGISTRY = {}


def register_attention(name, fn, overwrite=False):
    """Register `fn` (uniform signature, see module docstring) as `name`."""
    if name in _REGISTRY and not overwrite:
        raise ValueError(f"attention impl {name!r} already registered")
    _REGISTRY[name] = fn
    return fn


def get_attention(name):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown attention impl {name!r}; available: "
            f"{sorted(_REGISTRY)}"
        ) from None


def list_attention():
    return sorted(_REGISTRY)


def _bshd(x):
    return jnp.swapaxes(x, 1, 2)


def _norm(q, scale):
    return scale if scale is not None else q.shape[-1] ** -0.5


def _extras(softcap, alibi_slopes, dropout_p, dropout_seed, window_left):
    return dict(
        softcap=softcap, alibi_slopes=alibi_slopes, dropout_p=dropout_p,
        dropout_seed=dropout_seed, window_left=window_left,
    )


def _impl_flash(q, k, v, *, scale=None, causal=True, axis_name=None,
                segment_ids=None, positions=None, softcap=None,
                alibi_slopes=None, dropout_p=None, dropout_seed=None,
                window_left=None, backend=None):
    del axis_name
    mask = MaskArgs(
        causal=causal, q_segids=segment_ids, kv_segids=segment_ids,
        q_pos=positions, kv_pos=positions, softcap=softcap,
        alibi_slopes=alibi_slopes, dropout_p=dropout_p,
        dropout_seed=dropout_seed, window_left=window_left,
    )
    out, _ = _flash(_bshd(q), _bshd(k), _bshd(v), _norm(q, scale), mask,
                    backend)
    return _bshd(out)


def _batch_impl(sched, needs_causal_kw):
    def impl(q, k, v, *, scale=None, causal=True, axis_name=None,
             segment_ids=None, positions=None, softcap=None,
             alibi_slopes=None, dropout_p=None, dropout_seed=None,
             window_left=None, **kw):
        assert axis_name is not None, "distributed impl needs axis_name"
        assert segment_ids is None and positions is None, (
            "batch impls take no varlen metadata; use the *_varlen impls"
        )
        kwargs = dict(
            scale=_norm(q, scale), axis_name=axis_name,
            **_extras(softcap, alibi_slopes, dropout_p, dropout_seed,
                      window_left), **kw,
        )
        if needs_causal_kw:
            kwargs["causal"] = causal
        else:
            assert causal, "zigzag/stripe are causal-only"
        out, _ = sched(_bshd(q), _bshd(k), _bshd(v), **kwargs)
        return _bshd(out)

    return impl


def _impl_llama3(q, k, v, *, scale=None, causal=True, axis_name=None,
                 segment_ids=None, positions=None, softcap=None,
                 alibi_slopes=None, dropout_p=None, dropout_seed=None,
                 window_left=None, heads_k_stride=None, backend=None):
    del positions  # llama3 masks with global offsets + segment labels
    assert axis_name is not None, "distributed impl needs axis_name"
    out, _ = llama3_attention(
        _bshd(q), _bshd(k), _bshd(v), segment_ids,
        scale=_norm(q, scale), causal=causal,
        heads_k_stride=heads_k_stride, axis_name=axis_name, backend=backend,
        **_extras(softcap, alibi_slopes, dropout_p, dropout_seed,
                  window_left),
    )
    return _bshd(out)


def _impl_ulysses(q, k, v, *, scale=None, causal=True, axis_name=None,
                  segment_ids=None, positions=None, softcap=None,
                  alibi_slopes=None, dropout_p=None, dropout_seed=None,
                  window_left=None, backend=None):
    assert segment_ids is None and positions is None and window_left is None
    out, _ = ulysses_attention(
        _bshd(q), _bshd(k), _bshd(v), scale=_norm(q, scale), causal=causal,
        axis_name=axis_name, backend=backend, softcap=softcap,
        alibi_slopes=alibi_slopes, dropout_p=dropout_p,
        dropout_seed=dropout_seed,
    )
    return _bshd(out)


def _impl_fused_ring(q, k, v, *, scale=None, causal=True, axis_name=None,
                     segment_ids=None, positions=None, softcap=None,
                     alibi_slopes=None, dropout_p=None, dropout_seed=None,
                     window_left=None, backend=None, **kw):
    # backend= is part of the registry's uniform impl signature; map it to
    # the fused ring's schedule-backward backend so impls stay
    # interchangeable for config-driven frameworks.
    if backend is not None:
        kw.setdefault("bwd_backend", backend)
    assert not any(
        x is not None
        for x in (segment_ids, positions, dropout_p, window_left)
    ), "fused_ring supports causal/non-causal (+softcap/ALiBi) only"
    out, _ = fused_ring_attention(
        _bshd(q), _bshd(k), _bshd(v), scale=_norm(q, scale), causal=causal,
        axis_name=axis_name, softcap=softcap, alibi_slopes=alibi_slopes,
        **kw,
    )
    return _bshd(out)


def _varlen_impl(sched, causal_kw):
    def impl(q, k, v, *, scale=None, causal=True, axis_name=None,
             segment_ids=None, positions=None, softcap=None,
             alibi_slopes=None, dropout_p=None, dropout_seed=None,
             window_left=None, backend=None):
        assert axis_name is not None, "distributed impl needs axis_name"
        assert segment_ids is not None and positions is not None, (
            "varlen impls need per-shard segment_ids and positions "
            "(ops.varlen.ring_varlen_info / zigzag_varlen_info)"
        )
        kwargs = dict(causal=causal) if causal_kw else {}
        if not causal_kw:
            assert causal, "zigzag varlen is causal-only"
        out, _ = sched(
            _bshd(q), _bshd(k), _bshd(v), segment_ids, positions,
            scale=_norm(q, scale), axis_name=axis_name, backend=backend,
            softcap=softcap, alibi_slopes=alibi_slopes, dropout_p=dropout_p,
            dropout_seed=dropout_seed, window_left=window_left, **kwargs,
        )
        return _bshd(out)

    return impl


register_attention("flash", _impl_flash)
register_attention("ring", _batch_impl(ring_attention, True))
register_attention("zigzag", _batch_impl(zigzag_ring_attention, False))
register_attention("stripe", _batch_impl(stripe_attention, False))
register_attention("llama3", _impl_llama3)
register_attention("ulysses", _impl_ulysses)
register_attention("fused_ring", _impl_fused_ring)
register_attention("ring_varlen", _varlen_impl(ring_attention_varlen, True))
register_attention(
    "zigzag_varlen", _varlen_impl(zigzag_ring_attention_varlen, False)
)


class RingAttentionLayer:
    """Stateless attention layer around a registry entry, usable as a flax
    NNX submodule (NNX treats plain objects without arrays as static) or
    called directly from linen/haiku code.

        attn = RingAttentionLayer("zigzag", axis_name="sp")
        out = attn(q, k, v)                     # (B, S, H, D)

    Per-call kwargs override the constructor's."""

    def __init__(self, impl="zigzag", *, axis_name=None, scale=None,
                 causal=True, **defaults):
        self.impl = impl
        self.defaults = dict(
            axis_name=axis_name, scale=scale, causal=causal, **defaults
        )

    def __call__(self, q, k, v, **overrides):
        kw = dict(self.defaults)
        kw.update(overrides)
        return get_attention(self.impl)(q, k, v, **kw)

    def __repr__(self):
        return f"RingAttentionLayer({self.impl!r}, {self.defaults!r})"
