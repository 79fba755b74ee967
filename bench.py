"""Headline benchmark. Prints ONE JSON line to stdout.

Metric selection mirrors the reference's methodology (BASELINE.md): the
reference reports ring-variant iter/s as a fraction of the "theoretic
flash_attn" roofline — single-device flash attention / world_size. With
multiple devices available we run that exact zigzag-vs-roofline metric; on a
single chip (this harness exposes one real TPU) the honest analog is the
building block both metrics stand on: single-chip causal flash attention
fwd+bwd, reported as % of the chip's bf16 peak.

vs_baseline: ratio of our %-of-own-chip-peak to the reference's flash-attn
% of its own chip's peak on 8xH800 — from BASELINE.md: 154.7 it/s fwd+bwd at
(S=8192, 32 q-heads, 8 kv-heads, D=128, causal, bf16), i.e.
154.7 * 1.924e12 FLOP / 989.5 TFLOP/s = 30.1% of H800 peak.
(For the multi-device path, vs_baseline is our zigzag roofline fraction over
the reference's 0.902, README.md:84-85.)
"""

import json
import sys

import jax
import jax.numpy as jnp

# Reference benchmark shape (reference benchmark/benchmark_kvpacked_func.py:22-27)
B, HQ, HKV, S, D = 1, 32, 8, 8192, 128
CAUSAL = True
FWD_FLOPS = 4 * S * S * HQ * D * 0.5  # algorithmic, causal
FWDBWD_FLOPS = FWD_FLOPS * 3.5  # fwd + 2.5x bwd (algorithmic)

PEAK_BY_KIND = {  # dense bf16 TFLOP/s per chip
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}
REF_FLASH_PCT_PEAK = 30.1  # H800 flash-attn fwd+bwd, see module docstring
REF_ZIGZAG_ROOFLINE_FRAC = 0.902  # reference README.md:84-85

# Chip-state anchor (VERDICT r4 weak #7): the tunnel chip's speed varies
# ~15% across sessions (docs/DESIGN.md §7c2), silently shifting %-of-peak
# between rounds. The anchor is a FIXED kernel at a PINNED config — the
# mask-free fwd at the headline shape with r4's production blocks — whose
# r4-session time is recorded below. anchor_ms in the BENCH JSON lets any
# two rounds be compared on equal chip state:
#   value_anchor_norm = value * (anchor_ms / ANCHOR_REF_MS)
# (a faster chip today shrinks anchor_ms, deflating the normalized value
# by exactly the session speedup).
ANCHOR_REF_MS = 7.17  # r4 session, tools/exp_fwd_r3.py mask-free kv2048


def chip_peak():
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BY_KIND.items():
        if kind.startswith(k):
            return v
    print(f"unknown device kind {kind!r}, assuming v5e peak", file=sys.stderr)
    return 197e12


from ring_flash_attn_tpu.utils.timing import timed  # noqa: E402 — host-fetch
# barrier + feedback chain; block_until_ready is a NO-OP on the axon tunnel


def bench_single_chip():
    from ring_flash_attn_tpu.ops.flash import flash_attention
    from ring_flash_attn_tpu.ops.mask import MaskArgs

    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.bfloat16)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, S, D), jnp.bfloat16)
    scale = D**-0.5
    mask = MaskArgs(causal=CAUSAL)

    # k/v/dout as jit ARGS (closure device arrays become jit constants
    # whose lowering re-fetches them through the harness tunnel)
    def loss(q, k, v, dout_):
        o, _ = flash_attention(q, k, v, scale, mask)
        return jnp.sum(o.astype(jnp.float32) * dout_.astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, (0, 1, 2)))

    def step(q_):
        dq, dk, dv = grad(q_, k, v, dout)
        return dq.astype(jnp.bfloat16)

    fwd_j = jax.jit(lambda q_, k_, v_: flash_attention(
        q_, k_, v_, scale, mask)[0].astype(jnp.bfloat16))
    fwd = lambda q_: fwd_j(q_, k, v)
    dt_fwd = timed(fwd, q)
    dt = timed(step, q)

    # chip-state anchor: PINNED kernel + config (see ANCHOR_REF_MS)
    from ring_flash_attn_tpu.ops.pallas_fwd import pallas_block_fwd
    # softmax_mode pinned to "online": the anchor must measure the SAME
    # computation every round (r4's 7.17 ms was the online kernel; r5's
    # spec default is a different program and belongs in `value`, not in
    # the chip-state normalizer).
    anchor_j = jax.jit(lambda q_, k_, v_: pallas_block_fwd(
        q_, k_, v_, scale, MaskArgs(), out_dtype=jnp.bfloat16,
        blk_q=1024, blk_kv=2048, kv_sub=1024, softmax_mode="online")[0])
    dt_anchor = timed(lambda q_: anchor_j(q_, k, v), q)

    peak = chip_peak()
    print(
        f"single-chip flash: fwd {dt_fwd*1e3:.2f} ms ({FWD_FLOPS/dt_fwd/peak*100:.1f}% peak), "
        f"fwd+bwd {dt*1e3:.2f} ms ({FWDBWD_FLOPS/dt/peak*100:.1f}% peak, "
        f"{1/dt:.1f} it/s), anchor {dt_anchor*1e3:.2f} ms "
        f"(r4 ref {ANCHOR_REF_MS:.2f})",
        file=sys.stderr,
    )
    pct = FWDBWD_FLOPS / dt / peak * 100
    return {
        "metric": "flash_attn_causal_fwd_bwd_pct_of_chip_peak",
        "value": round(pct, 2),
        "unit": "%",
        "vs_baseline": round(pct / REF_FLASH_PCT_PEAK, 3),
        "anchor_ms": round(dt_anchor * 1e3, 3),
        "anchor_ref_ms": ANCHOR_REF_MS,
        "value_anchor_norm": round(pct * dt_anchor * 1e3 / ANCHOR_REF_MS, 2),
    }


def bench_multichip(n):
    """The reference's exact headline: zigzag ring fwd+bwd iter/s as a
    fraction of single-chip flash iter/s / n (reference README.md:80-104)."""
    from functools import partial

    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ring_flash_attn_tpu.ops.flash import flash_attention
    from ring_flash_attn_tpu.ops.mask import MaskArgs
    from ring_flash_attn_tpu.parallel.zigzag import zigzag_ring_attention

    scale = D**-0.5
    # per-chip S tokens => global n*S
    s_g = S * n
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, s_g, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, s_g, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, s_g, D), jnp.bfloat16)
    dout = jax.random.normal(jax.random.PRNGKey(3), (B, HQ, s_g, D), jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
             out_specs=P(None, None, "sp", None), check_vma=False)
    def zz(q, k, v):
        o, _ = zigzag_ring_attention(q, k, v, scale=scale, axis_name="sp")
        return o

    def loss(q, k, v):
        return jnp.sum(zz(q, k, v).astype(jnp.float32) *
                       dout.astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, (0, 1, 2)))

    def step(q_):
        dq, _, _ = grad(q_, k, v)
        return dq.astype(jnp.bfloat16)

    dt_ring = timed(step, q, n=10)

    # single-chip flash roofline at per-chip S
    qs = q[:, :, :S]
    ks, vs, ds = k[:, :, :S], v[:, :, :S], dout[:, :, :S]

    def loss1(q_, k_, v_):
        o, _ = flash_attention(q_, k_, v_, scale, MaskArgs(causal=True))
        return jnp.sum(o.astype(jnp.float32) * ds.astype(jnp.float32))

    grad1 = jax.jit(jax.grad(loss1, (0, 1, 2)))
    dt_flash = timed(lambda q_: grad1(q_, ks, vs)[0].astype(jnp.bfloat16), qs)

    roofline_iters = (1 / dt_flash) / n
    frac = (1 / dt_ring) / roofline_iters
    print(
        f"zigzag {1/dt_ring:.2f} it/s vs roofline {roofline_iters:.2f} it/s "
        f"({frac*100:.1f}%)",
        file=sys.stderr,
    )
    return {
        "metric": "zigzag_fwd_bwd_frac_of_flash_roofline",
        "value": round(frac * 100, 2),
        "unit": "%",
        "vs_baseline": round(frac / REF_ZIGZAG_ROOFLINE_FRAC, 3),
    }


def main():
    n = len([d for d in jax.devices() if "TPU" in d.device_kind.upper()
             or d.platform in ("tpu", "axon")])
    if n >= 2:
        result = bench_multichip(n)
    else:
        result = bench_single_chip()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
