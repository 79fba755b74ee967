"""Bisect the full-gate hang: run one verify_tpu case per invocation.

  python tools/bisect_gate.py <case>
cases: causal-segments-split | positions | causal-segments-compact |
       positions-compact | window | softcap
"""

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from verify_tpu import check_case  # noqa: E402
from ring_flash_attn_tpu.ops.mask import MaskArgs  # noqa: E402

SQ = SKV = 8192
segs = np.repeat(np.arange(4), SQ // 4).astype(np.int32)
ksegs = np.repeat(np.arange(4), SKV // 4).astype(np.int32)
pos = np.concatenate([np.arange(SQ // 2)] * 2).astype(np.int32)

CASES = {
    "causal-segments-split": (
        "causal-segments",
        MaskArgs(causal=True, q_segids=jnp.asarray(segs),
                 kv_segids=jnp.asarray(ksegs)),
        dict(fused_modes=(False,)),
    ),
    "positions": (
        "positions",
        MaskArgs(causal=True, q_pos=jnp.asarray(pos), kv_pos=jnp.asarray(pos),
                 q_segids=jnp.asarray(segs), kv_segids=jnp.asarray(ksegs)),
        {},
    ),
    "causal-segments-compact": (
        "causal-segments[compact]",
        MaskArgs(causal=True, q_segids=segs, kv_segids=ksegs),
        {},
    ),
    "positions-compact": (
        "positions[compact]",
        MaskArgs(causal=True, q_pos=pos, kv_pos=pos,
                 q_segids=segs, kv_segids=ksegs, packed_self=True),
        {},
    ),
    "window": ("window", MaskArgs(causal=True, window_left=1500), {}),
    "softcap": ("softcap", MaskArgs(causal=True, softcap=30.0), {}),
}

if __name__ == "__main__":
    name, mask, kw = CASES[sys.argv[1]]
    check_case(name, mask, sq=SQ, skv=SKV, **kw)
    print("case done")
