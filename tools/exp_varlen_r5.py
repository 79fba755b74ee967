"""Round-5: varlen FORWARD with setonce spec softmax + masked strips.

VERDICT r4 task #4: multi-segment varlen fwd is the repo's worst number
(5-seg fwd+bwd 33.0% of masked-FLOP peak) because boundary tiles pay
full-width masked passes and the r4 strip fix was fwd-incompatible (each
strip repeated the online-softmax rescale). The r5 `setonce` spec mode
removes the rescale entirely (ops/pallas_fwd.py::_update), so strips
become cheap: this sweeps softmax_mode x kv_fine per reference packing.

Run alone: PYTHONPATH=/root/.axon_site:/root/repo \
    python -u tools/exp_varlen_r5.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ring_flash_attn_tpu.ops.mask import MaskArgs
from ring_flash_attn_tpu.ops.pallas_fwd import pallas_block_fwd
from ring_flash_attn_tpu.utils.timing import timed
from ring_flash_attn_tpu.ops.varlen import (
    cu_seqlens_to_segids,
    cu_seqlens_to_positions,
)

B, HQ, HKV, D = 1, 32, 8, 128
T = 8192
PEAK = 197e12

CU_LIST = [
    [0, 8192],
    [0, 4096, 8192],
    [0, 256, 7648, 8192],
    [0, 3104, 6304, 7904, 8064, 8192],
]


def main():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, HQ, T, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, T, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, T, D), jnp.bfloat16)
    scale = D ** -0.5

    for cu in CU_LIST:
        lens = np.diff(np.asarray(cu))
        flops = float(4 * HQ * D * np.sum(lens.astype(np.float64) ** 2) * 0.5)
        seg = np.asarray(cu_seqlens_to_segids(np.asarray(cu, np.int32), T))
        pos = np.asarray(cu_seqlens_to_positions(np.asarray(cu, np.int32), T))
        mask = MaskArgs(
            causal=True, q_segids=seg, kv_segids=seg,
            q_pos=pos, kv_pos=pos, packed_self=True,
        )
        print(f"cu={cu}")
        ref = None
        for mode in ("online", "auto"):
            for fine in (1024, 512, 256):
                if mode == "online" and fine != 1024:
                    continue  # r4 already measured online+strips: a loss
                try:
                    fwd = jax.jit(
                        lambda q_, k_, v_, mode=mode, fine=fine:
                        pallas_block_fwd(
                            q_, k_, v_, scale, mask, kv_fine=fine,
                            out_dtype=jnp.bfloat16, softmax_mode=mode)[0])
                    t = timed(lambda q_: fwd(q_, k, v), q, 10)
                    if ref is None:
                        o_ref = fwd(q, k, v)
                        ref = o_ref.astype(jnp.float32)
                        err = 0.0
                    else:
                        err = float(jnp.max(jnp.abs(
                            fwd(q, k, v).astype(jnp.float32) - ref)))
                except Exception as e:  # noqa: BLE001
                    print(f"  {mode:7s} fine={fine:5d}  FAILED "
                          f"{type(e).__name__}: {str(e)[:90]}")
                    continue
                print(f"  {mode:7s} fine={fine:5d}  {t*1e3:7.2f} ms  "
                      f"{flops/t/PEAK*100:5.1f}% peak  maxerr {err:.1e}",
                      flush=True)


if __name__ == "__main__":
    main()
