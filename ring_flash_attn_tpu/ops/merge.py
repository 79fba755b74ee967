"""Online-softmax merge of partial attention results.

TPU-native equivalent of the reference's TorchScript `update_out_and_lse`
(reference ring_flash_attn/utils.py:32-73): combine two normalized partials
(out_a, lse_a), (out_b, lse_b) into the partial for the union of their KV
sets, in fp32, using the numerically stable sigmoid/log-sigmoid form

    out = out_a - sigmoid(lse_b - lse_a) * (out_a - out_b)
    lse = lse_a - log_sigmoid(lse_a - lse_b)        # = log(e^a + e^b)

(reference utils.py:47-48). Works with the NEG_INF sentinel: a fully-masked
partial has lse ≈ -1e30, so sigmoid/exp underflow to exactly 0 and the merge
is a no-op for those rows — no NaNs, no special cases.

The reference's Triton LSE flatten/unflatten kernels
(reference triton_utils.py) are unnecessary here: our LSE layout is flat
(B, H, S) fp32 by design, so there is nothing to reshape.
"""

import jax
import jax.numpy as jnp


def merge_partials(out, lse, block_out, block_lse):
    """Merge (block_out, block_lse) into accumulator (out, lse), all fp32.

    out: (B, H, S, D) f32; lse: (B, H, S) f32. If out is None the block
    initializes the accumulator (reference utils.py:60-64).
    """
    if out is None:
        return block_out.astype(jnp.float32), block_lse.astype(jnp.float32)
    w = jax.nn.sigmoid(block_lse - lse)[..., None]
    new_out = out - w * (out - block_out)
    # log(e^a + e^b) in max/log1p form: the reference's a - logsigmoid(a-b)
    # (utils.py:48) catastrophically cancels when a is the NEG_INF sentinel
    # (dead partial) and b is finite; max(a,b) + log1p(e^-|a-b|) is exact in
    # every regime.
    new_lse = jnp.maximum(lse, block_lse) + jnp.log1p(
        jnp.exp(-jnp.abs(lse - block_lse))
    )
    return new_out, new_lse
