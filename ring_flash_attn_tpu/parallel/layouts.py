"""Sequence-sharding layout transforms (global <-> per-rank local).

These are the JAX equivalents of the reference tests' `extract_local`
helpers, which define each schedule's token layout:

- contiguous: rank r holds tokens [r*L, (r+1)*L)  (basic ring / llama3;
  reference test/test_ring_flash_attn_func.py:36)
- zigzag: split into 2W chunks; rank r holds chunks [r, 2W-1-r]
  (reference test/test_zigzag_ring_flash_attn_func.py:9-14)
- stripe: token t lives on rank t % W at local index t // W
  (reference test/test_stripe_flash_attn_func.py:9-14: split->stack->transpose)

All operate on the sequence axis `axis` of a global array and return either
the shard for one rank (for tests) or the full resharded array ordered by
rank (for feeding a shard_map). Position-id helpers give each layout's true
global token positions, needed for rotary embeddings in model integration.
"""

import jax.numpy as jnp
import numpy as np


def _chunks(x, n, axis):
    return jnp.split(x, n, axis=axis)


def extract_local_contiguous(x, rank, world, axis=1):
    return _chunks(x, world, axis)[rank]


def extract_local_zigzag(x, rank, world, axis=1):
    c = _chunks(x, 2 * world, axis)
    return jnp.concatenate([c[rank], c[2 * world - 1 - rank]], axis=axis)


def extract_local_stripe(x, rank, world, axis=1):
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(rank, None, world)
    return x[tuple(sl)]


def all_local_zigzag(x, world, axis=1):
    """Global -> concat over ranks of zigzag shards (shard_map-feedable)."""
    return jnp.concatenate(
        [extract_local_zigzag(x, r, world, axis) for r in range(world)],
        axis=axis,
    )


def all_local_stripe(x, world, axis=1):
    return jnp.concatenate(
        [extract_local_stripe(x, r, world, axis) for r in range(world)],
        axis=axis,
    )


def restore_zigzag(x, world, axis=1):
    """Inverse of all_local_zigzag (rank-ordered shards -> global order)."""
    c = _chunks(x, 2 * world, axis)  # per-rank: [chunk r, chunk 2W-1-r]
    ordered = [None] * (2 * world)
    for r in range(world):
        ordered[r] = c[2 * r]
        ordered[2 * world - 1 - r] = c[2 * r + 1]
    return jnp.concatenate(ordered, axis=axis)


def restore_stripe(x, world, axis=1):
    """Inverse of all_local_stripe."""
    c = _chunks(x, world, axis)  # c[r] = tokens r, r+W, r+2W, ...
    stacked = jnp.stack(c, axis=axis + 1)  # (..., L/W, W, ...)
    shape = list(x.shape)
    return stacked.reshape(shape)


def zigzag_position_ids(rank, world, local_len):
    """Global positions of rank r's zigzag tokens (chunk r ++ chunk 2W-1-r)."""
    half = local_len // 2
    a = np.arange(half) + rank * half
    b = np.arange(half) + (2 * world - 1 - rank) * half
    return np.concatenate([a, b]).astype(np.int32)


def stripe_position_ids(rank, world, local_len):
    """Global positions of rank r's striped tokens (r, r+W, r+2W, ...)."""
    return (np.arange(local_len) * world + rank).astype(np.int32)
