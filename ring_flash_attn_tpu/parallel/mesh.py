"""Mesh/axis helpers: the TPU-native replacement for the reference's RingComm.

The reference's ring backbone batches NCCL isend/irecv pairs to rank±1 and
overlaps them with compute via commit/wait handles (reference
ring_flash_attn/utils.py:98-151). On TPU the same fixed ring topology is a
single `jax.lax.ppermute` over a named mesh axis — XLA's latency-hiding
scheduler overlaps the collective-permute with the attention compute of the
current step because the permuted value is only consumed next step (the
schedules issue the rotation *before* computing on the resident block).
"""

import jax
from jax import lax


def ring_size(axis_name):
    return lax.axis_size(axis_name)


def ring_rank(axis_name):
    return lax.axis_index(axis_name)


def ring_rotate(x, axis_name, reverse=False):
    """Rotate x one step around the ring: device i's value moves to i+1.

    Equivalent to the reference's send to (rank+1)%W / recv from (rank-1)%W
    (reference utils.py:106-111). reverse=True rotates the other way.
    """
    n = lax.axis_size(axis_name)
    if reverse:
        perm = [(i, (i - 1) % n) for i in range(n)]
    else:
        perm = [(i, (i + 1) % n) for i in range(n)]
    return lax.ppermute(x, axis_name, perm)


def psum_exact(x, axis_names):
    """psum whose backward is the identity.

    Under shard_map (unchecked/vma-off mode) a raw `lax.psum` transposes to
    another psum, scaling cotangents by the axis size — wrong whenever the
    summed value is consumed as a replicated quantity (its true per-shard
    cotangent is just the replicated output cotangent). This is megatron's
    "g" operator; pair with an identity-forward / psum-backward "f" at
    branch entries for tensor-parallel blocks."""

    @jax.custom_vjp
    def f(x):
        return lax.psum(x, axis_names)

    def fwd(x):
        return lax.psum(x, axis_names), None

    def bwd(_, ct):
        return (ct,)

    f.defvjp(fwd, bwd)
    return f(x)
