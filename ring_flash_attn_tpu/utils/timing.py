"""Benchmark timing that stays honest on remote-tunnel platforms.

Two traps this helper exists to avoid (both observed on this harness):

1. ``jax.block_until_ready`` can be a NO-OP on experimental remote platforms
   (the axon TPU tunnel): it returns in microseconds while the chip is still
   working, so ``time.time()`` around it measures pure dispatch (~40 us/call,
   i.e. "7800% of peak"). The only reliable barrier is fetching a value to
   the host.
2. Repeated identical calls can be content-cached by the remote-execution
   layer; feeding part of the output back as the next input defeats that.

``timed`` therefore runs a feedback chain twice, at lengths ``n0`` and
``n0 + n``, with a host fetch of a scalar reduction at the end of each, and
reports the slope ``(t2 - t1) / n`` — per-call device time with the fetch
and dispatch overhead cancelled out.
"""

import time

import jax
import jax.numpy as jnp

__all__ = ["timed", "fetch_barrier"]

_SUM = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def fetch_barrier(x):
    """Force completion of all work feeding ``x`` by fetching a scalar."""
    leaf = jax.tree.leaves(x)[0]
    return float(jax.device_get(_SUM(leaf)))


def timed(step, x0, n=20, n0=3):
    """Per-call seconds of ``step`` via a two-point feedback-chain slope.

    ``step`` must return something shaped like its input (fed back each
    iteration). ``x0`` is never donated or mutated.
    """
    # warm-up: compile step and the fetch program, drain in-flight work
    fetch_barrier(step(x0))

    def chain(m):
        x = x0
        t0 = time.time()
        for _ in range(m):
            x = step(x)
        fetch_barrier(x)
        return time.time() - t0

    t1 = chain(n0)
    t2 = chain(n0 + n)
    return max((t2 - t1) / n, 1e-9)
