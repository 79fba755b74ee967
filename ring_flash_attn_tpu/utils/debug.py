"""Observability helpers (the reference's test/utils.py log() + the
benchmark's torch.profiler integration, TPU-style)."""

import contextlib

import jax
import jax.numpy as jnp


def log_tensor(msg, a, b=None, process=None):
    """Print max/mean stats of a tensor (or of |a-b|), rank-prefixed — the
    reference's rank-ordered diff logging (test/utils.py:15-38)."""
    x = a if b is None else jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)
    )
    pid = jax.process_index() if process is None else process
    print(
        f"[{pid}] {msg}: max {float(jnp.max(x)):.3e} "
        f"mean {float(jnp.mean(x)):.3e}"
    )


@contextlib.contextmanager
def trace(path="/tmp/rfa_trace"):
    """jax.profiler trace context (reference benchmark --profile flag,
    benchmark_kvpacked_func.py:55-77 TensorBoard export equivalent)."""
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()
