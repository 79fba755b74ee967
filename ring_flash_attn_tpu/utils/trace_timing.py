"""On-device timing from jax.profiler traces (xplane protos).

Wall-clock timing on this harness's remote-TPU tunnel is unreliable twice
over: `jax.block_until_ready` is a no-op, and per-call dispatch latency
(~200 us) serializes with execution, so any kernel shorter than the
dispatch measures as dispatch (utils/timing.timed cancels per-CHAIN
constants, not per-ITERATION dispatch). Device traces sidestep both: the
profiler records each op's actual on-device duration. This module parses
those durations out of the xplane protobufs.

Used by tools/probe_ring_trace.py and benchmark/benchmark_decode.py; the
role torch.profiler/CUDA events play in the reference's benchmarks
(reference benchmark/benchmark_kvpacked_func.py:55-123).
"""

import glob
import os
import shutil
import tempfile
from collections import defaultdict

import jax

__all__ = [
    "parse_device_time",
    "trace_device_time",
    "parse_device_busy",
    "trace_device_busy",
]


def parse_device_time(logdir):
    """Sum on-device event durations from the xplane protos under logdir.

    Returns (compute_seconds, copy_seconds, {op_name: seconds}) over all
    TPU device planes' "XLA Ops" lines; host planes are ignored.

    copy-start/copy-done ops are split out of the compute sum: on this
    harness they are the tunnel re-staging jit arguments per call (a bf16
    64 MB operand shows ~4.3 ms = ~15 GB/s — PCIe/tunnel rate, not the
    819 GB/s HBM), i.e. a harness artifact a normal TPU host never pays in
    steady state. They are reported separately, never silently dropped.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    compute_ps = 0
    copy_ps = 0
    by_op = defaultdict(int)
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            name = plane.name
            is_device = ("TPU" in name or "/device:" in name) and (
                "Host" not in name
            )
            if not is_device:
                continue
            metadata = plane.event_metadata
            for line in plane.lines:
                # "XLA Ops" is the per-kernel line; skip Modules/Steps
                # rollups to avoid double counting.
                if line.name and "Ops" not in line.name:
                    continue
                for ev in line.events:
                    md = metadata.get(ev.metadata_id)
                    op = md.name if md is not None else "?"
                    if op.startswith("%copy-start") or op.startswith(
                        "%copy-done"
                    ):
                        copy_ps += ev.duration_ps
                    else:
                        compute_ps += ev.duration_ps
                    by_op[op] += ev.duration_ps
    return (
        compute_ps * 1e-12,
        copy_ps * 1e-12,
        {k: v * 1e-12 for k, v in by_op.items()},
    )


def parse_device_busy(logdir):
    """Union-of-intervals device busy time (seconds) under logdir.

    ``parse_device_time`` SUMS event durations, which is exact for
    serial-kernel programs (one Pallas call dominating) but overcounts
    programs with async ops: a ``slice-start``/``copy-start`` event's
    duration spans start->done, i.e. the whole window it overlaps with
    compute, so summing counts the same nanoseconds twice. This parser
    instead merges every "XLA Ops" event into a per-device interval
    union — concurrent DMA + compute count once — which is the honest
    cost of an overlapped (e.g. weight-streaming decode) program.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    intervals = []
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            name = plane.name
            is_device = ("TPU" in name or "/device:" in name) and (
                "Host" not in name
            )
            if not is_device:
                continue
            for line in plane.lines:
                if line.name and "Ops" not in line.name:
                    continue
                base_ps = line.timestamp_ns * 1000
                for ev in line.events:
                    s = base_ps + ev.offset_ps
                    intervals.append((s, s + ev.duration_ps))
    intervals.sort()
    busy_ps = 0
    cur_s = cur_e = None
    for s, e in intervals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy_ps += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy_ps += cur_e - cur_s
    return busy_ps * 1e-12


def trace_device_busy(fn, feedback, n_iters=8):
    """Per-iteration union-of-intervals device busy seconds of ``fn``.

    Same feedback-chain protocol as ``trace_device_time`` but measures
    overlapped async ops honestly (see ``parse_device_busy``)."""
    from .timing import fetch_barrier

    x = fn(feedback)
    fetch_barrier(x)
    logdir = tempfile.mkdtemp(prefix="devbusy_")
    try:
        with jax.profiler.trace(logdir):
            for _ in range(n_iters):
                x = fn(x)
            fetch_barrier(x)
        busy = parse_device_busy(logdir)
        _, _, by_op = parse_device_time(logdir)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)
    return busy / n_iters, {k: v / n_iters for k, v in by_op.items()}


def trace_device_time(fn, feedback, n_iters=8):
    """Per-iteration on-device compute seconds of ``fn`` (feedback-chained).

    ``fn`` must return a value shaped like ``feedback`` (fed back each
    iteration so the remote content-cache cannot skip work). The traced
    loop continues from the warmup call's OUTPUT, so ``fn`` may donate its
    argument buffers (each iteration consumes the previous one's output).
    Returns (per_iter_compute_s, {op: per_iter_s}).
    """
    from .timing import fetch_barrier

    x = fn(feedback)  # compile + drain before tracing
    fetch_barrier(x)
    logdir = tempfile.mkdtemp(prefix="devtrace_")
    try:
        with jax.profiler.trace(logdir):
            for _ in range(n_iters):
                x = fn(x)
            fetch_barrier(x)
        dev_s, _copy_s, by_op = parse_device_time(logdir)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)
    return dev_s / n_iters, {k: v / n_iters for k, v in by_op.items()}
