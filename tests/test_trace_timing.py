"""Unit tests for the xplane trace parsers (utils/trace_timing).

Builds synthetic xplane protos — no profiler or hardware needed — and
asserts the two aggregation semantics:

  * parse_device_time: SUM of event durations, copy-start/done split out;
  * parse_device_busy: interval UNION, so an async op (slice-start /
    copy-start) whose event spans its whole start->done window does not
    double-count the compute it overlaps.

The overlap case mirrors what the serving decode step showed on hardware:
weight-stream slice-starts concurrent with the matmuls made the duration
sum read ~5x the wall time of the enclosing while op.
"""

import os

import pytest

pb = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")

from ring_flash_attn_tpu.utils.trace_timing import (  # noqa: E402
    parse_device_busy,
    parse_device_time,
)

PS = 1  # event times below are in picoseconds already


def _write_space(tmpdir, planes):
    """planes: [(plane_name, [(line_name, ts_ns, [(op, off, dur)])])]"""
    space = pb.XSpace()
    for pname, lines in planes:
        plane = space.planes.add()
        plane.name = pname
        next_id = 1
        ids = {}
        for lname, ts_ns, events in lines:
            line = plane.lines.add()
            line.name = lname
            line.timestamp_ns = ts_ns
            for op, off, dur in events:
                if op not in ids:
                    ids[op] = next_id
                    md = plane.event_metadata[next_id]
                    md.id = next_id
                    md.name = op
                    next_id += 1
                ev = line.events.add()
                ev.metadata_id = ids[op]
                ev.offset_ps = off
                ev.duration_ps = dur
    path = os.path.join(tmpdir, "host.xplane.pb")
    with open(path, "wb") as f:
        f.write(space.SerializeToString())
    return tmpdir


def test_sum_vs_union_overlap(tmp_path):
    d = str(tmp_path)
    # one device plane: matmul [0,100), async slice-start [50,150)
    # (overlaps the matmul by 50), then a gap, then fusion [200,250)
    _write_space(
        d,
        [
            (
                "/device:TPU:0",
                [
                    (
                        "XLA Ops",
                        0,
                        [
                            ("%matmul.1", 0, 100 * PS),
                            ("%slice-start.1", 50, 100 * PS),
                            ("%fusion.2", 200, 50 * PS),
                        ],
                    )
                ],
            )
        ],
    )
    comp, cop, by_op = parse_device_time(d)
    assert comp == pytest.approx(250e-12)  # 100 + 100 + 50, double-counted
    assert cop == 0
    assert by_op["%slice-start.1"] == pytest.approx(100e-12)
    busy = parse_device_busy(d)
    assert busy == pytest.approx(200e-12)  # [0,150) u [200,250)


def test_copy_split_and_host_plane_ignored(tmp_path):
    d = str(tmp_path)
    _write_space(
        d,
        [
            (
                "/device:TPU:0",
                [
                    (
                        "XLA Ops",
                        0,
                        [
                            ("%copy-start.3", 0, 40 * PS),
                            ("%copy-done.3", 40, 10 * PS),
                            ("%kernel.9", 60, 40 * PS),
                        ],
                    ),
                    # rollup lines ("Steps", "XLA Modules") must be skipped
                    ("XLA Modules", 0, [("%whole_module", 0, 1000 * PS)]),
                ],
            ),
            # host planes never counted
            ("Host Threads", [("XLA Ops", 0, [("%hostop", 0, 999 * PS)])]),
        ],
    )
    comp, cop, by_op = parse_device_time(d)
    assert comp == pytest.approx(40e-12)
    assert cop == pytest.approx(50e-12)
    assert "%whole_module" not in by_op
    assert "%hostop" not in by_op
    # union includes the copies (they occupy the timeline) but not the
    # rollup/host lines
    assert parse_device_busy(d) == pytest.approx(90e-12)


def test_line_timestamp_offsets_merge_across_lines(tmp_path):
    d = str(tmp_path)
    # two "XLA Ops" lines with different base timestamps whose events
    # overlap in absolute time: union must merge across lines
    _write_space(
        d,
        [
            (
                "TPU:0 ops",
                [
                    ("XLA Ops", 0, [("%a", 0, 2000 * PS)]),
                    ("XLA Ops", 1, [("%b", 0, 2000 * PS)]),  # +1000 ps
                ],
            )
        ],
    )
    assert parse_device_busy(d) == pytest.approx(3000e-12)
    comp, _, _ = parse_device_time(d)
    assert comp == pytest.approx(4000e-12)


def test_no_protos_raises(tmp_path):
    with pytest.raises(RuntimeError):
        parse_device_time(str(tmp_path))
    with pytest.raises(RuntimeError):
        parse_device_busy(str(tmp_path))
