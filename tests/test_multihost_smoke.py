"""Runs tools/multihost_smoke.py end-to-end: 2-process jax.distributed
cluster (localhost coordinator = the DCN path), 2x4 DCNxICI mesh, one
zigzag ring train step, loss equal to the single-process 8-device run.

Subprocess-based because jax.distributed must own process initialization
(it cannot join a cluster from an already-initialized test process)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_smoke():
    env = dict(os.environ, MH_SMOKE_PORT="37541")
    # the conftest pins this test process to CPU; the tool manages its own
    # workers' platform/device-count env
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "multihost_smoke.py")],
        env=env, capture_output=True, text=True, timeout=850,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "MULTIHOST SMOKE PASS" in out.stdout
