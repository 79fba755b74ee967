"""Multi-host setup: the torchrun/NCCL-init counterpart.

The reference initializes NCCL per process (dist.init_process_group,
test_ring_flash_attn_func.py:10). On TPU pods the same program spans hosts
via jax.distributed: each host sees its local chips, the mesh spans the
slice, and the ring schedules run unchanged — ppermute rides ICI within a
slice and DCN across slices (the mesh axis order controls which).
"""

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator=None, num_processes=None, process_id=None):
    """Initialize jax.distributed (no-op on single host / TPU pod slices
    where JAX auto-detects the topology)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process


def make_cp_mesh(dp=1, sp=None, axis_names=("dp", "sp")):
    """Build a (dp, sp) mesh over all global devices. The sp (context
    parallel) axis is laid out over the fastest-varying device order so the
    KV ring rides ICI neighbors; dp spans hosts/DCN."""
    devices = np.array(jax.devices())
    n = devices.size
    if sp is None:
        sp = n // dp
    assert dp * sp == n, (dp, sp, n)
    return Mesh(devices.reshape(dp, sp), axis_names)
