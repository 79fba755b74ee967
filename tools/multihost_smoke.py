"""Two-process jax.distributed smoke over DCN (VERDICT r2 #5).

The reference's multi-host story is torchrun + NCCL; SURVEY §2 maps it to
`jax.distributed.initialize` over DCN. This harness has one host, so the
smoke spawns TWO OS processes, each exposing 4 virtual CPU devices
(xla_force_host_platform_device_count) and joining a 2-process
jax.distributed cluster over a localhost TCP coordinator — the exact
initialization path a real multi-host TPU pod uses (per-host processes +
coordinator), with DCN = loopback.

It then builds the (dp=2, sp=4) DCN×ICI mesh with
utils.multihost.make_cp_mesh and runs ONE zigzag-ring train step (loss +
grads) over globally-sharded arrays, asserting the loss is finite and
EQUAL to the single-process 8-device value (computed in-process by the
parent before spawning).

Run: python tools/multihost_smoke.py        (exit 0 = pass)
Log: committed as MULTIHOST_SMOKE.log; tests/test_multihost_smoke.py runs
this script end-to-end in the suite.
"""

import os
import subprocess
import sys

# workers are spawned as `python tools/multihost_smoke.py --worker=N`, so
# python puts tools/ (not the repo root) on sys.path; the package import
# must not depend on the caller's PYTHONPATH
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

PORT = int(os.environ.get("MH_SMOKE_PORT", "37531"))
B, HQ, HKV, E, S_LOCAL, D = 1, 4, 2, 64, 128, 32
WORLD = 8  # 2 processes x 4 local devices
SCALE = D**-0.5


def _loss_and_grad():
    """Build the sharded zigzag train step on whatever global mesh exists.
    Deterministic data from seeds => identical across cluster shapes."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ring_flash_attn_tpu.parallel.zigzag import zigzag_ring_attention
    from ring_flash_attn_tpu.parallel.layouts import all_local_zigzag
    from ring_flash_attn_tpu.utils.multihost import make_cp_mesh

    mesh = make_cp_mesh(dp=2, sp=4)
    s_g = S_LOCAL * 4
    spec = P("dp", None, "sp", None)
    sharding = NamedSharding(mesh, spec)

    def mk(seed, h):
        # identical host data on every process (seeded), then
        # make_array_from_callback assembles the GLOBAL array — the
        # multi-process path device_put cannot take (non-addressable
        # devices). zigzag layout along sp; dp splits the batch.
        x = np.asarray(jax.random.normal(
            jax.random.PRNGKey(seed), (2 * B, h, s_g, D), jnp.float32
        ))
        x = np.asarray(all_local_zigzag(jnp.asarray(x), 4, axis=2))
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx, x=x: x[idx]
        )

    q, k, v, dout = mk(0, HQ), mk(1, HKV), mk(2, HKV), mk(3, HQ)

    @partial(
        shard_map, mesh=mesh, in_specs=(spec,) * 4,
        out_specs=(P(), P("dp", None, "sp", None)), check_vma=False,
    )
    def step(q, k, v, dout):
        import jax

        def loss_fn(q, k, v):
            o, _ = zigzag_ring_attention(
                q, k, v, scale=SCALE, axis_name="sp"
            )
            return jnp.sum(o.astype(jnp.float32) * dout.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(q, k, v)
        loss = jax.lax.psum(loss, ("dp", "sp"))
        return loss, grads[0].astype(jnp.float32)

    loss, dq = jax.jit(step)(q, k, v, dout)
    # process-local sum of |dq| shards -> psum'd scalar would need another
    # collective; the loss (fully replicated) is the cross-check value
    return float(loss)


def worker(pid):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # strip any inherited device-count flag (the test suite sets =8) —
    # XLA takes the LAST occurrence, so appending is not enough
    inherited = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    os.environ["XLA_FLAGS"] = " ".join(
        ["--xla_force_host_platform_device_count=4"] + inherited
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ring_flash_attn_tpu.utils.multihost import initialize_multihost

    initialize_multihost(
        coordinator=f"localhost:{PORT}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == WORLD, len(jax.devices())
    loss = _loss_and_grad()
    print(f"process {pid}: global mesh 2x4 OK, loss={loss:.6e}", flush=True)
    if pid == 0:
        with open(os.environ["MH_SMOKE_OUT"], "w") as f:
            f.write(f"{loss:.9e}\n")


def single_process_reference():
    """Same step on one process with 8 virtual devices."""
    inherited = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=" ".join(
            ["--xla_force_host_platform_device_count=8"] + inherited
        ),
    )
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from tools.multihost_smoke import _loss_and_grad; "
        "print('%%.9e' %% _loss_and_grad())"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=600, check=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


def main():
    import tempfile

    ref = single_process_reference()
    print(f"single-process 8-device reference loss: {ref:.6e}", flush=True)

    with tempfile.NamedTemporaryFile(mode="r", suffix=".txt") as tf:
        env = dict(os.environ, MH_SMOKE_OUT=tf.name)
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), f"--worker={i}"],
                env=env,
            )
            for i in range(2)
        ]
        for p in procs:
            rc = p.wait(timeout=600)
            assert rc == 0, f"worker exited {rc}"
        dist = float(open(tf.name).read().strip())

    rel = abs(dist - ref) / max(abs(ref), 1e-30)
    print(f"2-process loss {dist:.6e} vs reference {ref:.6e} "
          f"(rel diff {rel:.2e})", flush=True)
    assert rel < 1e-6, (dist, ref)
    print("MULTIHOST SMOKE PASS: 2-process jax.distributed DCNxICI 2x4 "
          "mesh, zigzag ring train step equals single-process run")


if __name__ == "__main__":
    for a in sys.argv[1:]:
        if a.startswith("--worker="):
            worker(int(a.split("=")[1]))
            sys.exit(0)
    main()
