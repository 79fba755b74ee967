"""Checkpoint / resume for CP training state (orbax-backed).

The reference is a stateless library — its only per-step state
(DATA_PARAMS) is recomputed per batch, and it ships no checkpointing
(SURVEY.md §5). A *framework* needs one: long-context training runs are
exactly the runs that need resumable state. This wraps orbax's
PyTreeCheckpointer with the two context-parallel-specific concerns:

- **Sharded state**: params/opt-state saved from and restored to a
  jax.sharding layout — orbax handles device-sharded arrays natively; the
  restore target sharding comes from an `abstract` pytree (shapes, dtypes,
  shardings), so a checkpoint written on one mesh can resume on another.
- **Step metadata**: the dropout seed schedule and data position must
  resume exactly (deterministic dropout keys off (seed, step)); `step`
  and user metadata ride in the same checkpoint.
"""

import json
import os

import jax

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the base image
    _HAS_ORBAX = False


def save_checkpoint(path, state, step, metadata=None):
    """Save a training-state pytree (+ step and metadata) to `path`.

    state: any pytree of jax Arrays (params, opt state, ...), possibly
    sharded. path: directory (orbax tree at path/state, JSON sidecar at
    path/meta.json — a sidecar so metadata survives sharded template
    restores with any structure). Overwrites."""
    assert _HAS_ORBAX, "orbax-checkpoint is required for checkpointing"
    path = str(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "state"), state, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": int(step), "metadata": metadata or {}}, f)


def restore_checkpoint(path, abstract_state=None):
    """Restore (state, step, metadata) from `path`.

    abstract_state: optional pytree of jax.ShapeDtypeStruct (with shardings
    for a sharded restore); None restores as saved (replicated arrays)."""
    assert _HAS_ORBAX, "orbax-checkpoint is required for checkpointing"
    path = str(path)
    ckptr = ocp.PyTreeCheckpointer()
    if abstract_state is None:
        state = ckptr.restore(os.path.join(path, "state"))
    else:
        state = ckptr.restore(
            os.path.join(path, "state"),
            args=ocp.args.PyTreeRestore(item=abstract_state),
        )
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, int(meta["step"]), meta.get("metadata", {})


def abstract_like(tree, sharding=None):
    """ShapeDtypeStruct pytree matching `tree` (optionally with sharding),
    for sharded restores onto a fresh mesh."""
    def one(x):
        return jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=sharding if sharding is not None else getattr(
                x, "sharding", None
            ),
        )

    return jax.tree.map(one, tree)
