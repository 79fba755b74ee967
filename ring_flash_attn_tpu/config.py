"""Backend selection for the flash-attention block kernels.

The compute path has two interchangeable backends:

- ``"pallas"``: hand-written Pallas TPU kernels (the production path).
- ``"xla"``: a pure-jnp blockwise implementation with identical semantics
  (fp32 accumulation, sentinel-masked logits, (out, lse) contract). Used on
  CPU (tests / virtual device meshes) and as a numerics oracle.
- ``"pallas_interpret"``: the Pallas kernels run under the Pallas
  interpreter — used to test kernel logic without TPU hardware.

The reference instead spans flash-attn versions with an inspect-based kwarg
shim (reference ring_flash_attn/utils.py:13-29); here backend dispatch plays
that compatibility role.
"""

import jax

_VALID = ("pallas", "xla", "pallas_interpret")
_backend_override = None


def set_backend(name):
    """Force a block-kernel backend globally (None = auto)."""
    global _backend_override
    if name is not None and name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID} or None, got {name!r}")
    _backend_override = name


def get_backend(explicit=None):
    """Resolve the backend: explicit arg > global override > platform default."""
    if explicit is not None:
        if explicit not in _VALID:
            raise ValueError(f"backend must be one of {_VALID}, got {explicit!r}")
        return explicit
    if _backend_override is not None:
        return _backend_override
    return "pallas" if jax.default_backend() == "tpu" else "xla"
