from .debug import log_tensor, trace
from .multihost import initialize_multihost, make_cp_mesh
from .checkpoint import abstract_like, restore_checkpoint, save_checkpoint

__all__ = [
    "log_tensor",
    "trace",
    "initialize_multihost",
    "make_cp_mesh",
    "save_checkpoint",
    "restore_checkpoint",
    "abstract_like",
]
