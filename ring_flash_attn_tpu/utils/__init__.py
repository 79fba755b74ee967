from .debug import log_tensor, trace
from .multihost import initialize_multihost, make_cp_mesh

__all__ = ["log_tensor", "trace", "initialize_multihost", "make_cp_mesh"]
