"""Device runtime: mesh encoding, solver state pytrees, profiling, checkpoint."""

from .device_mesh import DeviceMesh, encode_mesh
from .state import SolverConfig, SolverParams, SolverState, initial_state

__all__ = [
    "DeviceMesh", "encode_mesh",
    "SolverConfig", "SolverParams", "SolverState", "initial_state",
]
