"""cfd2_tpu — a TPU-native 2D incompressible Navier–Stokes framework.

A ground-up JAX/XLA re-design with the capabilities of the reference
Rust+WGPU solver (TSultanov/cfd-demo2): finite-volume coupled (u,v,p) solve on
unstructured polygonal meshes, FGMRES + SIMPLE/Schur preconditioning with
Chebyshev, multigrid, or block-Jacobi relaxation, cut-cell/Delaunay/Voronoi
meshing, and headless visualization — with every per-step computation jitted
on device and zero host round-trips inside the time loop.

Quick start::

    from cfd2_tpu import ChannelWithObstacle, generate_cut_cell_mesh, CoupledSolver
    geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
    mesh = generate_cut_cell_mesh(geo, 0.02, 0.02, 1.2, (3.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_dt(0.005)
    s.run(100)
"""

__version__ = "0.1.0"

from .mesh import (  # noqa: E402
    BackwardsStep,
    ChannelWithObstacle,
    Geometry,
    Mesh,
    RectangularChannel,
    generate_cut_cell_mesh,
    generate_delaunay_mesh,
    generate_voronoi_mesh,
)
from .models.coupled import CoupledSolver, multi_step, step  # noqa: E402
from .runtime.state import (  # noqa: E402
    SolverConfig,
    SolverParams,
    SolverState,
    initial_state,
)
from .runtime.device_mesh import DeviceMesh, encode_mesh  # noqa: E402

__all__ = [
    "Geometry", "ChannelWithObstacle", "BackwardsStep", "RectangularChannel",
    "Mesh", "generate_cut_cell_mesh", "generate_delaunay_mesh",
    "generate_voronoi_mesh",
    "CoupledSolver", "step", "multi_step",
    "SolverConfig", "SolverParams", "SolverState", "initial_state",
    "DeviceMesh", "encode_mesh",
]
