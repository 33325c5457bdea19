"""Solver on unstructured (generic-path) meshes: Delaunay and Voronoi.

The reference runs its solver only on cut-cell meshes in tests, but supports
all three generators through the same GpuSolver; this locks in the same
capability for the gather path."""

import numpy as np
import pytest

from cfd2_tpu.mesh import (
    ChannelWithObstacle,
    generate_delaunay_mesh,
    generate_voronoi_mesh,
)
from cfd2_tpu.models.coupled import CoupledSolver


@pytest.mark.parametrize("gen", [generate_delaunay_mesh,
                                 generate_voronoi_mesh])
def test_solver_on_unstructured_mesh(gen):
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = gen(geo, 0.06, 0.06, 1.2, (3.0, 1.0))
    assert mesh.validate() == []
    s = CoupledSolver(mesh)
    assert not s.mesh.structured     # exercises the gather path
    s.set_dt(0.005)
    s.set_alpha_u(0.9)
    s.set_alpha_p(0.9)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < 0.1, 0] = 1.0
    s.set_u(u0)
    for _ in range(2):
        s.step()
    u = s.get_u()
    p = s.get_p()
    assert np.isfinite(u).all()
    assert np.isfinite(p).all()
    assert np.abs(u).max() < 100.0
