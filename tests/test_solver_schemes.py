"""Scheme-matrix stability test, ported from the reference
tests/coupled_schemes_test.rs:78-107: 4 scheme/time-scheme combos on a coarse
backwards-step mesh, 2 steps each, all fields finite."""

import numpy as np
import pytest

from cfd2_tpu.mesh import BackwardsStep, generate_cut_cell_mesh
from cfd2_tpu.models.coupled import CoupledSolver


@pytest.fixture(scope="module")
def bstep_mesh():
    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.5, 1.0))
    mesh.smooth(geo, 0.3, 50)
    return mesh


def _run(mesh, scheme, time_scheme, num_steps=2):
    s = CoupledSolver(mesh)
    s.set_u([(0.1, 0.0)] * mesh.num_cells)
    s.set_p([0.0] * mesh.num_cells)
    s.set_dt(0.001)
    s.set_density(1.0)
    s.set_viscosity(0.01)
    s.set_alpha_u(0.9)
    s.set_alpha_p(0.9)
    s.set_scheme(scheme)
    s.set_time_scheme(time_scheme)
    for _ in range(num_steps):
        s.step()
        if s.should_stop:
            assert s.degenerate_count <= 10, "degenerate solution"
            break
    return s.get_u(), s.get_p()


@pytest.mark.parametrize("scheme,time_scheme,name", [
    (0, 0, "Upwind+Euler"),
    (1, 0, "SOU+Euler"),
    (2, 0, "QUICK+Euler"),
    (0, 1, "Upwind+BDF2"),
])
def test_coupled_schemes_stay_finite(bstep_mesh, scheme, time_scheme, name):
    u, p = _run(bstep_mesh, scheme, time_scheme)
    assert np.isfinite(u).all(), f"{name}: velocity NaN/Inf"
    assert np.isfinite(p).all(), f"{name}: pressure NaN/Inf"
    assert np.abs(u).max() < 100.0, f"{name}: velocity blow-up"
