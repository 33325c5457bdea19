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


def test_bdf2_stable_after_dt_change(bstep_mesh):
    """A single set_dt change must not pin the BDF2 step ratio: dt_old
    rotates to the step actually taken, so r = dt/dt_old returns to 1.
    (Variable-step BDF2 is zero-UNstable for constant r > 1+sqrt(2);
    the un-rotated ratio blew up from round-off fields in ~8 steps.)"""
    s = CoupledSolver(bstep_mesh)
    s.set_viscosity(0.001)
    s.set_ramp_time(0.5)
    s.set_time_scheme(1)
    s.set_dt(float(s.params.dt) * 4.0)   # r would be 4 > 1+sqrt(2)
    for _ in range(12):
        s.step()
    u = s.get_u()
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 10.0, "BDF2 blow-up after dt change"

    # run() (the scanned path) must rotate too.
    s2 = CoupledSolver(bstep_mesh)
    s2.set_viscosity(0.001)
    s2.set_ramp_time(0.5)
    s2.set_time_scheme(1)
    s2.set_dt(float(s2.params.dt) * 4.0)
    s2.run(12)
    u2 = s2.get_u()
    assert np.isfinite(u2).all()
    assert np.abs(u2).max() < 10.0
