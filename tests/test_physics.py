"""Physical validation: laminar channel flow develops toward the analytic
Poiseuille profile.  (The reference asserts only stability/finiteness; this
pins the discretization to actual physics.)"""

import numpy as np
import pytest

from cfd2_tpu.mesh import RectangularChannel, generate_cut_cell_mesh
from cfd2_tpu.models.coupled import CoupledSolver


def test_poiseuille_profile():
    # Re = rho*U*H/mu = 10 -> development length ~0.5H; sample at x=2.5.
    geo = RectangularChannel(length=3.0, height=1.0)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_viscosity(0.1)
    s.set_density(1.0)
    s.set_inlet_velocity(1.0)
    s.set_ramp_time(0.05)
    s.set_dt(0.01)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[:, 0] = 1.0
    s.set_u(u0)
    for _ in range(150):
        s.step()
        if s.should_stop:
            break
    u = s.get_u()
    assert np.isfinite(u).all()

    # Sample the profile in a column near the outlet.
    col = (mesh.cell_cx > 2.4) & (mesh.cell_cx < 2.5)
    y = mesh.cell_cy[col]
    ux = u[col, 0]
    # Analytic: u(y) = 6*U_mean*y*(H-y)/H^2 with U_mean = 1 (mass conservation
    # from the uniform inlet).
    u_exact = 6.0 * y * (1.0 - y)
    err = np.abs(ux - u_exact).max() / u_exact.max()
    assert err < 0.12, f"profile error {err:.3f}"
    # Centerline velocity approaches 1.5x mean.
    center = col & (np.abs(mesh.cell_cy - 0.5) < 0.05)
    assert abs(u[center, 0].mean() - 1.5) < 0.15

    # Mass conservation: volumetric flux equals the inlet flux at any column.
    for x0 in (0.5, 1.5, 2.5):
        colx = (mesh.cell_cx > x0 - 0.05) & (mesh.cell_cx < x0)
        flux = (u[colx, 0] * mesh.cell_vol[colx]).sum() / 0.05
        assert abs(flux - 1.0) < 0.05, f"mass flux at x={x0}: {flux}"


def test_degenerate_case_trips_should_stop():
    """A zero-inlet, zero-initial-field run is uniform and non-evolving:
    the classifier must count stop_count+1 consecutive degenerate hits and
    set should_stop (reference contract coupled_solver.rs:546-580;
    gpu_divergence_test.rs panics on degenerate_count > 10)."""
    geo = RectangularChannel(length=1.0, height=1.0)
    mesh = generate_cut_cell_mesh(geo, 0.1, 0.1, 1.2, (1.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_inlet_velocity(0.0)
    s.set_dt(0.01)
    hits = s.config.stop_count
    for i in range(hits + 5):
        s.step()
        if s.should_stop:
            break
    assert s.should_stop
    assert s.degenerate_count > hits
    assert s.steady_state_count == 0
    # Fused multi-step freezes once stopped instead of burning solves.
    t_before = float(s.state.time)
    s.run(3)
    assert float(s.state.time) == t_before
