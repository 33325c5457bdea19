"""Physical validation: laminar channel flow develops toward the analytic
Poiseuille profile.  (The reference asserts only stability/finiteness; this
pins the discretization to actual physics.)"""

import numpy as np
import pytest

from cfd2_tpu.mesh import (
    BOUNDARY_INLET,
    BOUNDARY_OUTLET,
    BOUNDARY_WALL,
    RectangularChannel,
    generate_cut_cell_mesh,
    retag_lid_cavity,
)
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


# Ghia, Ghia & Shin (1982) Table I: u through the vertical centerline
# x = 0.5 of the unit lid-driven cavity at Re = 100.
_GHIA_Y = np.array([0.0547, 0.1016, 0.1719, 0.2813, 0.4531, 0.5000,
                    0.6172, 0.7344, 0.8516, 0.9531, 0.9766])
_GHIA_U = np.array([-0.03717, -0.06434, -0.10150, -0.15662, -0.21090,
                    -0.20581, -0.13641, 0.00332, 0.23151, 0.68717, 0.84123])


def test_lid_cavity_retag_invariants():
    geo = RectangularChannel(length=1.0, height=1.0)
    mesh = generate_cut_cell_mesh(geo, 0.1, 0.1, 1.2, (1.0, 1.0))
    retag_lid_cavity(mesh, (1.0, 1.0))
    bnd = mesh.face_neighbor < 0
    tags = mesh.face_boundary[bnd]
    lid = mesh.face_cy[bnd] > 1.0 - 1e-6
    assert (tags[lid] == BOUNDARY_INLET).all()
    assert (tags == BOUNDARY_OUTLET).sum() == 1  # single pressure anchor
    assert (tags[~lid] != BOUNDARY_INLET).all()
    others = tags[~lid]
    assert ((others == BOUNDARY_WALL) | (others == BOUNDARY_OUTLET)).all()
    # Anchor sits at the corner opposite the lid.
    ref = np.flatnonzero(mesh.face_boundary == BOUNDARY_OUTLET)[0]
    assert mesh.face_cx[ref] < 0.2 and mesh.face_cy[ref] < 0.2
    assert not mesh.validate()
    with pytest.raises(ValueError):
        retag_lid_cavity(mesh, (1.0, 1.0), lid_side="left")


def test_lid_driven_cavity_ghia_re100():
    """Closed-domain capability: lid-driven cavity at Re=100 reproduces the
    Ghia et al. (1982) centerline u-profile.  Exercises the moving-wall BC
    (inlet tag on a tangential face) and the single-face pressure anchor —
    a regime the reference app never runs (its meshers hard-code channel
    BCs, cut_cell.rs:457-463), so this pins physics beyond the reference's
    own validation surface."""
    h = 1.0 / 32
    geo = RectangularChannel(length=1.0, height=1.0)
    mesh = generate_cut_cell_mesh(geo, h, h, 1.2, (1.0, 1.0))
    retag_lid_cavity(mesh, (1.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_viscosity(0.01)        # Re = U L / nu = 100
    s.set_density(1.0)
    s.set_inlet_velocity(1.0)    # lid speed
    s.set_ramp_time(0.0)
    s.set_dt(0.1)
    for _ in range(100):         # t = 10: steady by t ~ 4 (probe_cavity.py)
        s.step()
        if s.should_stop:
            break
    u = s.get_u()
    assert np.isfinite(u).all()

    # The two cell columns straddle x=0.5 (centers at 0.5 +- h/2); average
    # them per y-row — an exact interpolation to x=0.5 on the uniform grid —
    # instead of feeding duplicate y values to np.interp (advisor r3).
    col = np.abs(mesh.cell_cx - 0.5) < 0.75 * h
    yr = np.round(mesh.cell_cy[col] / h - 0.5).astype(int)
    rows = np.unique(yr)
    y = np.array([mesh.cell_cy[col][yr == j].mean() for j in rows])
    ux = np.array([u[col, 0][yr == j].mean() for j in rows])
    ui = np.interp(_GHIA_Y, y, ux)
    err = np.abs(ui - _GHIA_U).max()
    # 0.034 measured at this resolution (first-order upwind, 32x32);
    # generous headroom for platform drift.
    assert err < 0.06, f"max centerline-u error vs Ghia: {err:.4f}"
    # Primary vortex: negative return flow below center, positive near lid.
    assert ui[_GHIA_Y == 0.5][0] < -0.12
    assert ui[-1] > 0.7


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
