"""Force-coefficient capability tests (cfd2_tpu/utils/forces.py).

CPU-runnable: geometric identities on the cut-cell obstacle, a physical
drag check on a short coarse run, and the Strouhal estimator on a
synthetic signal.
"""

import numpy as np
import pytest

from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
from cfd2_tpu.models.coupled import CoupledSolver
from cfd2_tpu.utils.forces import (
    body_force,
    force_coefficients,
    obstacle_face_mask,
    strouhal_number,
)


@pytest.fixture(scope="module")
def solver():
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5),
                              obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_dt(0.01)
    s.set_viscosity(0.01)
    s.set_density(1.0)
    return s


def test_mask_selects_obstacle_faces_only(solver):
    s = solver
    w = obstacle_face_mask(s.mesh)
    assert w.sum() > 10  # the circle is resolved by dozens of cut faces
    cx = np.asarray(s.mesh.f_cx)[w > 0]
    cy = np.asarray(s.mesh.f_cy)[w > 0]
    r = np.hypot(cx - 1.0, cy - 0.5)
    # Every selected face center sits on the circle (within a cell size).
    assert np.all(np.abs(r - 0.2) < 0.05)


def test_closed_surface_normals_sum_to_zero(solver):
    """The obstacle's cut faces form a closed polygon: sum n*A ~= 0."""
    s = solver
    w = obstacle_face_mask(s.mesh)
    nx = np.asarray(s.mesh.f_nx)
    ny = np.asarray(s.mesh.f_ny)
    A = np.asarray(s.mesh.f_area)
    perim = float((w * A).sum())
    assert perim == pytest.approx(2 * np.pi * 0.2, rel=0.15)
    assert abs(float((w * nx * A).sum())) < 1e-3 * perim
    assert abs(float((w * ny * A).sum())) < 1e-3 * perim


def test_uniform_pressure_zero_force(solver):
    """Constant p on a closed body and u = 0 -> zero net force."""
    from dataclasses import replace

    s = solver
    w = obstacle_face_mask(s.mesh)
    st = replace(s.state,
                 p=s.state.p * 0 + 7.5,
                 grad_p=s.state.grad_p * 0,
                 u=s.state.u * 0)
    f = np.asarray(body_force(s.mesh, st, s.params, w))
    perim = float((w * np.asarray(s.mesh.f_area)).sum())
    assert np.abs(f).max() < 1e-3 * 7.5 * perim


def test_drag_positive_on_started_flow(solver):
    """A few steps of impulsively started flow: drag along +x dominates."""
    s = solver
    u0 = np.zeros((s.mesh.num_host_cells, 2))
    u0[:, 0] = 0.0
    s.set_u(u0)
    s.run(8)
    w = obstacle_face_mask(s.mesh)
    cd, cl = force_coefficients(s.mesh, s.state, s.params, w,
                                u_ref=1.0, d_ref=0.4)
    cd, cl = float(cd), float(cl)
    assert np.isfinite(cd) and np.isfinite(cl)
    assert cd > 0.0
    # Symmetric geometry, pre-shedding: lift is small vs drag.
    assert abs(cl) < max(1.0, abs(cd))


def test_strouhal_estimator_synthetic():
    dt = 0.01
    t = np.arange(4000) * dt
    f = 2.5
    cl = 0.3 * np.sin(2 * np.pi * f * t) + 0.02  # offset + pure tone
    st = strouhal_number(cl, np.full(len(t), dt), u_ref=1.0, d_ref=0.4)
    assert st == pytest.approx(f * 0.4, rel=0.02)


def test_strouhal_estimator_too_short():
    cl = np.sin(np.linspace(0, 2.0, 50))  # < 2 periods
    assert strouhal_number(cl, np.full(50, 0.01)) == 0.0
