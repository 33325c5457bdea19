"""Stability-envelope tests, ported from the reference:

* tests/gpu_divergence_test.rs:5-96 — 200 adaptive-dt steps on the
  channel-with-obstacle case; fail on NaN, velocity > 20, or degeneracy.
* tests/reproduce_divergence.rs — 50 steps on backwards-step with water
  (rho=1000); residuals finite and bounded.
"""

import numpy as np

from cfd2_tpu.mesh import BackwardsStep, ChannelWithObstacle, generate_cut_cell_mesh
from cfd2_tpu.models.coupled import CoupledSolver


def test_channel_obstacle_no_divergence():
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    mesh.smooth(geo, 0.3, 50)

    s = CoupledSolver(mesh)
    s.set_dt(0.01)
    s.set_viscosity(0.01)
    s.set_density(1.0)
    s.set_scheme(0)
    # Initial condition: unit x-velocity in the first column of cells.
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < 0.05, 0] = 1.0
    s.set_u(u0)

    min_cell_size = 0.025
    target_cfl = 0.5
    max_steps = 200
    for step_i in range(max_steps):
        u = s.get_u()
        max_vel = np.linalg.norm(u, axis=1).max()
        if max_vel > 1e-6:
            s.set_dt(float(np.clip(target_cfl * min_cell_size / max_vel,
                                   1e-5, 0.1)))
        s.step()
        if s.should_stop:
            assert s.degenerate_count <= 10, "degenerate solution"
            break
        # Every step, like the reference (gpu_divergence_test.rs:62-76).
        assert np.isfinite(max_vel), f"NaN at step {step_i}"
        assert max_vel < 20.0, f"divergence at step {step_i}: {max_vel}"


def test_water_backwards_step():
    """rho=1000 (water) on the backwards step — the stiffest reference case."""
    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.5, 1.0))
    mesh.smooth(geo, 0.3, 50)

    s = CoupledSolver(mesh)
    s.set_dt(0.001)
    s.set_density(1000.0)
    s.set_viscosity(0.001)
    s.set_alpha_u(0.7)
    s.set_alpha_p(0.3)
    u0 = np.full((mesh.num_cells, 2), [0.1, 0.0])
    s.set_u(u0)

    for step_i in range(50):
        s.step()
        resid = float(s.state.outer_residual_u)
        assert np.isfinite(resid), f"NaN residual at step {step_i}"
        assert resid < 1e10, f"residual blow-up at step {step_i}"
        if s.should_stop:
            assert s.degenerate_count <= 10
            break
    u = s.get_u()
    p = s.get_p()
    assert np.isfinite(u).all()
    assert np.isfinite(p).all()
