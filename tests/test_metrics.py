"""MetricsLog tests + the gated fine-mesh test (reference
tests/gpu_fine_mesh_obstacle.rs is #[ignore]d the same way)."""

import os

import numpy as np
import pytest

from cfd2_tpu.utils import MetricsLog


def test_metrics_log_accumulates(tmp_path):
    log = MetricsLog()
    log.append({"time": np.array([0.1, 0.2, 0.3]),
                "outer_iters": np.array([5, 4, 3])})
    log.append({"time": np.array([0.4]), "outer_iters": np.array([2])})
    assert len(log) == 4
    assert log["outer_iters"].tolist() == [5, 4, 3, 2]
    s = log.summary()
    assert "outer_iters" in s and "4 steps" in s
    path = os.path.join(tmp_path, "m.jsonl")
    log.to_jsonl(path)
    assert sum(1 for _ in open(path)) == 4


def test_solver_run_feeds_metrics_log():
    from cfd2_tpu.mesh import BackwardsStep, generate_cut_cell_mesh
    from cfd2_tpu.models.coupled import CoupledSolver

    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    mesh = generate_cut_cell_mesh(geo, 0.1, 0.1, 1.2, (3.5, 1.0))
    s = CoupledSolver(mesh)
    s.set_dt(0.002)
    s.set_n_outer_correctors(10)
    log = MetricsLog()
    log.append(s.run(3))
    assert len(log) == 3
    assert np.isfinite(log["linear_residual"]).all()


@pytest.mark.skipif(os.environ.get("RUN_FINE_MESH") != "1",
                    reason="~3M cells; set RUN_FINE_MESH=1 "
                           "(reference gpu_fine_mesh_obstacle.rs is #[ignore])")
def test_fine_mesh_obstacle_step():
    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.coupled import CoupledSolver

    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.001, 0.001, 1.2, (3.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_dt(0.0004)
    # Host-driven outer loop: one device execution per corrector keeps
    # 3M-shaped programs within the remote compiler's envelope.
    s.step(mode="host")
    assert np.isfinite(s.get_u()).all()
