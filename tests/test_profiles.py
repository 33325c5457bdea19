"""Profiling-driver tests, ported from the reference's perf/profiling tests
(tests/gpu_profile.rs, tests/gpu_transfer_profile.rs, tests/mesh_profile_test.rs):
run the solver under the profiler and validate the report; check fine-mesh
quality bounds."""


from cfd2_tpu.app.driver import Simulation
from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh


def test_profiled_solver_run():
    """gpu_profile.rs analogue: steps under the profiler produce a report
    with sessions, categories, and per-location stats."""
    sim = Simulation(geometry="backstep", cell_size=0.05, dt0=1e-3,
                     adaptive=True)
    sim.profiling.enable()
    sim.run(5)
    rep = sim.profiling.report()
    assert "DeviceDispatch" in rep
    assert "step" in rep
    assert sim.profiling.iterations == 5
    totals = sim.profiling.category_totals()
    assert totals.get("DeviceDispatch", 0.0) > 0.0


def test_transfer_profile_breakdown():
    """gpu_transfer_profile.rs analogue: the adaptive-dt host loop records
    device-read transfers with sizes; the scanned loop records none."""
    sim = Simulation(geometry="backstep", cell_size=0.05, dt0=1e-3,
                     adaptive=True)
    sim.profiling.enable()
    sim.run(3)
    reads = [v for k, v in sim.profiling.locations.items()
             if k.startswith("DeviceRead")]
    assert reads and reads[0].total_bytes > 0

    sim2 = Simulation(geometry="backstep", cell_size=0.05, dt0=1e-3)
    sim2.profiling.enable()
    with sim2.profiling.session():
        sim2.run_scanned(3)
    reads2 = [v for k, v in sim2.profiling.locations.items()
              if k.startswith("DeviceRead")]
    assert not reads2  # zero host round-trips inside the scan


def test_fine_mesh_quality():
    """mesh_profile_test.rs analogue (scaled down): finer channel-obstacle
    mesh has positive volumes and skew < 1.0 after smoothing."""
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.0125, 0.0125, 1.2, (3.0, 1.0))
    mesh.smooth(geo, 0.3, 30)
    assert (mesh.cell_vol > 0).all()
    assert mesh.calculate_max_skewness() < 1.0
    assert mesh.num_cells > 15000
