"""Simulation driver — the headless equivalent of the reference app loop.

The reference spawns a solver thread that steps, reads fields, applies an
adaptive CFL timestep (growth-limited), publishes state for rendering, and
stops on divergence/steady state (ui/app.rs:852-948).  Here the same loop
exists in two flavors:

* :meth:`Simulation.run` — host loop with per-step callbacks (snapshots,
  rendering, adaptive dt), matching the reference semantics step-for-step;
* :meth:`Simulation.run_scanned` — the TPU-native fast path: N steps fused
  under one ``lax.scan`` with on-device adaptive dt, zero host round-trips.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..mesh import (
    BackwardsStep,
    ChannelWithObstacle,
    RectangularChannel,
    generate_cut_cell_mesh,
    generate_delaunay_mesh,
    generate_voronoi_mesh,
)
from ..models.coupled import CoupledSolver, multi_step_adaptive
from ..runtime.profiling import ProfileCategory, ProfilingStats
from .fluids import Fluid


@dataclass
class AdaptiveDtController:
    """CFL-targeted adaptive timestep (reference ui/app.rs:878-909):
    dt = clamp(cfl * min_cell / max_vel, 1e-5, 0.1), growth <= 1.2x."""
    target_cfl: float = 0.5
    min_cell_size: float = 0.05
    dt_min: float = 1e-5
    dt_max: float = 0.1
    growth: float = 1.2

    def next_dt(self, dt: float, max_vel: float) -> float:
        if max_vel <= 1e-6:
            return dt
        ideal = self.target_cfl * self.min_cell_size / max_vel
        return float(np.clip(min(ideal, dt * self.growth),
                             self.dt_min, self.dt_max))


_GEOMETRIES = {
    "channel": lambda: (ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2),
                        (3.0, 1.0)),
    "backstep": lambda: (BackwardsStep(3.5, 0.5, 1.0, 0.5), (3.5, 1.0)),
    "rect": lambda: (RectangularChannel(3.0, 1.0), (3.0, 1.0)),
}

_GENERATORS = {
    "cutcell": generate_cut_cell_mesh,
    "delaunay": generate_delaunay_mesh,
    "voronoi": generate_voronoi_mesh,
}


@dataclass
class Simulation:
    """End-to-end case setup + run loop (the reference's init_solver + solver
    thread, ui/app.rs:301-393,852-948)."""
    geometry: str = "channel"
    mesh_type: str = "cutcell"
    cell_size: float = 0.02
    # > cell_size enables local quadtree refinement (cutcell only): fine
    # cells near boundaries growing to max_cell_size in the bulk.
    max_cell_size: float = 0.0
    fluid: Fluid = field(default_factory=lambda: Fluid.by_name("Custom"))
    inlet_velocity: float = 1.0
    ramp_time: float = 0.1
    scheme: int = 0
    time_scheme: int = 0
    precond: int = 0
    alpha_u: float = 0.7
    alpha_p: float = 1.0
    dt0: float = 1e-3
    adaptive: bool = True
    target_cfl: float = 0.5

    def __post_init__(self):
        self._build()

    def rebuild(self, geometry: str | None = None,
                mesh_type: str | None = None,
                cell_size: float | None = None,
                max_cell_size: float | None = None):
        """Rebuild the mesh and solver from (possibly new) panel-selected
        geometry / mesh type / cell sizes — the reference's Init/Reset
        contract (ui/app.rs:301-393 re-runs build_mesh at :395-482 from the
        panel state).  Fluid, schemes, inlet, and relaxation settings carry
        over; fields restart from the inlet-column impulse."""
        if geometry is not None:
            self.geometry = geometry
        if mesh_type is not None:
            self.mesh_type = mesh_type
        if cell_size is not None:
            self.cell_size = cell_size
        if max_cell_size is not None:
            self.max_cell_size = max_cell_size
        if hasattr(self, "_force_mask"):      # stale face mask of the old mesh
            del self._force_mask
        self._build()

    def _build(self):
        geo, domain = _GEOMETRIES[self.geometry]()
        self.geo = geo
        self.domain = domain
        gen = _GENERATORS[self.mesh_type]
        max_cell = max(self.max_cell_size, self.cell_size)
        self.mesh = gen(geo, self.cell_size, max_cell, 1.2, domain)
        if self.mesh_type != "voronoi":
            self.mesh.smooth(geo, 0.3, 50)

        self.solver = CoupledSolver(self.mesh)
        s = self.solver
        s.set_dt(self.dt0)
        s.set_density(self.fluid.density)
        s.set_viscosity(self.fluid.viscosity)
        s.set_alpha_u(self.alpha_u)
        s.set_alpha_p(self.alpha_p)
        s.set_inlet_velocity(self.inlet_velocity)
        s.set_ramp_time(self.ramp_time)
        s.set_scheme(self.scheme)
        s.set_time_scheme(self.time_scheme)
        s.set_precond_type(self.precond)
        # Initial condition: inlet-column impulse like the reference tests.
        u0 = np.zeros((self.mesh.num_cells, 2))
        u0[self.mesh.cell_cx < self.cell_size * 2, 0] = self.inlet_velocity
        s.set_u(u0)

        self.controller = AdaptiveDtController(
            target_cfl=self.target_cfl, min_cell_size=self.cell_size)
        self.profiling = ProfilingStats()

    @property
    def reynolds(self) -> float:
        return self.fluid.reynolds(self.inlet_velocity, self.domain[1])

    def force_coefficients(self):
        """(Cd, Cl) on the immersed obstacle, or ``None`` when the geometry
        has no immersed body (backstep/rect: the obstacle face mask is
        empty).  A capability beyond the reference app (which only renders
        fields); see cfd2_tpu/utils/forces.py."""
        from ..utils.forces import force_coefficients, obstacle_face_mask

        if not hasattr(self, "_force_mask"):
            self._force_mask = obstacle_face_mask(self.solver.mesh)
            self._d_ref = 2.0 * getattr(self.geo, "obstacle_radius", 0.0)
        if self._force_mask.sum() == 0 or self._d_ref <= 0:
            return None
        cd, cl = force_coefficients(self.solver.mesh, self.solver.state,
                                    self.solver.params, self._force_mask,
                                    u_ref=max(abs(self.inlet_velocity), 1e-9),
                                    d_ref=self._d_ref)
        return float(cd), float(cl)

    def run(self, num_steps: int, snapshot_every: int = 0,
            on_snapshot=None, verbose: bool = False,
            show_forces: bool = False):
        """Host loop with adaptive dt and optional snapshot callback."""
        from ..runtime.async_reader import AsyncFieldReader

        s = self.solver
        # Adaptive-dt readback: a device-side max-|u| reduction read through
        # the double-buffered async reader — the value used may be one step
        # stale, exactly the reference's async convergence-read semantics
        # (async_buffer.rs:11-248; the UI thread's adaptive dt reads
        # published state too, app.rs:878-909).  4 B/step instead of a
        # blocking full-field get_u.
        mv_reader = AsyncFieldReader(depth=2)
        with self.profiling.session():
            for i in range(num_steps):
                if self.adaptive:
                    with self.profiling.scope("max_vel(adaptive_dt,async)",
                                              ProfileCategory.DEVICE_READ, 4):
                        mv_reader.start_read(s.max_velocity_device())
                        mv_reader.poll()
                        mv = mv_reader.get_last_value()
                        if mv is None:
                            mv = mv_reader.flush()
                        max_vel = float(mv)
                    s.set_dt(self.controller.next_dt(float(s.params.dt),
                                                     max_vel))
                with self.profiling.scope("step",
                                          ProfileCategory.DEVICE_DISPATCH):
                    s.step()
                self.profiling.increment_iteration()
                if verbose and i % 10 == 0:
                    forces = self.force_coefficients() if show_forces else None
                    extra = (f" Cd={forces[0]:.3f} Cl={forces[1]:+.3f}"
                             if forces else "")
                    print(f"step {i}: t={float(s.state.time):.4f} "
                          f"dt={float(s.params.dt):.2e} "
                          f"outer={int(s.state.outer_iters)}{extra}")
                if snapshot_every and on_snapshot and i % snapshot_every == 0:
                    on_snapshot(i, s)
                if s.should_stop:
                    if verbose:
                        print(f"solver stopped at step {i} "
                              f"(degenerate={s.degenerate_count}, "
                              f"steady={s.steady_state_count})")
                    break
        return s

    def run_scanned(self, num_steps: int):
        """TPU-native run: everything under lax.scan, on-device adaptive dt."""
        s = self.solver
        state, params, metrics = multi_step_adaptive(
            s.mesh, s.state, s.params, s.config, num_steps,
            target_cfl=self.target_cfl, min_cell_size=self.cell_size)
        s.state = state
        s.params = params
        import jax
        return jax.tree.map(np.asarray, metrics)
