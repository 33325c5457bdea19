"""Probe: lid-driven cavity at Re=100 vs Ghia et al. (1982) Table I.

Tunes resolution/dt/steps for tests/test_physics.py::test_lid_driven_cavity.
Run on CPU: JAX_PLATFORMS=cpu python tools/probe_cavity.py [h] [dt] [steps]
"""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from cfd2_tpu.mesh import RectangularChannel, generate_cut_cell_mesh, retag_lid_cavity
from cfd2_tpu.models.coupled import CoupledSolver

# Ghia, Ghia & Shin (1982), Re=100: u through the geometric center x=0.5.
GHIA_Y = np.array([0.0547, 0.1016, 0.1719, 0.2813, 0.4531, 0.5000,
                   0.6172, 0.7344, 0.8516, 0.9531, 0.9766])
GHIA_U = np.array([-0.03717, -0.06434, -0.10150, -0.15662, -0.21090,
                   -0.20581, -0.13641, 0.00332, 0.23151, 0.68717, 0.84123])

h = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0 / 48
dt = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 80

geo = RectangularChannel(length=1.0, height=1.0)
mesh = generate_cut_cell_mesh(geo, h, h, 1.2, (1.0, 1.0))
retag_lid_cavity(mesh, (1.0, 1.0))
print(f"cells={mesh.num_cells}")

s = CoupledSolver(mesh)
s.set_viscosity(0.01)   # Re = U*L/nu = 100
s.set_density(1.0)
s.set_inlet_velocity(1.0)
s.set_ramp_time(0.0)
s.set_dt(dt)

t0 = time.time()
for i in range(steps):
    s.step()
    if s.should_stop:
        print("should_stop at", i)
        break
    if (i + 1) % 20 == 0:
        u = s.get_u()
        print(f"step {i+1}  t={time.time()-t0:.1f}s  max|u|={np.abs(u).max():.4f}")

u = s.get_u()
# Average the two columns straddling x=0.5 per y-row (exact interpolation
# to the centerline on the uniform grid; advisor r3).
col = np.abs(mesh.cell_cx - 0.5) < 0.75 * h
yr = np.round(mesh.cell_cy[col] / h - 0.5).astype(int)
rows = np.unique(yr)
y = np.array([mesh.cell_cy[col][yr == j].mean() for j in rows])
ux = np.array([u[col, 0][yr == j].mean() for j in rows])
ui = np.interp(GHIA_Y, y, ux)
err = np.abs(ui - GHIA_U)
for yy, g, m in zip(GHIA_Y, GHIA_U, ui):
    print(f"y={yy:.4f}  ghia={g:+.5f}  ours={m:+.5f}  d={m-g:+.5f}")
print(f"max_err={err.max():.4f}  rms={np.sqrt((err**2).mean()):.4f}  "
      f"wall={time.time()-t0:.1f}s")
