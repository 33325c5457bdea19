"""Per-outer linear-iteration ladder on real 1M steps (host mode, verbose):
how many FGMRES iterations does each outer corrector actually burn at the
reference's strict tolerance?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
from dataclasses import replace
from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
from cfd2_tpu.models.coupled import CoupledSolver, step_host

cell = float(os.environ.get("IT_CELL", "0.0017"))
geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
mesh = generate_cut_cell_mesh(geo, cell, cell, 1.2, (3.0, 1.0))
s = CoupledSolver(mesh)
s.set_dt(min(0.002, 0.4 * cell)); s.set_viscosity(0.01); s.set_precond_type(1)
s.config = replace(s.config, fgmres_max_restarts=5,
                   extrapolate_guess=os.environ.get("IT_EXTRAP") == "1",
                   fgmres_incycle_window=int(os.environ.get("IT_INCYCLE", "0")))
u0 = np.zeros((mesh.num_cells, 2)); u0[mesh.cell_cx < 2*cell, 0] = 1.0
s.set_u(u0)
for i in range(int(os.environ.get("IT_STEPS", "3"))):
    t0 = time.time()
    s.state = step_host(s.mesh, s.state, s.params, s.config, s._get_amg(),
                        verbose=True)
    print(f"# step {i}: {time.time()-t0:.2f}s", flush=True)
