import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
from dataclasses import replace
from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
from cfd2_tpu.models.coupled import CoupledSolver

size = float(os.environ.get("SMOKE_CELL", "0.005"))
geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
mesh = generate_cut_cell_mesh(geo, size, size, 1.2, (3.0, 1.0))
print("cells", mesh.num_cells, flush=True)

variants = [
    ("f32", dict(fgmres_basis_bf16=False, precond_bf16=False)),
    ("basis16", dict(fgmres_basis_bf16=True, precond_bf16=False)),
    ("pc16", dict(fgmres_basis_bf16=False, precond_bf16=True)),
    ("both16", dict(fgmres_basis_bf16=True, precond_bf16=True)),
]
sel = os.environ.get("SMOKE_VARIANTS")
if sel:
    variants = [v for v in variants if v[0] in sel.split(",")]

for tag, kw in variants:
    s = CoupledSolver(mesh)
    s.set_dt(min(0.002, 0.4*size)); s.set_viscosity(0.01); s.set_density(1.0); s.set_precond_type(1)
    s.config = replace(s.config, fgmres_max_restarts=5, **kw)
    u0 = np.zeros((mesh.num_cells, 2)); u0[mesh.cell_cx < 2*size, 0] = 1.0
    s.set_u(u0)
    t0 = time.time(); s.step(); _ = float(s.state.u[0,0])
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
    s.step(); _ = float(s.state.u[0,0])
    iters = []
    t0 = time.time()
    for _ in range(5):
        s.step(); _ = float(s.state.u[0,0])
        iters.append(int(s.state.outer_iters))
    el = time.time()-t0
    assert np.isfinite(s.get_u()).all()
    print(f"{tag}: 5 steps {el:.3f}s -> {mesh.num_cells*5/el:.0f} c-u/s, outers={iters}", flush=True)
