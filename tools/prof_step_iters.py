"""Per-outer linear-iteration ladder of real (host-mode) steps on an
unstructured mesh — the in-step numbers the e2e throughput actually follows
(the standalone impulse solve saturates its restart cap for every
preconditioner variant and discriminates nothing).

Usage: python tools/prof_step_iters.py [min_cell] [delaunay|voronoi] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.005
    mesh_type = sys.argv[2] if len(sys.argv) > 2 else "delaunay"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    # cutcell supports refined meshes: pass max_cell as argv[4] (or via
    # CFD2_MAXCELL); equal min/max gives the uniform structured mirror.
    max_cell = float(sys.argv[4]) if len(sys.argv) > 4 else float(
        os.environ.get("CFD2_MAXCELL", "0"))

    from cfd2_tpu.mesh import (ChannelWithObstacle, generate_cut_cell_mesh,
                               generate_delaunay_mesh, generate_voronoi_mesh)
    from cfd2_tpu.models.coupled import CoupledSolver

    gen = {"delaunay": generate_delaunay_mesh,
           "voronoi": generate_voronoi_mesh,
           "cutcell": generate_cut_cell_mesh}[mesh_type]
    geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
    mesh = gen(geo, size, max(max_cell, size), 1.2, (3.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_dt(min(0.002, 0.4 * size))
    s.set_viscosity(0.01)
    s.set_precond_type(1)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < 2 * size, 0] = 1.0
    s.set_u(u0)
    from dataclasses import replace as _rep
    cheb = int(os.environ.get("CFD2_CHEB", "0"))
    oc = float(os.environ.get("CFD2_OC", "1.0"))
    ms = int(os.environ.get("CFD2_MS", "0"))
    rst = int(os.environ.get("CFD2_RESTART", "0"))
    aggp = int(os.environ.get("CFD2_AGGP", "0"))
    vcyc = int(os.environ.get("CFD2_VCYCLES", "0"))
    s.config = _rep(s.config, precond_cheb=cheb, precond_overcorrect=oc,
                    precond_mom_sweeps=ms,
                    fgmres_restart=rst or s.config.fgmres_restart,
                    amg_agg_passes=aggp, precond_vcycles=vcyc)
    print(f"# {mesh_type} {size}: {mesh.num_cells} cells cheb={cheb} "
          f"oc={oc} ms={ms} restart={rst} aggp={aggp} "
          f"levels={[lv.n for lv in s._get_amg().levels]}", flush=True)
    from cfd2_tpu.models.coupled import step_host
    for i in range(steps):
        t0 = time.time()
        s.state = step_host(s.mesh, s.state, s.params, s.config,
                            s._get_amg(), verbose=True)
        print(f"step {i}: {time.time()-t0:.2f}s "
              f"outers={int(s.state.outer_iters)}", flush=True)


if __name__ == "__main__":
    main()
