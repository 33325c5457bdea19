"""Aggregation-AMG cycle variants on an unstructured mesh: contraction
factor of the pressure V-cycle (residual ratio per cycle on the assembled
pressure operator) + coupled FGMRES iteration counts for the best ones.

Variants: baseline damped-Jacobi V(1,1); prolongation over-correction;
2-sweep Jacobi; Chebyshev(2/3) smoothing.

Usage: python tools/prof_amg_variants.py [min_cell] [delaunay|voronoi]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

VARIANTS = [
    ("base j1", {}),
    ("oc1.5", {"overcorrect": 1.5}),
    ("oc1.8", {"overcorrect": 1.8}),
    ("j2", {"smooth_arg": 2}),
    ("j2+oc1.5", {"smooth_arg": 2, "overcorrect": 1.5}),
    ("cheb2", {"smoother": "cheb", "smooth_arg": 2}),
    ("cheb2+oc1.5", {"smoother": "cheb", "smooth_arg": 2,
                     "overcorrect": 1.5}),
    ("cheb3+oc1.5", {"smoother": "cheb", "smooth_arg": 3,
                     "overcorrect": 1.5}),
]


def main():
    size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    mesh_type = sys.argv[2] if len(sys.argv) > 2 else "delaunay"

    from cfd2_tpu.mesh import (ChannelWithObstacle, generate_delaunay_mesh,
                               generate_voronoi_mesh)
    from cfd2_tpu.models.assembly import assemble_ell, prepare
    from cfd2_tpu.models.coupled import CoupledSolver
    from cfd2_tpu.ops import ellsys as el
    from cfd2_tpu.ops.amg import make_pressure_solve
    from cfd2_tpu.ops.fgmres import fgmres_solve

    gen = {"delaunay": generate_delaunay_mesh,
           "voronoi": generate_voronoi_mesh}[mesh_type]
    geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
    mesh = gen(geo, size, size, 1.2, (3.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_dt(min(0.002, 0.4 * size))
    s.set_viscosity(0.01)
    s.set_precond_type(1)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < 2 * size, 0] = 1.0
    s.set_u(u0)
    dm = s.mesh
    print(f"# {mesh_type} {size}: {mesh.num_cells} cells", flush=True)
    hier = s._get_amg()
    config, params = s.config, s.params
    state = jax.jit(lambda st: prepare(dm, st, params, config))(s.state)
    es = jax.jit(lambda st: assemble_ell(dm, st, params, config))(state)

    # Coupled solve iterations per variant (the metric that matters: the
    # stationary cycle diverges on the near-null constant mode regardless,
    # but FGMRES only cares about eigenvalue clustering).
    n_sweeps = config.pressure_sweeps(dm.num_cells)
    x0 = jnp.concatenate([state.u, state.p[:, None]], axis=1).T
    for name, opts in VARIANTS:
        ps = make_pressure_solve(hier, dm, es, cycle_opts=opts)

        @jax.jit
        def solve(rhs, x0v):
            mv = lambda xx: el.spmv(es, dm, xx)
            pc = lambda rr: el.schur_precond(es, dm, rr,
                                             config.precond_omega, n_sweeps,
                                             pressure_solve=ps, mom_sweeps=8)
            return fgmres_solve(mv, pc, rhs, x0v,
                                restart=config.fgmres_restart,
                                max_restarts=5, tol=1e-5, abstol=1e-7)
        res = solve(es.rhs.T, x0)
        int(res.iterations)
        t0 = time.time()
        res = solve(es.rhs.T, x0)
        it = int(res.iterations)
        el_s = time.time() - t0 - 0.030
        print(f"solve[{name:14s}] {el_s*1e3:.0f} ms iters={it} "
              f"conv={bool(res.converged)}", flush=True)


if __name__ == "__main__":
    main()
