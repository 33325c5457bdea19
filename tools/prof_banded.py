"""Banded (unstructured) path profile at a given mesh size: gather cost,
precond apply, spmv, and solve iterations for momentum-sweep / V-cycle
variants.  Value-read synced."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.005
    mesh_type = sys.argv[2] if len(sys.argv) > 2 else "delaunay"

    from cfd2_tpu.mesh import (ChannelWithObstacle, generate_delaunay_mesh,
                               generate_voronoi_mesh)
    from cfd2_tpu.models.assembly import assemble_coupled, prepare
    from cfd2_tpu.models.coupled import CoupledSolver
    from cfd2_tpu.ops.amg import compute_level_values, make_pressure_solve
    from cfd2_tpu.ops.blockell import block_spmv
    from cfd2_tpu.ops.fgmres import fgmres_solve
    from cfd2_tpu.ops.schur import schur_preconditioner

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
    print(f"# {mesh_type} {size}: {mesh.num_cells} cells K={dm.max_faces} "
          f"W={dm.bd_W}", flush=True)

    # one step to get a realistic state
    t0 = time.time()
    s.step(mode="host")
    float(s.state.u[0, 0])
    print(f"# warm step {time.time()-t0:.0f}s", flush=True)

    config, params = s.config, s.params
    state = prepare(dm, s.state, params, config)
    sysb = jax.jit(assemble_coupled, static_argnames=("config",))(
        dm, state, params, config)
    hier = s._get_amg()

    x = state.u[:, 0]

    @jax.jit
    def g20(xv):
        def body(k, acc):
            return dm.gather(acc * (1 + 1e-30))[:, 0]
        return lax.fori_loop(0, 20, body, xv)

    v = g20(x); v = float(v[0])
    t0 = time.time(); v = float(g20(x)[0])
    print(f"gather (N,K): {(time.time()-t0-0.030)/20*1e3:.3f} ms", flush=True)

    n_sweeps = config.pressure_sweeps(dm.num_cells)
    lv = compute_level_values(hier, sysb.P_diag, sysb.P_off)
    ps = make_pressure_solve(hier, dm, sysb)

    r3 = jnp.stack([x, x * 0.5, x * 0.25], axis=1)

    for ms in (1, 4, 8):
        @jax.jit
        def pc20(r, ms=ms):
            def body(k, acc):
                return schur_preconditioner(
                    sysb, dm, acc * (1 + 1e-30), config.precond_omega,
                    n_sweeps, pressure_solve=ps, mom_sweeps=ms)
            return lax.fori_loop(0, 10, body, r)
        v = pc20(r3); v = float(v[0, 0])
        t0 = time.time(); v = float(pc20(r3)[0, 0])
        print(f"precond m{ms}: {(time.time()-t0-0.030)/10*1e3:.2f} ms",
              flush=True)

    @jax.jit
    def mv20(r):
        def body(k, acc):
            return block_spmv(sysb, dm, acc * (1 + 1e-30))
        return lax.fori_loop(0, 20, body, r)
    v = mv20(r3); v = float(v[0, 0])
    t0 = time.time(); v = float(mv20(r3)[0, 0])
    print(f"spmv: {(time.time()-t0-0.030)/20*1e3:.3f} ms", flush=True)

    for ms in (1, 8):
        @jax.jit
        def solve(rhs, x0, ms=ms):
            mv = lambda xx: block_spmv(sysb, dm, xx)
            pc = lambda rr: schur_preconditioner(
                sysb, dm, rr, config.precond_omega, n_sweeps,
                pressure_solve=ps, mom_sweeps=ms)
            return fgmres_solve(mv, pc, rhs, x0, restart=50, max_restarts=3,
                                tol=1e-5, abstol=1e-7)
        x0 = jnp.concatenate([state.u, state.p[:, None]], axis=1)
        res = solve(sysb.rhs, x0)
        it = int(res.iterations)
        t0 = time.time()
        res = solve(sysb.rhs, x0)
        it = int(res.iterations)
        el = time.time() - t0 - 0.030
        print(f"solve m{ms}: {el*1e3:.0f} ms iters={it} "
              f"{el/max(it,1)*1e3:.2f} ms/iter conv={bool(res.converged)}",
              flush=True)


if __name__ == "__main__":
    main()
