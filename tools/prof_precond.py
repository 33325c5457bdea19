"""Preconditioner-quality probe on a developed flow state.

Runs a few timesteps to reach a 'hard' state (late steps front-load 100+
FGMRES iterations in their first outer correctors), then solves that outer
system with preconditioner variants and reports iterations + wall time:

  * v1        — production: Schur + 1 structured V(1,1)-cycle
  * v2        — 2 V-cycles per application
  * v1s2      — V-cycle with 2 pre/post RB-GS sweeps
  * cheb      — Chebyshev/Jacobi sweeps (reference default path)

Usage: python tools/prof_precond.py [min_cell] [n_warm_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    min_cell = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0017
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.assembly import assemble_stencil, prepare
    from cfd2_tpu.models.coupled import CoupledSolver, step_host
    from cfd2_tpu.ops import stencil_system as st
    from cfd2_tpu.ops.amg import (_GridOps, _dense_factor,
                                  build_hierarchy_for_mesh,
                                  compute_structured_level_values2,
                                  structured_v_cycle)
    from cfd2_tpu.ops.fgmres import fgmres_solve

    t0 = time.time()
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, min_cell, min_cell, 1.2, (3.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_dt(min(0.002, 0.4 * min_cell))
    s.set_viscosity(0.01)
    s.set_density(1.0)
    s.set_precond_type(1)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < min_cell * 2, 0] = 1.0
    s.set_u(u0)
    print(f"# mesh {mesh.num_cells} -> {s.mesh.num_cells} in "
          f"{time.time()-t0:.0f}s; warming {n_warm} steps", flush=True)
    for i in range(n_warm):
        s.state = step_host(s.mesh, s.state, s.params, s.config, s._get_amg())
    jax.block_until_ready(s.state.u)
    print(f"# warm done ({time.time()-t0:.0f}s)", flush=True)

    dm = s.mesh
    config = s.config
    params = s.params
    hier = s._get_amg()
    n_sweeps = config.pressure_sweeps(dm.num_cells)

    state = jax.jit(prepare, static_argnames=("config",))(
        dm, s.state, params, config)
    ss = jax.jit(assemble_stencil, static_argnames=("config",))(
        dm, state, params, config)
    jax.block_until_ready(ss.rhs)

    lv2 = compute_structured_level_values2(hier, ss.P_diag2, ss.P_off2)
    dc, oc = lv2[-1]
    factors = _dense_factor(
        dc.reshape(-1), jnp.moveaxis(oc.reshape(4, -1), 0, 1),
        _GridOps(hier.levels[-1].grid).neighbor_cols())

    def make_ps(n_cycles=1, sweeps=1, h=None, lv=None, fac=None):
        h = hier if h is None else h
        lv = lv2 if lv is None else lv
        fac = factors if fac is None else fac

        def ps(rhs2):
            x = ss.diag_p_inv2 * rhs2
            for _ in range(n_cycles):
                x = structured_v_cycle(h, lv, rhs2.reshape(-1),
                                       x.reshape(-1), coarse_factors=fac,
                                       sweeps=sweeps).reshape(ss.grid)
            return x
        return ps

    def make_trunc(min_coarse):
        from cfd2_tpu.ops.amg import build_structured_hierarchy
        h = build_structured_hierarchy(dm, min_coarse=min_coarse)
        lv = compute_structured_level_values2(h, ss.P_diag2, ss.P_off2)
        dc, oc = lv[-1]
        fac = _dense_factor(
            dc.reshape(-1), jnp.moveaxis(oc.reshape(4, -1), 0, 1),
            _GridOps(h.levels[-1].grid).neighbor_cols())
        print(f"# trunc{min_coarse}: {len(h.levels)} levels, coarsest "
              f"{h.levels[-1].grid}", flush=True)
        return make_ps(1, 1, h=h, lv=lv, fac=fac)

    x0 = st.to_planar(ss, jnp.concatenate(
        [state.u, state.p[:, None]], axis=1))
    rhsp = st.to_planar(ss, ss.rhs)
    mv = lambda x: st.spmv_planar(ss, x)

    # Production default is the first entry; the rest bracket it.  Past
    # results at 1M (DESIGN.md §9b): m2 48 iters, m3 32, m4 23, m8 11,
    # m12 7; RB-GS momentum and hierarchy truncation measured worse.
    variants = [
        ("v1m8", make_ps(1, 1), 8, False),
        ("v1m4", make_ps(1, 1), 4, False),
        ("v1m12", make_ps(1, 1), 12, False),
        ("v2m8", make_ps(2, 1), 8, False),
        ("cheb", None, 1, False),
    ]
    for tag, ps, ms, rb in variants:
        pc = (lambda ps, ms, rb: lambda r: st.schur_precond_planar(
            ss, r, config.precond_omega, n_sweeps, pressure_solve=ps,
            mom_sweeps=ms, mom_rbgs=rb))(ps, ms, rb)

        def solve():
            return fgmres_solve(mv, pc, rhsp, x0, restart=50,
                                max_restarts=8, tol=1e-3, abstol=1e-7)

        f = jax.jit(solve)
        t0 = time.time()
        r = f()
        jax.block_until_ready(r.x)
        tc = time.time() - t0
        t0 = time.time()
        r = f()
        jax.block_until_ready(r.x)
        dt = time.time() - t0
        print(f"{tag:6s} iters={int(r.iterations):4d} "
              f"resid={float(r.residual):.2e} conv={bool(r.converged)} "
              f"{dt*1e3:8.1f} ms ({dt/max(int(r.iterations),1)*1e3:.2f} "
              f"ms/iter, compile+1 {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
