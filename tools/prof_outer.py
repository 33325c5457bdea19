"""Per-phase outer-corrector timings with value-read syncs.

``jax.block_until_ready`` is not a reliable fence through this
environment's device tunnel (micro-probes returned physically impossible
timings; see tools/prof_layout.py history) — every phase here is timed by
fetching a scalar from its output, which forces a genuine device->host
sync.  Phases: prepare, stencil assembly, AMG re-coarsening + coarse
factorization, and the preconditioned FGMRES solve (per-iteration cost is
solve time / iteration count).

Usage: python tools/prof_outer.py [min_cell] [n_warm]
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
    s.set_precond_type(1)
    from dataclasses import replace as _rep
    # match bench/bf16_smoke config so the fused-step compile cache hits
    s.config = _rep(s.config, fgmres_max_restarts=5)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < min_cell * 2, 0] = 1.0
    s.set_u(u0)
    print(f"# mesh {s.mesh.num_cells}; warming {n_warm} fused steps",
          flush=True)
    for _ in range(n_warm):
        s.step()
        float(s.state.u[0, 0])
    print(f"# warm done ({time.time()-t0:.0f}s)", flush=True)

    dm, config, params, hier = s.mesh, s.config, s.params, s._get_amg()

    f_prep = jax.jit(prepare, static_argnames=("config",))
    f_asm = jax.jit(assemble_stencil, static_argnames=("config",))

    def coarsen(ss):
        lv2 = compute_structured_level_values2(hier, ss.P_diag2, ss.P_off2)
        dc, oc = lv2[-1]
        fac = _dense_factor(
            dc.reshape(-1), jnp.moveaxis(oc.reshape(4, -1), 0, 1),
            _GridOps(hier.levels[-1].grid).neighbor_cols())
        return lv2, fac

    f_coarsen = jax.jit(coarsen)

    n_vc = int(os.environ.get("PROF_VCYCLES", "1"))
    mode16 = os.environ.get("PROF_BF16", "")   # "", "basis", "pc", "both"

    def solve(ss, lv2, fac, state, tol):
        def ps(rhs2):
            x = ss.diag_p_inv2 * rhs2
            for _ in range(n_vc):
                x = structured_v_cycle(hier, lv2, rhs2.reshape(-1),
                                       x.reshape(-1),
                                       coarse_factors=fac).reshape(ss.grid)
            return x
        ms_n = int(os.environ.get("PROF_MOM", "0")) or             config.mom_sweeps(dm.num_cells)
        if mode16 in ("pc", "both"):
            ss_pc = st.cast_coeffs(ss, jnp.bfloat16)
            ps_pc = lambda rhs: ps(rhs.astype(jnp.float32)).astype(jnp.bfloat16)
            pc = lambda r: st.schur_precond_planar(
                ss_pc, r.astype(jnp.bfloat16), config.precond_omega,
                config.pressure_sweeps(dm.num_cells), pressure_solve=ps_pc,
                mom_sweeps=ms_n).astype(jnp.float32)
        else:
            pc = lambda r: st.schur_precond_planar(
                ss, r, config.precond_omega,
                config.pressure_sweeps(dm.num_cells), pressure_solve=ps,
                mom_sweeps=ms_n)
        bdt = jnp.bfloat16 if mode16 in ("basis", "both") else None
        mv = lambda x: st.spmv_planar(ss, x)
        x0 = st.to_planar(ss, jnp.concatenate(
            [state.u, state.p[:, None]], axis=1))
        return fgmres_solve(mv, pc, st.to_planar(ss, ss.rhs), x0,
                            restart=config.fgmres_restart, max_restarts=5,
                            tol=tol, abstol=config.fgmres_abstol,
                            basis_dtype=bdt)

    f_solve = jax.jit(solve)

    def t_read(fn, read, n=5, warmup=1):
        for _ in range(warmup):
            out = fn()
        read(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
            read(out)
        return (time.perf_counter() - t0) / n * 1e3, out

    state = s.state
    ms, state_p = t_read(lambda: f_prep(dm, state, params, config),
                         lambda o: float(o.d_p[0]))
    print(f"prepare   {ms:8.2f} ms", flush=True)
    ms, ss = t_read(lambda: f_asm(dm, state_p, params, config),
                    lambda o: float(o.rhs[0, 0]))
    print(f"assemble  {ms:8.2f} ms", flush=True)
    ms, (lv2, fac) = t_read(lambda: f_coarsen(ss),
                            lambda o: float(o[1][0][0, 0] if isinstance(
                                o[1], tuple) else o[1][0][0]))
    print(f"coarsen   {ms:8.2f} ms", flush=True)
    print(f"# mom_sweeps={int(os.environ.get('PROF_MOM', '0')) or config.mom_sweeps(dm.num_cells)} "
          f"bf16={mode16 or 'off'} vcycles={n_vc}", flush=True)
    for tol in (1e-3, 1e-5):
        ms, res = t_read(lambda: f_solve(ss, lv2, fac, state_p, tol),
                         lambda o: float(o.residual), n=3)
        it = int(res.iterations)
        print(f"solve({tol:g})  {ms:8.1f} ms  iters={it}  "
              f"{ms/max(it,1):6.2f} ms/iter  conv={bool(res.converged)}",
              flush=True)


if __name__ == "__main__":
    main()
