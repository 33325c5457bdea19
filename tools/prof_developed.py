"""Where does the developed-state step spend its time?

At the developed vortex-shedding state the outer correctors converge in
~5-6 iterations with 0-2 FGMRES iterations each, so the naive cost model
(per-outer setup ~13 ms + a near-empty solve) predicts ~70-90 ms/step — but
the fused step measures ~230 ms at 1M cells.  This tool pins down the gap:

1. host-mode verbose outers on the developed state -> per-outer du/dp and
   linear iteration counts (control data; wall times here include ~60 ms of
   tunnel read latency per outer and are NOT meaningful);
2. value-read-synced phase timings (prepare / assemble / coarsen / solve)
   with the solve started from the developed state's own (u, p) guess at the
   strict reference tolerances — the real per-outer cost pieces;
3. fused-step wall time for the ground truth.

Usage: python tools/prof_developed.py [state.npz] [min_cell]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    state_file = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "bench_developed_1m.npz")
    min_cell = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0017

    import jax
    import jax.numpy as jnp
    from dataclasses import replace as _rep

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.assembly import assemble_stencil, prepare
    from cfd2_tpu.models.coupled import CoupledSolver, step_host
    from cfd2_tpu.ops import stencil_system as st
    from cfd2_tpu.ops.amg import (_GridOps, _dense_factor,
                                  compute_structured_level_values2,
                                  structured_v_cycle)
    from cfd2_tpu.ops.fgmres import fgmres_solve

    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, min_cell, min_cell, 1.2, (3.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_precond_type(1)
    s.config = _rep(s.config, fgmres_max_restarts=5)
    d = np.load(state_file)
    meta = json.loads(str(d["meta"]))
    assert tuple(meta["grid"]) == tuple(s.mesh.grid_shape), \
        (meta["grid"], s.mesh.grid_shape)
    ny, nx = s.mesh.grid_shape
    u = jnp.asarray(d["u"].astype(np.float32).reshape(ny * nx, 2))
    p = jnp.asarray(d["p"].astype(np.float32).reshape(ny * nx))
    u = u * s.mesh.c_valid[:, None]
    p = p * s.mesh.c_valid
    s.state = _rep(s.state, u=u, u_old=u, u_old_old=u, prev_u=u, p=p)
    s.set_viscosity(meta["viscosity"])
    s.set_dt(min(0.002, 0.4 * min_cell))
    print(f"# developed state {tuple(meta['grid'])} Re="
          f"{0.4 / meta['viscosity']:.0f}; healing 3 fused steps", flush=True)
    t0 = time.time()
    for _ in range(3):
        s.step()
    float(s.state.u[0, 0])
    print(f"# heal+compile {time.time() - t0:.0f}s", flush=True)

    # Ground truth: fused step wall.
    t0 = time.perf_counter()
    n_meas = 5
    for _ in range(n_meas):
        s.step()
        float(s.state.u[0, 0])
    ms_step = (time.perf_counter() - t0) / n_meas * 1e3
    print(f"fused step  {ms_step:8.1f} ms  "
          f"(outer={int(s.state.outer_iters)})", flush=True)

    # Control data: host-mode verbose outers (iteration counts only).
    print("# host-mode outers (wall times here are tunnel-latency-polluted):",
          flush=True)
    s.state = step_host(s.mesh, s.state, s.params, s.config,
                        amg=s._get_amg(), verbose=True)

    # Phase timings at this state.
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

    def solve(ss, lv2, fac, state):
        def ps(rhs2):
            x = ss.diag_p_inv2 * rhs2
            x = structured_v_cycle(hier, lv2, rhs2.reshape(-1), x.reshape(-1),
                                   coarse_factors=fac).reshape(ss.grid)
            return x
        ms_n = config.mom_sweeps(dm.num_cells)
        pc = lambda r: st.schur_precond_planar(
            ss, r, config.precond_omega,
            config.pressure_sweeps(dm.num_cells), pressure_solve=ps,
            mom_sweeps=ms_n)
        mv = lambda x: st.spmv_planar(ss, x)
        x0 = st.to_planar(ss, jnp.concatenate(
            [state.u, state.p[:, None]], axis=1))
        return fgmres_solve(mv, pc, st.to_planar(ss, ss.rhs), x0,
                            restart=config.fgmres_restart, max_restarts=5,
                            tol=config.fgmres_tol, abstol=config.fgmres_abstol)

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
    ms, res = t_read(lambda: f_solve(ss, lv2, fac, state_p), n=3,
                     read=lambda o: float(o.residual))
    it = int(res.iterations)
    print(f"solve     {ms:8.1f} ms  iters={it}  conv={bool(res.converged)}",
          flush=True)


if __name__ == "__main__":
    main()
