"""Per-phase breakdown of a *developed-state* step on the banded path.

The developed refined-cutcell bench (bench_unstructured_developed.py) shows
4 outers x 0 linear iterations yet ~32 ms/outer — ~3.5x the structured
per-outer cost at the same size.  This tool pins down where a zero-linear-
iteration outer spends its time: prepare, assemble_ell, Galerkin level
values + coarse factor, one V-cycle, one preconditioner apply, one SpMV,
and the full FGMRES call from the developed state's own guess (the real
per-outer solve cost when it exits at iteration 0).  Value-read synced.

Usage: python tools/prof_refined_developed.py [type] [size] [max_cell] e.g.
       python tools/prof_refined_developed.py cutcell 0.0015 0.006
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

SYNC = 0.030  # tunnel scalar-read latency (DESIGN 9b)


def timed(label, fn, *args, reps=10):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    v = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(v).reshape(-1)[0])          # compile + sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    v = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(v).reshape(-1)[0])
    el = (time.time() - t0 - SYNC) / reps
    print(f"{label}: {el*1e3:.2f} ms", flush=True)
    return out


def main():
    mesh_type = sys.argv[1] if len(sys.argv) > 1 else "cutcell"
    size = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0015
    max_cell = float(sys.argv[3]) if len(sys.argv) > 3 else 0.006

    from make_developed_unstructured import developed_path
    from mesh_cache import get_mesh

    import jax
    import jax.numpy as jnp
    from jax import lax
    from dataclasses import replace

    from cfd2_tpu.models.assembly import assemble_ell, prepare
    from cfd2_tpu.models.coupled import CoupledSolver
    from cfd2_tpu.ops import ellsys as el
    from cfd2_tpu.ops.amg import (compute_level_values, make_pressure_solve,
                                  _dense_factor)
    from cfd2_tpu.ops.fgmres import fgmres_solve

    ckpt = developed_path(mesh_type, size, max_cell)
    d = np.load(ckpt)
    meta = json.loads(str(d["meta"]))
    mesh = get_mesh(mesh_type, size, max_cell=max_cell)

    s = CoupledSolver(mesh)
    s.set_viscosity(meta["viscosity"])
    s.set_density(meta["density"])
    s.set_precond_type(1)
    s.config = replace(s.config, fgmres_max_restarts=5, stop_count=10**9)
    s.set_dt(meta["dt"])
    s.set_u(d["u"].astype(np.float32))
    s.set_p(d["p"].astype(np.float32))
    s.initialize_history()
    dm = s.mesh
    print(f"# developed {mesh_type} {size}/{max_cell}: {mesh.num_cells} cells"
          f" K={dm.max_faces} W={dm.bd_W}", flush=True)
    hier = s._get_amg()
    print(f"# AMG levels: {[lv.n for lv in hier.levels]}", flush=True)

    t0 = time.time()
    for _ in range(3):   # heal f16 rounding + compile the fused step
        s.step(mode="fused")
    int(s.state.outer_iters)
    print(f"# compile+heal: {time.time()-t0:.1f}s", flush=True)

    # Ground truth: fused step wall.
    t0 = time.time()
    outs = []
    for _ in range(5):
        s.step(mode="fused")
        outs.append(int(s.state.outer_iters))
    ms_step = (time.time() - t0) / 5 * 1e3
    print(f"fused step: {ms_step:.1f} ms outers={outs}", flush=True)

    config, params, state = s.config, s.params, s.state

    state_p = timed("prepare", jax.jit(
        lambda st: prepare(dm, st, params, config)), state, reps=5)

    es = timed("assemble_ell", jax.jit(
        lambda st: assemble_ell(dm, st, params, config)), state_p, reps=5)

    lv = timed("amg level values", jax.jit(
        lambda dg, o: compute_level_values(hier, dg, o)),
        es.P_diag, es.P_off, reps=5)

    dc, oc = lv[-1]
    cols = hier.levels[-1].ell_neighbor
    timed("coarse dense factor", jax.jit(
        lambda dg, o: _dense_factor(dg, o, cols)), dc, oc, reps=5)

    n_sweeps = config.pressure_sweeps(dm.num_cells)
    ps = make_pressure_solve(hier, dm, es,
                             coeff=params.density * state_p.d_p,
                             cycle_opts=config.cycle_opts())
    x = state.u[:, 0]
    r3 = jnp.stack([x, x * 0.5, x * 0.25], axis=0)

    @jax.jit
    def vc10(r):
        def body(k, acc):
            return ps(acc * (1 + 1e-30))
        return lax.fori_loop(0, 10, body, r)
    timed("v-cycle x10 (/10)", lambda r: vc10(r) / 10.0, x, reps=3)

    ms_n = (config.precond_mom_sweeps if config.precond_mom_sweeps > 0
            else 8)

    @jax.jit
    def pc10(r):
        def body(k, acc):
            return el.schur_precond(es, dm, acc * (1 + 1e-30),
                                    config.precond_omega, n_sweeps,
                                    pressure_solve=ps, mom_sweeps=ms_n)
        return lax.fori_loop(0, 10, body, r)
    timed("precond x10 m8 (/10)", lambda r: pc10(r) / 10.0, r3, reps=3)

    @jax.jit
    def mv10(r):
        def body(k, acc):
            return el.spmv(es, dm, acc * (1 + 1e-30))
        return lax.fori_loop(0, 10, body, r)
    timed("spmv x10 (/10)", lambda r: mv10(r) / 10.0, r3, reps=3)

    # The real per-outer solve cost at the developed state: FGMRES from the
    # state's own (u, p) — converges at iteration 0 but still pays its
    # setup (initial residual, norms, the restart-loop machinery).
    @jax.jit
    def solve(esv, st_p):
        mv = lambda xx: el.spmv(esv, dm, xx)
        pc = lambda rr: el.schur_precond(esv, dm, rr, config.precond_omega,
                                         n_sweeps, pressure_solve=ps,
                                         mom_sweeps=ms_n)
        x0 = jnp.concatenate([st_p.u, st_p.p[:, None]], axis=1).T
        return fgmres_solve(mv, pc, esv.rhs.T, x0,
                            restart=config.fgmres_restart,
                            max_restarts=config.fgmres_max_restarts,
                            tol=config.fgmres_tol,
                            abstol=config.fgmres_abstol,
                            stagnation_tol=config.fgmres_stagnation_tol,
                            stagnation_limit=config.fgmres_stagnation_limit)
    res = solve(es, state_p)
    it = int(res.iterations)
    t0 = time.time()
    for _ in range(5):
        res = solve(es, state_p)
    it = int(res.iterations)
    elpsd = (time.time() - t0 - SYNC) / 5
    print(f"fgmres-from-developed-guess: {elpsd*1e3:.2f} ms iters={it} "
          f"conv={bool(res.converged)}", flush=True)


if __name__ == "__main__":
    main()
