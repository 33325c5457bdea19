"""Per-step breakdown of the banded (unstructured) e2e path: prepare,
assemble_ell, AMG level values + coarse factor, one preconditioner apply,
one SpMV, the FGMRES solve, and the full fused step.  Value-read synced
(block_until_ready is not a reliable fence through the tunnel).

Usage: python tools/prof_banded2.py [min_cell] [delaunay|voronoi]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SYNC = 0.030  # tunnel scalar-read latency (DESIGN 9b)


def timed(label, fn, *args, reps=10):
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
    size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    mesh_type = sys.argv[2] if len(sys.argv) > 2 else "delaunay"

    from cfd2_tpu.mesh import (ChannelWithObstacle, generate_delaunay_mesh,
                               generate_voronoi_mesh)
    from cfd2_tpu.models.assembly import assemble_ell, prepare
    from cfd2_tpu.models.coupled import CoupledSolver
    from cfd2_tpu.ops import ellsys as el
    from cfd2_tpu.ops.amg import (compute_level_values, make_pressure_solve,
                                  _dense_factor)
    from cfd2_tpu.ops.fgmres import fgmres_solve

    gen = {"delaunay": generate_delaunay_mesh,
           "voronoi": generate_voronoi_mesh}[mesh_type]
    geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
    t0 = time.time()
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
          f"W={dm.bd_W} mesh+encode {time.time()-t0:.0f}s", flush=True)
    hier = s._get_amg()
    print(f"# AMG levels: {[lv.n for lv in hier.levels]} "
          f"banded={[lv.bm_ell is not None for lv in hier.levels]}",
          flush=True)

    config, params = s.config, s.params

    state = timed("prepare", jax.jit(
        lambda st: prepare(dm, st, params, config)), s.state, reps=5)

    es = timed("assemble_ell", jax.jit(
        lambda st: assemble_ell(dm, st, params, config)), state, reps=5)

    lv = timed("amg level values", jax.jit(
        lambda d, o: compute_level_values(hier, d, o)),
        es.P_diag, es.P_off, reps=5)

    dc, oc = lv[-1]
    cols = hier.levels[-1].ell_neighbor
    timed("coarse dense factor", jax.jit(
        lambda d, o: _dense_factor(d, o, cols)), dc, oc, reps=5)

    n_sweeps = config.pressure_sweeps(dm.num_cells)
    ps = make_pressure_solve(hier, dm, es)
    x = state.u[:, 0]
    r3 = jnp.stack([x, x * 0.5, x * 0.25], axis=0)

    @jax.jit
    def vc10(r):
        def body(k, acc):
            return ps(acc * (1 + 1e-30))
        return lax.fori_loop(0, 10, body, r)
    timed("v-cycle x10 (/10)", lambda r: vc10(r) / 10.0, x, reps=3)

    for ms in (1, 8):
        @jax.jit
        def pc10(r, ms=ms):
            def body(k, acc):
                return el.schur_precond(es, dm, acc * (1 + 1e-30),
                                        config.precond_omega, n_sweeps,
                                        pressure_solve=ps, mom_sweeps=ms)
            return lax.fori_loop(0, 10, body, r)
        timed(f"precond x10 m{ms} (/10)", lambda r: pc10(r) / 10.0, r3,
              reps=3)

    @jax.jit
    def mv10(r):
        def body(k, acc):
            return el.spmv(es, dm, acc * (1 + 1e-30))
        return lax.fori_loop(0, 10, body, r)
    timed("spmv x10 (/10)", lambda r: mv10(r) / 10.0, r3, reps=3)

    ms = 8

    @jax.jit
    def solve(rhs, x0):
        mv = lambda xx: el.spmv(es, dm, xx)
        pc = lambda rr: el.schur_precond(es, dm, rr, config.precond_omega,
                                         n_sweeps, pressure_solve=ps,
                                         mom_sweeps=ms)
        return fgmres_solve(mv, pc, rhs, x0, restart=config.fgmres_restart,
                            max_restarts=3, tol=1e-5, abstol=1e-7)
    x0 = jnp.concatenate([state.u, state.p[:, None]], axis=1).T
    res = solve(es.rhs.T, x0)
    it = int(res.iterations)
    t0 = time.time()
    res = solve(es.rhs.T, x0)
    it = int(res.iterations)
    elpsd = time.time() - t0 - SYNC
    print(f"solve m{ms}: {elpsd*1e3:.0f} ms iters={it} "
          f"{elpsd/max(it,1)*1e3:.2f} ms/iter conv={bool(res.converged)}",
          flush=True)

    # Full fused step (compile + 3 timed)
    t0 = time.time()
    s.step(mode="fused")
    int(s.state.outer_iters)
    print(f"step compile+run: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    outs = []
    for _ in range(3):
        s.step(mode="fused")
        outs.append(int(s.state.outer_iters))
    elpsd = (time.time() - t0) / 3
    print(f"step: {elpsd*1e3:.0f} ms outers={outs} "
          f"-> {dm.num_cells/elpsd:.0f} c-u/s", flush=True)


if __name__ == "__main__":
    main()
