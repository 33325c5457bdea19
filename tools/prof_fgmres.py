"""Per-component FGMRES roofline probe on the real TPU.

Times each hot-path piece as its own small jitted program at the benchmark
size, so compiles stay fast and every number maps to a specific kernel set:

  * stream     — elementwise y = x + 1 on the same bytes (HBM roofline)
  * matvec     — block_spmv on the assembled system (block-ELL path)
  * st_matvec  — StencilSystem spmv (2D-native structured path)
  * precond    — full Schur preconditioner (AMG V-cycle pressure solve)
  * st_precond — 2D-native Schur preconditioner
  * vcycle     — the structured V-cycle alone
  * cgs        — one chunked CGS step (dots + projection) at several j
  * assemble   — block-ELL assembly; st_assemble — stencil assembly
  * fgmres30   — standalone 30-iteration FGMRES (tol=1e-12, 1 restart):
                 end-to-end ms/iteration on the stencil path

Usage:  python tools/prof_fgmres.py [min_cell]   (default 0.0017 ~= 1M cells)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    min_cell = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0017
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    def want(name):
        return only is None or name in only

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.assembly import (assemble_coupled, assemble_stencil,
                                          prepare)
    from cfd2_tpu.models.coupled import _assemble_and_solve
    from cfd2_tpu.ops import stencil_system as st
    from cfd2_tpu.ops.amg import build_hierarchy_for_mesh, make_pressure_solve
    from cfd2_tpu.ops.blockell import block_spmv
    from cfd2_tpu.ops.schur import schur_preconditioner
    from cfd2_tpu.runtime.device_mesh import encode_mesh
    from cfd2_tpu.runtime.state import SolverConfig, SolverParams, initial_state

    t0 = time.time()
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, min_cell, min_cell, 1.2, (3.0, 1.0))
    dm = encode_mesh(mesh)
    n = dm.num_cells
    print(f"# mesh {mesh.num_cells} cells -> device {n} "
          f"(grid {dm.grid_shape}) in {time.time()-t0:.1f}s", flush=True)

    config = SolverConfig()
    params = SolverParams.default(dt=min(0.002, 0.4 * min_cell))
    u0 = np.zeros((mesh.num_cells, 2), np.float32)
    u0[mesh.cell_cx < min_cell * 2, 0] = 1.0
    state = initial_state(dm, u0=u0)

    state = jax.jit(prepare, static_argnames=("config",))(
        dm, state, params, config)
    f_asm = jax.jit(assemble_coupled, static_argnames=("config",))
    f_asm_st = jax.jit(assemble_stencil, static_argnames=("config",))
    sys_ = f_asm(dm, state, params, config)
    ss = f_asm_st(dm, state, params, config)
    jax.block_until_ready(ss.rhs)
    hier = build_hierarchy_for_mesh(dm)

    # --- launch overhead + stream roofline ---
    x3 = jnp.concatenate([state.u, state.p[:, None]], axis=1)
    if want("stream"):
        tiny = jnp.zeros((8, 128), jnp.float32)
        ms0 = timeit(jax.jit(lambda v: v + 1.0), tiny, n=20)
        print(f"launch     {ms0:8.3f} ms   (per-execution overhead)",
              flush=True)
        for mult in (64, 256):
            big = jnp.zeros((mult, n), jnp.float32)
            ms = timeit(jax.jit(lambda v: v + 1.0), big)
            bw = big.size * 4 * 2 / (ms - ms0) * 1e3 / 1e9
            print(f"stream{mult:<4d}{ms:8.3f} ms   ({bw:.0f} GB/s r+w "
                  f"net of launch)", flush=True)

    n_sweeps = config.pressure_sweeps(n)

    if want("assemble"):
        ms = timeit(lambda: f_asm(dm, state, params, config), n=5)
        print(f"assemble   {ms:8.3f} ms", flush=True)
        ms = timeit(lambda: f_asm_st(dm, state, params, config), n=5)
        print(f"st_assemble{ms:8.3f} ms", flush=True)

    if want("matvec"):
        ms = timeit(jax.jit(lambda s, x: block_spmv(s, dm, x)), sys_, x3)
        print(f"matvec     {ms:8.3f} ms", flush=True)
        ms = timeit(jax.jit(st.spmv), ss, x3)
        print(f"st_matvec  {ms:8.3f} ms", flush=True)

    if want("precond"):
        def precond(s, r):
            return schur_preconditioner(
                s, dm, r, config.precond_omega, n_sweeps,
                pressure_solve=make_pressure_solve(hier, dm, s))
        ms = timeit(jax.jit(precond), sys_, x3)
        print(f"precond    {ms:8.3f} ms", flush=True)

        def precond_st(s, r):
            return st.schur_precond(s, r, config.precond_omega, n_sweeps,
                                    pressure_solve=st.make_pressure_solve2(
                                        hier, s))
        ms = timeit(jax.jit(precond_st), ss, x3)
        print(f"st_precond {ms:8.3f} ms", flush=True)

    if want("vcycle"):
        # Split setup (Galerkin re-coarsening + coarse LU, once per
        # assembly) from application (once per Krylov iteration).
        from cfd2_tpu.ops.amg import (_GridOps, _dense_factor,
                                      compute_structured_level_values2,
                                      structured_v_cycle)

        def coarsen(s):
            lv2 = compute_structured_level_values2(hier, s.P_diag2, s.P_off2)
            dc, oc = lv2[-1]
            fac = _dense_factor(
                dc.reshape(-1), jnp.moveaxis(oc.reshape(4, -1), 0, 1),
                _GridOps(hier.levels[-1].grid).neighbor_cols())
            return lv2, fac

        f_coarsen = jax.jit(coarsen)
        lv2, fac = f_coarsen(ss)
        jax.block_until_ready(fac)
        ms = timeit(f_coarsen, ss, n=5)
        print(f"coarsen    {ms:8.3f} ms   (per-assembly setup)", flush=True)

        def vapply(lv2, fac, r):
            return structured_v_cycle(hier, lv2, r.reshape(-1),
                                      jnp.zeros_like(r).reshape(-1),
                                      coarse_factors=fac)

        f_va = jax.jit(vapply)
        ms = timeit(f_va, lv2, fac, state.p.reshape(dm.grid_shape))
        print(f"vapply     {ms:8.3f} ms   (per-iteration V-cycle)",
              flush=True)

        def pc_apply(s, lv2, fac, r):
            def ps(rhs2):
                return structured_v_cycle(
                    hier, lv2, rhs2.reshape(-1),
                    (s.diag_p_inv2 * rhs2).reshape(-1),
                    coarse_factors=fac).reshape(s.grid)
            return st.schur_precond(s, r, config.precond_omega, n_sweeps,
                                    pressure_solve=ps)

        ms = timeit(jax.jit(pc_apply), ss, lv2, fac, x3)
        print(f"pc_apply   {ms:8.3f} ms   (per-iteration Schur+V-cycle)",
              flush=True)

    # --- CGS step (flattened basis, chunk gating) at several j ---
    if want("cgs"):
        from jax import lax
        m = config.fgmres_restart
        D = n * 3
        V = jnp.zeros((m + 1, D), jnp.float32) + 0.001
        w0 = x3.reshape(-1) + 0.0
        chrows = 8

        def cgs(V, w, j):
            idx = jnp.arange(m + 1)
            parts = []
            proj = jnp.zeros_like(w)
            for start in range(0, m + 1, chrows):
                size = min(chrows, m + 1 - start)
                Vc = lax.slice_in_dim(V, start, start + size, axis=0)
                maskc = idx[start:start + size] <= j

                def _c(Vc=Vc, maskc=maskc):
                    d = Vc @ w
                    d = jnp.where(maskc, d, 0.0)
                    return d, d @ Vc

                if start == 0:
                    d, p = _c()
                else:
                    d, p = lax.cond(j >= start, _c,
                                    lambda size=size: (
                                        jnp.zeros((size,), jnp.float32),
                                        jnp.zeros_like(w)))
                parts.append(d)
                proj = proj + p
            return jnp.concatenate(parts), w - proj

        f_cgs = jax.jit(cgs)
        for j in (8, 25, 45):
            ms = timeit(f_cgs, V, w0, jnp.int32(j))
            rows = -(-(j + 1) // chrows) * chrows
            bw = 2 * rows * D * 4 / ms * 1e3 / 1e9
            print(f"cgs j={j:2d}   {ms:8.3f} ms   ({bw:.0f} GB/s effective)",
                  flush=True)

        def cgs_full(V, w):                      # unchunked: all m+1 rows
            d = V @ w
            return d, w - d @ V

        ms = timeit(jax.jit(cgs_full), V, w0)
        bw = 2 * (m + 1) * D * 4 / ms * 1e3 / 1e9
        print(f"cgs full   {ms:8.3f} ms   ({bw:.0f} GB/s, all {m+1} rows)",
              flush=True)

    # --- end-to-end: 30 forced iterations on the production path ---
    if want("fgmres30"):
        from dataclasses import replace as _rep
        cfg30 = _rep(config, fgmres_tol=1e-12, fgmres_abstol=1e-12,
                     fgmres_max_restarts=1, fgmres_restart=30)

        def solve30(st_, prm):
            return _assemble_and_solve(dm, st_, prm, cfg30, hier,
                                       n_sweeps, None)

        f30 = jax.jit(solve30)
        t0 = time.time()
        r = f30(state, params)
        jax.block_until_ready(r.x)
        print(f"# fgmres30 compile+run: {time.time()-t0:.1f}s", flush=True)
        ms = timeit(f30, state, params, n=3, warmup=1)
        iters = int(r.iterations)
        print(f"fgmres30   {ms:8.3f} ms total, {iters} iters "
              f"-> {ms / max(iters, 1):.3f} ms/iter", flush=True)

    if want("fgmres30id"):
        # Identity preconditioner: isolates the non-precond per-iteration
        # cost (CGS + matvec + basis updates + scalar tail) inside the
        # production while_loop.
        from cfd2_tpu.models.assembly import assemble_stencil as _asm
        from cfd2_tpu.ops.fgmres import fgmres_solve

        def solve30id(st_, prm):
            ss_ = _asm(dm, st_, prm, config)
            x0 = jnp.concatenate([st_.u, st_.p[:, None]], axis=1)
            return fgmres_solve(lambda x: st.spmv(ss_, x), lambda r: r,
                                ss_.rhs, x0, restart=30, max_restarts=1,
                                tol=1e-12, abstol=1e-12)

        fid = jax.jit(solve30id)
        t0 = time.time()
        r = fid(state, params)
        jax.block_until_ready(r.x)
        print(f"# fgmres30id compile+run: {time.time()-t0:.1f}s", flush=True)
        ms = timeit(fid, state, params, n=3, warmup=1)
        iters = int(r.iterations)
        print(f"fgmres30id {ms:8.3f} ms total, {iters} iters "
              f"-> {ms / max(iters, 1):.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
