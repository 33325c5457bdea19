"""Per-component FGMRES roofline probe on the real TPU.

Times each hot-path piece as its own small jitted program at the benchmark
size, so compiles stay fast and every number maps to a specific kernel set:

  * stream     — elementwise y = x + 1 on the same bytes (HBM roofline)
  * matvec     — block_spmv on the assembled system
  * precond    — full Schur preconditioner (AMG V-cycle pressure solve)
  * vcycle     — the structured V-cycle alone
  * cgs        — one chunked CGS step (dots + projection) at j = mid-restart
  * fgmres30   — standalone 30-iteration FGMRES (tol=1e-12, 1 restart):
                 end-to-end ms/iteration

Usage:  python tools/prof_fgmres.py [min_cell]   (default 0.0017 ~= 1M cells)
"""

import os
import sys
import time

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

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.assembly import assemble_coupled, prepare
    from cfd2_tpu.models.coupled import _solve_linear
    from cfd2_tpu.ops.amg import build_hierarchy_for_mesh, make_pressure_solve
    from cfd2_tpu.ops.blockell import block_spmv
    from cfd2_tpu.ops.fgmres import fgmres_solve
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
          f"(grid {dm.grid_shape}) in {time.time()-t0:.1f}s")

    config = SolverConfig()
    params = SolverParams.default(dt=min(0.002, 0.4 * min_cell))
    u0 = np.zeros((mesh.num_cells, 2), np.float32)
    u0[mesh.cell_cx < min_cell * 2, 0] = 1.0
    state = initial_state(dm, u0=u0)

    state = jax.jit(prepare, static_argnames=("config",))(
        dm, state, params, config)
    sys_ = jax.jit(assemble_coupled, static_argnames=("config",))(
        dm, state, params, config)
    jax.block_until_ready(sys_.rhs)
    hier = build_hierarchy_for_mesh(dm)

    # --- stream roofline: same bytes as one basis vector (n, 3) ---
    x3 = jnp.concatenate([state.u, state.p[:, None]], axis=1)
    big = jnp.zeros((64, n), jnp.float32)  # 256 MB-ish stream probe at 1M

    ms = timeit(jax.jit(lambda v: v + 1.0), big)
    bw = big.size * 4 * 2 / ms * 1e3 / 1e9
    print(f"stream   {ms:8.3f} ms   ({bw:.0f} GB/s r+w)")

    # --- matvec ---
    f_mv = jax.jit(lambda s, x: block_spmv(s, dm, x))
    ms = timeit(f_mv, sys_, x3)
    print(f"matvec   {ms:8.3f} ms")

    # --- precond (schur + AMG) ---
    n_sweeps = config.pressure_sweeps(n)

    def precond(s, r):
        return schur_preconditioner(
            s, dm, r, config.precond_omega, n_sweeps,
            pressure_solve=make_pressure_solve(hier, dm, s))

    f_pc = jax.jit(precond)
    ms = timeit(f_pc, sys_, x3)
    print(f"precond  {ms:8.3f} ms")

    # --- V-cycle alone ---
    def vcyc(s, r):
        return make_pressure_solve(hier, dm, s)(r)

    ms = timeit(jax.jit(vcyc), sys_, state.p)
    print(f"vcycle   {ms:8.3f} ms")

    # --- CGS step at j = 25 (dots + projection over chunked basis) ---
    m = config.fgmres_restart
    V = jnp.zeros((m + 1, n, 3), jnp.float32) + 0.001
    w0 = x3 + 0.0

    def cgs(V, w, j):
        idx = jnp.arange(m + 1)
        n_chunks = 3
        ch = -(-(m + 1) // n_chunks)
        parts = []
        proj = jnp.zeros_like(w)
        from jax import lax
        for start in range(0, m + 1, ch):
            size = min(ch, m + 1 - start)
            Vc = lax.slice_in_dim(V, start, start + size, axis=0)
            maskc = idx[start:start + size] <= j

            def _c(Vc=Vc, maskc=maskc):
                d = jnp.einsum("i...,...->i", Vc, w,
                               preferred_element_type=jnp.float32)
                d = jnp.where(maskc, d, 0.0)
                p = jnp.einsum("i,i...->...", d, Vc,
                               preferred_element_type=jnp.float32)
                return d, p

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
        # active traffic: 2 reads of ceil((j+1)/ch)*ch rows of (n,3) f32
        rows = -(-(j + 1) // 17) * 17
        bw = 2 * rows * n * 3 * 4 / ms * 1e3 / 1e9
        print(f"cgs j={j:2d} {ms:8.3f} ms   ({bw:.0f} GB/s effective)")

    # --- end-to-end: 30 forced iterations ---
    from dataclasses import replace as _rep
    cfg30 = _rep(config, fgmres_tol=1e-12, fgmres_abstol=1e-12,
                 fgmres_max_restarts=1, fgmres_restart=30)

    def solve30(s, st):
        return _solve_linear(dm, s, st, cfg30, n_sweeps,
                             make_pressure_solve(hier, dm, s))

    f30 = jax.jit(solve30)
    t0 = time.time()
    r = f30(sys_, state)
    jax.block_until_ready(r.x)
    print(f"# fgmres30 compile+run: {time.time()-t0:.1f}s")
    ms = timeit(f30, sys_, state, n=3, warmup=1)
    iters = int(r.iterations)
    print(f"fgmres30 {ms:8.3f} ms total, {iters} iters "
          f"-> {ms / max(iters, 1):.3f} ms/iter")


if __name__ == "__main__":
    main()
