"""Coupled (u,v,p) timestep driver.

TPU-native re-design of the reference outer loop
(src/solver/gpu/coupled_solver.rs:33-580):

* one jitted :func:`step` = prepare -> [assemble -> FGMRES -> relax update]
  outer-corrector loop as a ``lax.while_loop`` with on-device convergence and
  stagnation tests (the reference used async GPU->CPU scalar readbacks);
* the steady-state/degeneracy classifier (``check_evolution``,
  coupled_solver.rs:501-580) runs on-device from state carried across steps —
  no per-step field readback;
* :class:`CoupledSolver` is the host-side façade reproducing the reference's
  headless API contract (GpuSolver::new -> set_* -> step -> get_u/get_p,
  SURVEY.md §3.5).
"""

from __future__ import annotations

import os
from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.blockell import block_spmv
from ..ops.fgmres import fgmres_solve
from ..ops.schur import schur_preconditioner
from ..runtime.device_mesh import DeviceMesh, encode_mesh
from ..runtime.state import (
    PRECOND_AMG,
    PRECOND_BLOCK_JACOBI,
    SCHEME_UPWIND,
    SolverConfig,
    SolverParams,
    SolverState,
    initial_state,
)
from .assembly import assemble_coupled, prepare


def _solve_linear(mesh, sys, state, config, n_sweeps, pressure_solve=None,
                  tol=None, x_guess=None):
    """One coupled linear solve: FGMRES + Schur (or block-Jacobi)
    preconditioner.  ``tol`` (possibly traced) overrides the relative
    tolerance (inexact-Newton forcing)."""
    matvec = lambda x: block_spmv(sys, mesh, x)
    if config.precond_type == PRECOND_BLOCK_JACOBI:
        from ..ops.schur import block_jacobi_preconditioner
        precond = lambda r: block_jacobi_preconditioner(sys, r)
    else:
        # Size-auto deep sweeps: the banded Pallas gather made extra sweeps
        # affordable on unstructured meshes too (each costs two cheap
        # gathers); the XLA-gather fallback keeps the reference's bare
        # diagonal.
        if config.precond_mom_sweeps > 0:
            ms = config.precond_mom_sweeps
        elif mesh.banded:
            ms = config.mom_sweeps(mesh.num_cells)
        else:
            ms = 1
        precond = lambda r: schur_preconditioner(
            sys, mesh, r, config.precond_omega, n_sweeps,
            pressure_solve=pressure_solve, mom_sweeps=ms)
    x0 = (x_guess if x_guess is not None else
          jnp.concatenate([state.u, state.p[:, None]], axis=1))
    return fgmres_solve(
        matvec, precond, sys.rhs, x0,
        restart=config.fgmres_restart,
        max_restarts=config.fgmres_max_restarts,
        tol=config.fgmres_tol if tol is None else tol,
        abstol=config.fgmres_abstol,
        stagnation_tol=config.fgmres_stagnation_tol,
        stagnation_limit=config.fgmres_stagnation_limit,
        basis_dtype=jnp.bfloat16 if config.fgmres_basis_bf16 else None,
        f64_norms=config.fgmres_f64_norms,
        incycle_window=config.fgmres_incycle_window,
        incycle_tol=config.fgmres_incycle_tol)


def _use_stencil_path(mesh, config, amg) -> bool:
    """The 2D-native stencil system covers the Schur-preconditioned flows on
    structured meshes (the hot configurations); block-Jacobi and generic
    meshes keep the block-ELL path."""
    if not mesh.structured or config.precond_type == PRECOND_BLOCK_JACOBI:
        return False
    if config.precond_type == PRECOND_AMG:
        from ..ops.amg import StructuredAmgHierarchy
        return isinstance(amg, StructuredAmgHierarchy)
    return True


def _basis_init(mesh, state, config, amg):
    """Zero Krylov-basis tuple matching fgmres_solve's return_basis shapes
    for this mesh/config (SolverConfig.fgmres_recycle carry seed).  None on
    the generic block path (recycling unsupported there)."""
    m = config.fgmres_restart
    dtype = jnp.float32
    bd = jnp.bfloat16 if config.fgmres_basis_bf16 else dtype
    if _use_stencil_path(mesh, config, amg):
        ny, nx = mesh.grid_shape
        vshape = (3, ny, nx)
    elif mesh.banded and config.precond_type != PRECOND_BLOCK_JACOBI:
        vshape = (3, state.u.shape[0])
    else:
        return None
    if vshape[-1] < 128:       # mirror fgmres_solve's flatten criterion
        vshape = (int(np.prod(vshape)),)
    return (jnp.zeros((m + 1,) + vshape, bd),
            jnp.zeros((m,) + vshape, dtype),
            jnp.zeros((m + 1, m), dtype),
            jnp.zeros((m,), dtype), jnp.zeros((m,), dtype), jnp.int32(0))


def _assemble_and_solve(mesh, state, params, config, amg, n_sweeps, tol,
                        x_guess=None, presolve_ok=None, frozen_amg=None,
                        recycle=None):
    """Assemble the coupled system (stencil form on structured meshes,
    block-ELL otherwise) and run one preconditioned FGMRES solve.
    ``x_guess``: optional (N, 3) Krylov initial guess (defaults to the
    current fields).  ``frozen_amg``: per-step frozen coarse AMG operators
    (banded path; see SolverConfig.amg_freeze_coarse).  ``recycle``: a
    previous solve's Krylov basis tuple (SolverConfig.fgmres_recycle);
    when given, the solve also returns its own basis in result.basis."""
    rb = recycle is not None
    if _use_stencil_path(mesh, config, amg):
        from ..ops import stencil_system as st
        from .assembly import assemble_stencil
        ss = assemble_stencil(mesh, state, params, config)
        # The whole solve runs on (3, ny, nx) component planes; the (N, 3)
        # interleaved layout is converted exactly once at entry/exit (its
        # 3-wide minor axis costs a relayout on every per-iteration
        # split/stack otherwise).
        matvec = lambda x: st.spmv_planar(ss, x)
        ps = (st.make_pressure_solve2(
                  amg, ss, n_cycles=config.pressure_vcycles(mesh.num_cells),
                  frozen=frozen_amg)
              if config.precond_type == PRECOND_AMG else None)
        if config.precond_bf16:
            # Apply M^{-1} in bf16 (coefficients cast once per assembly);
            # the pressure V-cycle stays f32.  See SolverConfig.precond_bf16.
            ss_pc = st.cast_coeffs(ss, jnp.bfloat16)
            ps_f32 = ps if ps is not None else (
                lambda rhs2: st.chebyshev_pressure_solve2(
                    ss, rhs2, config.precond_omega, n_sweeps))
            ps_pc = lambda rhs: ps_f32(
                rhs.astype(jnp.float32)).astype(jnp.bfloat16)
            precond = lambda r: st.schur_precond_planar(
                ss_pc, r.astype(jnp.bfloat16), config.precond_omega,
                n_sweeps, pressure_solve=ps_pc,
                mom_sweeps=config.mom_sweeps(mesh.num_cells),
                mom_adi=config.precond_mom_adi,
            ).astype(jnp.float32)
        else:
            precond = lambda r: st.schur_precond_planar(
                ss, r, config.precond_omega, n_sweeps, pressure_solve=ps,
                mom_sweeps=config.mom_sweeps(mesh.num_cells),
                mom_adi=config.precond_mom_adi)
        x0 = (x_guess if x_guess is not None else
              jnp.concatenate([state.u, state.p[:, None]], axis=1))
        x0p = st.to_planar(ss, x0)

        if config.presolve_pressure_iters > 0:
            # First-outer pressure presolve (SolverConfig docs; VERDICT r3
            # #2): fires only on the FIRST outer (later outers' residuals
            # are small and the Schur correction would be pure overhead —
            # measured 1.41M -> 0.77M c-u/s when allowed to fire every
            # transient outer) and only when the initial residual is far
            # above the Krylov target.  The correction is self-guarded: it
            # is taken only if one extra SpMV confirms it reduced the
            # residual (CG on the near-singular pressure operator can
            # otherwise inject a large spurious component).
            b2 = st.to_planar(ss, ss.rhs)
            r0 = b2 - st.spmv_planar(ss, x0p)
            r0n = jnp.sqrt(jnp.sum(r0 * r0))
            bn = jnp.sqrt(jnp.sum(b2 * b2))
            gate_tol = jnp.asarray(config.fgmres_tol if tol is None else tol,
                                   jnp.float32)
            target = jnp.maximum(gate_tol * bn,
                                 jnp.asarray(config.fgmres_abstol, jnp.float32))
            need = r0n > config.presolve_threshold * target
            if presolve_ok is not None:
                need = need & presolve_ok

            def _build(xp):
                corr = st.schur_guess(
                    ss, r0, config.precond_omega, n_sweeps,
                    pressure_solve=ps,
                    cg_iters=config.presolve_pressure_iters,
                    mom_sweeps=config.mom_sweeps(mesh.num_cells),
                    mom_adi=config.precond_mom_adi)
                rn = r0 - st.spmv_planar(ss, corr)
                ok = jnp.sqrt(jnp.sum(rn * rn)) < r0n
                return jnp.where(ok, xp + corr, xp)

            x0p = lax.cond(need, _build, lambda xp: xp, x0p)

        def _run(x0v, tol_v, abstol_v, bf16):
            if bf16:
                ss16 = st.cast_coeffs(ss, jnp.bfloat16)
                pcv = lambda r: st.schur_precond_planar(
                    ss16, r.astype(jnp.bfloat16), config.precond_omega,
                    n_sweeps,
                    pressure_solve=lambda rhs: (
                        ps(rhs.astype(jnp.float32)).astype(jnp.bfloat16)
                        if ps is not None else
                        st.chebyshev_pressure_solve2(
                            ss, rhs.astype(jnp.float32),
                            config.precond_omega, n_sweeps)
                        .astype(jnp.bfloat16)),
                    mom_sweeps=config.mom_sweeps(mesh.num_cells),
                    mom_adi=config.precond_mom_adi).astype(jnp.float32)
            else:
                pcv = precond
            return fgmres_solve(
                matvec, pcv, st.to_planar(ss, ss.rhs), x0v,
                restart=config.fgmres_restart,
                max_restarts=config.fgmres_max_restarts,
                tol=tol_v, abstol=abstol_v,
                stagnation_tol=config.fgmres_stagnation_tol,
                stagnation_limit=config.fgmres_stagnation_limit,
                basis_dtype=jnp.bfloat16 if bf16 or config.fgmres_basis_bf16
                else None,
                recycle=None if bf16 else recycle,
                return_basis=rb and not bf16,
                f64_norms=config.fgmres_f64_norms,
                incycle_window=config.fgmres_incycle_window,
                incycle_tol=config.fgmres_incycle_tol)

        tol_eff = config.fgmres_tol if tol is None else tol
        if config.fgmres_mixed_phase:
            # Coarse phase: bf16 basis + bf16 preconditioner down to ~1e-3
            # relative (22% cheaper per iteration; the bf16 orthogonality
            # floor only binds below that), then finish in f32 from the
            # phase-1 iterate.  The phase boundary is just an extra restart
            # (FGMRES restarts every `restart` iterations anyway), and the
            # f32 phase re-derives its own true residual, so the final
            # tolerance contract is untouched.
            r1 = _run(x0p,
                      jnp.maximum(jnp.asarray(tol_eff, jnp.float32) * 30.0,
                                  1e-3),
                      config.fgmres_abstol * 100.0, True)
            r2 = _run(r1.x, tol_eff, config.fgmres_abstol, False)
            result = replace(r2, iterations=r1.iterations + r2.iterations)
        else:
            result = _run(x0p, tol_eff,
                          config.fgmres_abstol, False)
        return replace(result, x=st.from_planar(ss, result.x))

    if mesh.banded and config.precond_type != PRECOND_BLOCK_JACOBI:
        # Banded (unstructured) path: scalar-coefficient system + banded
        # Pallas gathers (ops/ellsys.py) — skips the (N, K, 3, 3) block
        # materialization whose tile-padded minor dims cost ~10x the useful
        # bytes per SpMV.
        from ..ops import ellsys as el
        from .assembly import assemble_ell
        es = assemble_ell(mesh, state, params, config)
        if config.precond_type == PRECOND_AMG and amg is not None:
            from ..ops.amg import make_pressure_solve
            ps = make_pressure_solve(amg, mesh, es,
                                     coeff=params.density * state.d_p,
                                     cycle_opts=config.cycle_opts(),
                                     frozen=frozen_amg)
        else:
            ps = None
        # Momentum depth 8: with the fused banded-dot sweeps (a sweep is
        # one in-kernel dot, not a gather pair) the halved iteration count
        # wins: m1 solve 122 ms/48 iters vs m8 99 ms/24 iters at 145k.
        ms = (config.precond_mom_sweeps if config.precond_mom_sweeps > 0
              else 8)
        precond = lambda r: el.schur_precond(
            es, mesh, r, config.precond_omega, n_sweeps,
            pressure_solve=ps, mom_sweeps=ms)
        # Solve vectors run component-major (3, N): interleaved (N, 3)
        # tile-pads its lane dim 42x and relayouts at every loop op
        # (measured 3.1 -> 0.65 ms/iter bare-loop at 403k).  One transpose
        # each way per solve.
        x0 = (x_guess if x_guess is not None else
              jnp.concatenate([state.u, state.p[:, None]], axis=1))
        result = fgmres_solve(
            lambda x: el.spmv(es, mesh, x), precond, es.rhs.T, x0.T,
            restart=config.fgmres_restart,
            max_restarts=config.fgmres_max_restarts,
            tol=config.fgmres_tol if tol is None else tol,
            abstol=config.fgmres_abstol,
            stagnation_tol=config.fgmres_stagnation_tol,
            stagnation_limit=config.fgmres_stagnation_limit,
            basis_dtype=jnp.bfloat16 if config.fgmres_basis_bf16 else None,
            f64_norms=config.fgmres_f64_norms,
            incycle_window=config.fgmres_incycle_window,
            incycle_tol=config.fgmres_incycle_tol,
            recycle=recycle, return_basis=rb)
        return replace(result, x=result.x.T)

    sys = assemble_coupled(mesh, state, params, config)
    if config.precond_type == PRECOND_AMG and amg is not None:
        from ..ops.amg import make_pressure_solve
        pressure_solve = make_pressure_solve(
            amg, mesh, sys, coeff=params.density * state.d_p,
            cycle_opts=config.cycle_opts())
    else:
        pressure_solve = None
    return _solve_linear(mesh, sys, state, config, n_sweeps, pressure_solve,
                         tol=tol, x_guess=x_guess)


def _anderson_mix(g, x, Gh, Fh, it, config: SolverConfig):
    """One Anderson(type-II) mixing step for the outer fixed point x -> G(x).

    ``g`` is the plain relaxed update G(x_k) (flattened), ``x`` the current
    iterate x_k; ``Gh``/``Fh`` hold the last depth+1 map outputs/residuals
    (newest first).  Returns (x_next, Gh, Fh).  The depth x depth normal
    equations are solved on-device (depth is 2-3: the solve is trivially
    cheap); a safeguard falls back to the plain update when the
    extrapolation coefficients blow up (noisy residual differences).
    """
    m = config.anderson_depth
    f = g - x
    Gh = jnp.roll(Gh, 1, axis=0).at[0].set(g)
    Fh = jnp.roll(Fh, 1, axis=0).at[0].set(f)

    navail = jnp.minimum(it, m)
    mask = jnp.arange(1, m + 1) <= navail
    dF = jnp.where(mask[:, None], Fh[0][None] - Fh[1:], 0.0)   # (m, D)
    dG = jnp.where(mask[:, None], Gh[0][None] - Gh[1:], 0.0)

    gram = dF @ dF.T                                           # (m, m)
    rhs = dF @ f
    # Tikhonov-regularize at the gram's own scale; masked rows become
    # identity rows with zero rhs -> gamma_i = 0 exactly.
    scale = jnp.maximum(jnp.trace(gram) / m, 1e-30)
    gram = gram + 1e-8 * scale * jnp.eye(m, dtype=gram.dtype)
    gram = jnp.where(mask[:, None] & mask[None, :], gram,
                     jnp.eye(m, dtype=gram.dtype))
    rhs = jnp.where(mask, rhs, 0.0)
    gamma = jnp.linalg.solve(gram, rhs)

    ok = (navail >= 1) & jnp.all(jnp.isfinite(gamma)) & \
        (jnp.sqrt(jnp.sum(gamma * gamma)) <= config.anderson_gamma_max)
    x_next = jnp.where(ok, g - gamma @ dG, g)
    return x_next, Gh, Fh


def _plateau_update(du_ok, dp_ref, diff_u, diff_p, config: SolverConfig):
    """Pressure-plateau patience bookkeeping (SolverConfig.outer_pressure_patience).

    Counts consecutive outers with du below 2x tol (on the plateau du bounces
    around tol_u from solve noise, so strict sub-tol hits would keep the
    reference's burn-to-cap behavior).  The exit is additionally gated on the
    pressure residual actually stalling: dp must not have halved across the
    patience window (``dp_ref`` = dp at window start), so a velocity-converged
    flow whose pressure is still steadily decreasing keeps iterating —
    matching the reference's both-tolerances contract
    (coupled_solver.rs:445-476) instead of exiting early on it.  A window that
    expires while pressure is still improving restarts, so a fresh plateau can
    be detected at the new dp level.

    Returns (du_ok, dp_ref, plateau).  Works on jnp scalars (fused path);
    step_host mirrors the same logic on Python floats.
    """
    dp_ref = jnp.where(du_ok == 0, diff_p, dp_ref)
    du_ok = jnp.where(diff_u < 2.0 * config.outer_tol_u, du_ok + 1, 0)
    window_full = du_ok >= config.outer_pressure_patience
    p_stalled = diff_p > 0.5 * dp_ref
    plateau = (config.outer_pressure_patience > 0) & window_full & p_stalled
    du_ok = jnp.where(window_full & ~p_stalled, 0, du_ok)
    return du_ok, dp_ref, plateau


def check_evolution(state: SolverState, config: SolverConfig,
                    valid: jnp.ndarray | None = None) -> SolverState:
    """On-device steady-state / degeneracy classifier
    (reference coupled_solver.rs:501-580, there a full GPU->CPU readback).

    Statistic parity note: the reference pushes (var_u, var_v) into a
    10-deep ``variance_history`` (coupled_solver.rs:527-530) but never reads
    it back — its classification (:552-566) uses only the *current* variance
    plus the RMSE-vs-previous-step evolution test and consecutive-hit
    counters, which is exactly what this function computes.  The dead history
    buffer is deliberately not ported.  Thresholds and the >10-consecutive-
    hits contract match (:546-548, :569-580); tests/test_physics.py drives a
    degenerate case to ``should_stop`` under that contract.

    ``valid`` masks out structured-layout solid cells so statistics match the
    reference's fluid-cells-only readback."""
    u = state.u
    if valid is None:
        w = jnp.ones((u.shape[0],), u.dtype)
    else:
        w = valid
    n = jnp.sum(w)
    mean = jnp.sum(u * w[:, None], axis=0) / n
    var = jnp.sum(u * u * w[:, None], axis=0) / n - mean * mean
    var = jnp.maximum(var, 0.0)

    rmse = jnp.sqrt(jnp.sum(jnp.sum((u - state.prev_u) ** 2, axis=1) * w) / n)

    evolving = rmse >= config.evolution_threshold
    uniform = (var[0] < config.variance_threshold) & (var[1] < config.variance_threshold)

    degen = jnp.where(~evolving & uniform, state.degenerate_count + 1, 0)
    steady = jnp.where(~evolving & ~uniform, state.steady_count + 1, 0)
    # Divergence surfaces through should_stop on the fused path too (the
    # reference panics on NaN outer residuals; step_host raises on the host).
    diverged = jnp.isnan(state.outer_residual_u) | \
        jnp.isnan(state.outer_residual_p)
    stop = state.should_stop | (degen > config.stop_count) \
        | (steady > config.stop_count) | diverged

    return replace(state, prev_u=u, degenerate_count=degen,
                   steady_count=steady, should_stop=stop)


@partial(jax.jit, static_argnames=("config",))
def step(mesh: DeviceMesh, state: SolverState, params: SolverParams,
         config: SolverConfig, amg=None, krylov=None) -> SolverState:
    """Advance one timestep (reference GpuSolver::step -> step_coupled).

    ``amg``: optional AmgHierarchy pytree (passed as a dynamic argument so its
    index arrays are jit inputs, not embedded constants) used when
    ``config.precond_type == PRECOND_AMG``.

    ``krylov``: with ``config.fgmres_recycle >= 2``, the previous step's
    Krylov basis tuple (or a zero seed) — the FIRST outer's solve then
    warm-starts from the previous step's final search space, and the step
    returns ``(state, krylov')`` instead of ``state``."""
    n_sweeps = config.pressure_sweeps(mesh.num_cells)

    # History rotation (coupled_solver.rs:43-71).
    state = replace(state, u_old_old=state.u_old, u_old=state.u)

    # Initial prepare pass (coupled_solver.rs:74-107).
    state = prepare(mesh, state, params, config)

    # Per-step frozen coarse AMG operators (banded path): Galerkin
    # re-coarsening is a segment-sum RAP costing 7.5 ms/outer at 130k cells
    # (tools/prof_refined_developed.py) — ~30% of a developed-state step.
    # Coarsen ONCE from the step-entry assembly; every outer's V-cycle uses
    # these level-1+ operators while level 0 (the smoother + residual, which
    # set the cycle's fixed point) tracks the current assembly.  FGMRES is
    # flexible, so preconditioner staleness never touches the solve contract.
    frozen_amg = None
    if (config.amg_freeze_coarse and amg is not None
            and config.precond_type == PRECOND_AMG):
        # Pressure-only entry assembly (assembly.assemble_pressure): the
        # freeze needs just (P_diag, P_off), not the full coupled assembly
        # the first outer will run anyway (advisor r4: the duplicated full
        # assembly cost one whole extra assembly per step and was a major
        # cold-compile contributor).
        if _use_stencil_path(mesh, config, amg):
            from ..ops import stencil_system as st
            from .assembly import assemble_pressure
            P_diag, P_off = assemble_pressure(mesh, state, params)
            ny, nx = mesh.grid_shape
            frozen_amg = st.coarse_level_values2_planes(
                amg, P_diag.reshape(ny, nx),
                jnp.moveaxis(P_off[:, :4], 1, 0).reshape(4, ny, nx))
        elif mesh.banded:
            from ..ops.amg import AmgHierarchy, coarse_level_values
            if isinstance(amg, AmgHierarchy):
                from .assembly import assemble_pressure
                P_diag, P_off = assemble_pressure(mesh, state, params)
                frozen_amg = coarse_level_values(amg, P_diag, P_off)

    max_iters = max(config.n_outer_correctors, 10)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    D = mesh.num_cells * 3
    aa_depth = config.anderson_depth
    aa_hist0 = jnp.zeros((aa_depth + 1, D), jnp.float32) if aa_depth else None

    # Krylov recycling across outer correctors (SolverConfig.fgmres_recycle):
    # the previous solve's basis rides the carry; outer 0 sees the zero seed
    # (its j=0 guard makes the warm start a no-op).
    kry0 = (_basis_init(mesh, state, config, amg)
            if config.fgmres_recycle else None)
    cross_step = (config.fgmres_recycle >= 2 and krylov is not None
                  and kry0 is not None)
    if cross_step:
        kry0 = krylov

    def cond(carry):
        (state, aa, prev_du, prev_dp, it, done, du_ok, dp_ref, li, lr,
         lt, kry) = carry
        return (it < max_iters) & ~done

    def body(carry):
        (state, aa, prev_du, prev_dp, it, done, du_ok, dp_ref, li, lr,
         lt, kry) = carry

        # Re-prepare on later iterations / higher-order schemes
        # (coupled_solver.rs:166-189).
        if config.scheme != SCHEME_UPWIND:
            state = prepare(mesh, state, params, config)
        else:
            state = lax.cond(it > 0,
                             lambda s: prepare(mesh, s, params, config),
                             lambda s: s, state)

        if config.adaptive_linear_tol:
            lin_tol = jnp.maximum(jnp.asarray(config.fgmres_tol, jnp.float32),
                                  10.0 ** (-(3.0 + it.astype(jnp.float32))))
        else:
            lin_tol = None
        x_guess = None
        if config.extrapolate_guess:
            # First outer only: temporal predictor (u_old == u here; the
            # last step's increment is u - u_old_old).
            beta = jnp.where(it == 0, params.dt /
                             jnp.maximum(params.dt_old, 1e-30), 0.0)
            u_g = state.u + beta * (state.u - state.u_old_old)
            x_guess = jnp.concatenate([u_g, state.p[:, None]], axis=1)
        result = _assemble_and_solve(mesh, state, params, config, amg,
                                     n_sweeps, lin_tol, x_guess=x_guess,
                                     presolve_ok=(it == 0),
                                     frozen_amg=frozen_amg, recycle=kry)
        if kry is not None and result.basis is not None:
            kry = result.basis

        # Under-relaxed field update + max-diff (update_fields_from_coupled.wgsl).
        alpha_u = params.alpha_u
        if config.alpha_u_final > 0:
            alpha_u = jnp.where(it >= config.alpha_ramp_after,
                                jnp.asarray(config.alpha_u_final, jnp.float32),
                                alpha_u)
        u_new = state.u + alpha_u * (result.x[:, 0:2] - state.u)
        p_new = state.p + params.alpha_p * (result.x[:, 2] - state.p)
        if aa_depth:
            g = jnp.concatenate([u_new, p_new[:, None]], axis=1).reshape(-1)
            x_cur = jnp.concatenate(
                [state.u, state.p[:, None]], axis=1).reshape(-1)
            x_next, Gh, Fh = _anderson_mix(g, x_cur, aa[0], aa[1], it, config)
            xn = x_next.reshape(-1, 3)
            u_new = xn[:, 0:2]
            p_new = xn[:, 2]
            aa = (Gh, Fh)
        diff_u = jnp.max(jnp.abs(u_new - state.u))
        diff_p = jnp.max(jnp.abs(p_new - state.p))
        state = replace(state, u=u_new, p=p_new,
                        outer_residual_u=diff_u, outer_residual_p=diff_p,
                        outer_iters=(it + 1).astype(jnp.int32))

        # Convergence + stagnation (coupled_solver.rs:396-479).
        converged = (diff_u < config.outer_tol_u) & (diff_p < config.outer_tol_p)
        rel_u = jnp.abs((diff_u - prev_du) / jnp.maximum(jnp.abs(prev_du), 1e-14))
        rel_p = jnp.abs((diff_p - prev_dp) / jnp.maximum(jnp.abs(prev_dp), 1e-14))
        stagnated = (rel_u < config.outer_stagnation_factor) & \
                    (rel_p < config.outer_stagnation_factor) & (it > 2)
        du_ok, dp_ref, plateau = _plateau_update(du_ok, dp_ref, diff_u,
                                                 diff_p, config)
        done = (converged & (it > 0)) | stagnated | plateau

        return (state, aa, diff_u, diff_p, it + 1, done, du_ok, dp_ref,
                result.iterations, result.residual,
                lt + result.iterations, kry)

    init = (state, (aa_hist0, aa_hist0) if aa_depth else (), big, big,
            jnp.int32(0), jnp.asarray(False), jnp.int32(0), big,
            jnp.int32(0), jnp.asarray(0.0, jnp.float32), jnp.int32(0), kry0)
    (state, _, _, _, it, _, _, _, li, lr, lt, kry_out) = lax.while_loop(
        cond, body, init)
    state = replace(state, time=state.time + params.dt,
                    linear_iters=li, linear_residual=lr,
                    linear_iters_total=lt)

    state = check_evolution(state, config, valid=mesh.c_valid)
    if cross_step:
        return state, kry_out
    return state


# ----------------------------------------------------------------------
# Host-driven variant: the outer corrector loop runs on the host with scalar
# readbacks per iteration — exactly the reference's control structure
# (coupled_solver.rs:123-486 with its async max-diff reads).  Device
# executions stay short (one outer iteration each), which matters for very
# large meshes; the fused :func:`step` remains the zero-round-trip default.


@partial(jax.jit, static_argnames=("config",))
def begin_step(mesh: DeviceMesh, state: SolverState, params: SolverParams,
               config: SolverConfig) -> SolverState:
    state = replace(state, u_old_old=state.u_old, u_old=state.u,
                    linear_iters_total=jnp.asarray(0, jnp.int32))
    return prepare(mesh, state, params, config)


@partial(jax.jit, static_argnames=("config", "do_prepare"))
def outer_iteration(mesh: DeviceMesh, state: SolverState,
                    params: SolverParams, config: SolverConfig,
                    amg=None, do_prepare: bool = True, lin_tol=None,
                    aa=None, it=0):
    """One outer corrector: (prepare) -> assemble -> solve -> update.
    Returns (state, diff_u, diff_p, aa); ``aa`` is the Anderson history pair
    (or None when config.anderson_depth == 0)."""
    n_sweeps = config.pressure_sweeps(mesh.num_cells)
    if do_prepare:
        state = prepare(mesh, state, params, config)
    x_guess = None
    if config.extrapolate_guess:
        beta = jnp.where(jnp.asarray(it) == 0,
                         params.dt / jnp.maximum(params.dt_old, 1e-30), 0.0)
        u_g = state.u + beta * (state.u - state.u_old_old)
        x_guess = jnp.concatenate([u_g, state.p[:, None]], axis=1)
    result = _assemble_and_solve(mesh, state, params, config, amg,
                                 n_sweeps, lin_tol, x_guess=x_guess)
    alpha_u = params.alpha_u
    if config.alpha_u_final > 0:
        alpha_u = jnp.where(jnp.asarray(it) >= config.alpha_ramp_after,
                            jnp.asarray(config.alpha_u_final, jnp.float32),
                            alpha_u)
    u_new = state.u + alpha_u * (result.x[:, 0:2] - state.u)
    p_new = state.p + params.alpha_p * (result.x[:, 2] - state.p)
    if config.anderson_depth and aa is not None:
        g = jnp.concatenate([u_new, p_new[:, None]], axis=1).reshape(-1)
        x_cur = jnp.concatenate(
            [state.u, state.p[:, None]], axis=1).reshape(-1)
        x_next, Gh, Fh = _anderson_mix(g, x_cur, aa[0], aa[1],
                                       jnp.asarray(it, jnp.int32), config)
        xn = x_next.reshape(-1, 3)
        u_new = xn[:, 0:2]
        p_new = xn[:, 2]
        aa = (Gh, Fh)
    diff_u = jnp.max(jnp.abs(u_new - state.u))
    diff_p = jnp.max(jnp.abs(p_new - state.p))
    state = replace(state, u=u_new, p=p_new,
                    outer_residual_u=diff_u, outer_residual_p=diff_p,
                    linear_iters=result.iterations,
                    linear_residual=result.residual,
                    linear_iters_total=(state.linear_iters_total
                                        + result.iterations))
    return state, diff_u, diff_p, aa


@partial(jax.jit, static_argnames=("config",))
def finish_step(mesh: DeviceMesh, state: SolverState, params: SolverParams,
                config: SolverConfig) -> SolverState:
    state = replace(state, time=state.time + params.dt)
    return check_evolution(state, config, valid=mesh.c_valid)


def step_host(mesh: DeviceMesh, state: SolverState, params: SolverParams,
              config: SolverConfig, amg=None,
              verbose: bool = False) -> SolverState:
    """Host-controlled timestep with per-outer-iteration convergence reads."""
    state = begin_step(mesh, state, params, config)
    max_iters = max(config.n_outer_correctors, 10)
    prev_du = prev_dp = float("inf")
    du_ok = 0
    dp_ref = float("inf")
    aa = None
    if config.anderson_depth:
        z = jnp.zeros((config.anderson_depth + 1, mesh.num_cells * 3),
                      jnp.float32)
        aa = (z, z)
    for it in range(max_iters):
        do_prep = it > 0 or config.scheme != SCHEME_UPWIND
        if config.adaptive_linear_tol:
            lin_tol = jnp.asarray(max(config.fgmres_tol, 10.0 ** -(3 + it)),
                                  jnp.float32)
        else:
            lin_tol = None
        state, du, dp, aa = outer_iteration(mesh, state, params, config, amg,
                                            do_prepare=do_prep,
                                            lin_tol=lin_tol, aa=aa, it=it)
        du = float(du)
        dp = float(dp)
        if verbose:
            print(f"  outer {it}: du={du:.2e} dp={dp:.2e} "
                  f"lin_it={int(state.linear_iters)} "
                  f"lin_res={float(state.linear_residual):.2e}")
        state = replace(state, outer_iters=jnp.asarray(it + 1, jnp.int32))
        if np.isnan(du) or np.isnan(dp):
            raise FloatingPointError(
                f"coupled solver diverged: NaN outer residuals at iter {it}")
        if it > 0 and du < config.outer_tol_u and dp < config.outer_tol_p:
            break
        rel_u = abs(du - prev_du) / max(abs(prev_du), 1e-14)
        rel_p = abs(dp - prev_dp) / max(abs(prev_dp), 1e-14)
        if it > 2 and rel_u < config.outer_stagnation_factor \
                and rel_p < config.outer_stagnation_factor:
            break
        # Mirror of the fused path's pressure-stall gate (see step()).
        if du_ok == 0:
            dp_ref = dp
        du_ok = du_ok + 1 if du < 2.0 * config.outer_tol_u else 0
        if config.outer_pressure_patience > 0 \
                and du_ok >= config.outer_pressure_patience:
            if dp > 0.5 * dp_ref:
                break
            du_ok = 0
        prev_du, prev_dp = du, dp
    return finish_step(mesh, state, params, config)


@partial(jax.jit, static_argnames=("config", "num_steps"))
def multi_step(mesh: DeviceMesh, state: SolverState, params: SolverParams,
               config: SolverConfig, num_steps: int, amg=None):
    """Run N steps under one lax.scan — the zero-host-round-trip time loop.

    Returns (final_state, per-step metrics dict).
    """
    def body(carry, _):
        state, params = carry
        # Freeze once stopped (degenerate/steady/diverged): remaining scanned
        # steps become no-ops instead of burning full solves on NaN fields.
        state = lax.cond(state.should_stop,
                         lambda s: s,
                         lambda s: step(mesh, s, params, config, amg), state)
        metrics = {
            "time": state.time,
            "outer_iters": state.outer_iters,
            "linear_iters": state.linear_iters,
            "linear_iters_total": state.linear_iters_total,
            "linear_residual": state.linear_residual,
            "outer_residual_u": state.outer_residual_u,
            "max_vel": jnp.max(jnp.linalg.norm(state.u, axis=1)),
            "should_stop": state.should_stop,
        }
        # dt_old tracks the step actually taken so BDF2's variable-step
        # ratio r = dt/dt_old returns to 1 after a set_dt change (holding
        # r at its first-step value is zero-UNstable for r > 1+sqrt(2)).
        params = replace(params, dt_old=params.dt)
        return (state, params), metrics

    (state, params), metrics = lax.scan(body, (state, params), None,
                                        length=num_steps)
    return state, metrics


@partial(jax.jit, static_argnames=("config", "num_steps", "target_cfl"))
def multi_step_adaptive(mesh: DeviceMesh, state: SolverState,
                        params: SolverParams, config: SolverConfig,
                        num_steps: int, target_cfl: float = 0.5,
                        min_cell_size: float = 0.05, amg=None):
    """N adaptive-dt steps under lax.scan: the on-device equivalent of the
    reference app's host-side CFL controller (ui/app.rs:878-909)."""
    def body(carry, _):
        state, params = carry
        max_vel = jnp.max(jnp.linalg.norm(state.u, axis=1))
        new_dt = jnp.clip(target_cfl * min_cell_size / jnp.maximum(max_vel, 1e-6),
                          1e-5, 0.1)
        new_dt = jnp.minimum(new_dt, params.dt * 1.2)   # growth limit
        new_dt = jnp.where(max_vel > 1e-6, new_dt, params.dt)
        params = replace(params, dt_old=params.dt, dt=new_dt)
        state = lax.cond(state.should_stop,
                         lambda s: s,
                         lambda s: step(mesh, s, params, config, amg), state)
        metrics = {"time": state.time, "dt": params.dt, "max_vel": max_vel,
                   "outer_iters": state.outer_iters,
                   "should_stop": state.should_stop}
        return (state, params), metrics

    (state, params), metrics = lax.scan(body, (state, params), None,
                                        length=num_steps)
    return state, params, metrics


def _arg_fingerprint(tree) -> tuple:
    """Shape/dtype/structure fingerprint of a pytree — detects mesh swaps,
    inlet-profile changes, and amg rebuilds without setter hooks."""
    leaves, treedef = jax.tree.flatten(tree)
    return (treedef, tuple((l.shape, str(l.dtype)) for l in leaves))


@jax.jit
def _max_vel_device(u: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.linalg.norm(u, axis=1))


class CoupledSolver:
    """Host-side façade with the reference's headless API contract.

    Reference usage (SURVEY.md §3.5):
        GpuSolver::new(&mesh, None, None) -> set_* -> set_u/set_p
        -> initialize_history -> loop { step(); get_u()/get_p() }
    """

    def __init__(self, mesh, config: SolverConfig | None = None,
                 params: SolverParams | None = None,
                 pad_rows_to: int = 1, pad_cols_to: int = 1):
        self.host_mesh = mesh
        self.mesh = encode_mesh(mesh, pad_rows_to=pad_rows_to,
                                pad_cols_to=pad_cols_to)
        self.config = config or SolverConfig()
        self.params = params or SolverParams.default()
        self.state = initial_state(self.mesh)
        self._amg = None
        self._krylov = None   # cross-step recycling (fgmres_recycle >= 2)
        self._aot = {}

    # --- setters (reference solver.rs:36-95) ---
    def set_dt(self, dt):
        self.params = replace(self.params, dt_old=self.params.dt,
                              dt=jnp.asarray(dt, jnp.float32))

    def set_viscosity(self, v):
        self.params = replace(self.params, viscosity=jnp.asarray(v, jnp.float32))

    def set_density(self, d):
        self.params = replace(self.params, density=jnp.asarray(d, jnp.float32))

    def set_alpha_u(self, a):
        self.params = replace(self.params, alpha_u=jnp.asarray(a, jnp.float32))

    def set_alpha_p(self, a):
        self.params = replace(self.params, alpha_p=jnp.asarray(a, jnp.float32))

    def set_inlet_velocity(self, v):
        self.params = replace(self.params, inlet_velocity=jnp.asarray(v, jnp.float32))

    def set_ramp_time(self, t):
        self.params = replace(self.params, ramp_time=jnp.asarray(t, jnp.float32))

    def set_inlet_profile(self, fn):
        """Per-face inlet profile: u_inlet(face) = inlet_velocity * fn(x, y).

        ``fn`` maps face-center coordinate arrays to a scale (e.g. the
        Schäfer–Turek parabolic 4 y (H - y) / H^2 normalized to its mean).
        The reference supports only a uniform inlet (structs.rs:86-101);
        standard validation benchmarks need this.  Pass ``None`` to clear.
        Changes the mesh pytree structure, so the next step retraces."""
        if fn is None:
            self.mesh = replace(self.mesh, f_inlet_scale=None,
                                ck_inlet_scale=None)
            return
        fx = np.asarray(self.mesh.f_cx)
        fy = np.asarray(self.mesh.f_cy)
        scale = np.asarray(fn(fx, fy), np.float32)
        ckf = np.asarray(self.mesh.ck_face)
        self.mesh = replace(self.mesh,
                            f_inlet_scale=jnp.asarray(scale),
                            ck_inlet_scale=jnp.asarray(scale[ckf]))

    def set_scheme(self, scheme: int):
        self.config = replace(self.config, scheme=int(scheme))

    def set_time_scheme(self, ts: int):
        self.config = replace(self.config, time_scheme=int(ts))

    def set_precond_type(self, pt: int):
        self.config = replace(self.config, precond_type=int(pt))

    def set_n_outer_correctors(self, n: int):
        """Reference GpuSolver.n_outer_correctors (init/mod.rs:144)."""
        self.config = replace(self.config, n_outer_correctors=int(n))

    # --- field IO (solver.rs:97-128, 241-294); host-mesh cell order ---
    def set_u(self, u):
        u = jnp.asarray(np.asarray(u, dtype=np.float32).reshape(-1, 2))
        u = self.mesh.from_host_order(u)
        self.state = replace(self.state, u=u, u_old=u, u_old_old=u, prev_u=u)

    def set_p(self, p):
        p = self.mesh.from_host_order(jnp.asarray(p, jnp.float32))
        self.state = replace(self.state, p=p)

    def initialize_history(self):
        self.state = replace(self.state, u_old=self.state.u,
                             u_old_old=self.state.u, prev_u=self.state.u)

    def get_u(self) -> np.ndarray:
        return np.asarray(self.mesh.to_host_order(self.state.u))

    def max_velocity_device(self):
        """On-device max |u| as an *unfetched* scalar array.  Pairs with
        runtime.async_reader.AsyncFieldReader so host loops (adaptive dt,
        live stats) overlap the 4-byte readback with the next step instead
        of pulling the full field (reference async_buffer.rs:11-248)."""
        return _max_vel_device(self.state.u)

    def get_p(self) -> np.ndarray:
        return np.asarray(self.mesh.to_host_order(self.state.p))

    def get_d_p(self) -> np.ndarray:
        return np.asarray(self.mesh.to_host_order(self.state.d_p))

    # --- stepping ---
    def _get_amg(self):
        if self.config.precond_type != PRECOND_AMG:
            return None
        if self._amg is None:
            from ..ops.amg import build_hierarchy_for_mesh
            self._amg = build_hierarchy_for_mesh(
                self.mesh, agg_passes=self.config.amg_agg_passes)
        return self._amg

    def step(self, mode: str = "fused"):
        """Advance one timestep.  ``mode="fused"`` (default): the whole step
        is one device execution with zero host round-trips.  ``mode="host"``:
        the outer loop runs on the host with per-iteration convergence reads
        (the reference's control structure; shorter device executions)."""
        if mode == "host":
            self.state = step_host(self.mesh, self.state, self.params,
                                   self.config, self._get_amg())
        elif self.config.fgmres_recycle >= 2:
            # Cross-step Krylov recycling: the basis tuple shuttles between
            # steps outside SolverState (1.2 GB at 1M cells — not a
            # checkpointable quantity).
            amg = self._get_amg()
            if self._krylov is None:
                self._krylov = _basis_init(self.mesh, self.state, self.config,
                                           amg)
            if self._krylov is None:
                # Generic block path: recycling unsupported (basis shapes
                # undefined there); step() then returns state alone.
                self.state = step(self.mesh, self.state, self.params,
                                  self.config, amg)
            elif os.environ.get("CFD2_AOT_CACHE"):
                fp = (self.config, _arg_fingerprint(
                    (self.mesh, self.state, self.params, amg, self._krylov)))
                c = self._aot.get(fp)
                if c is None:
                    from ..runtime.aot_cache import cached_compile
                    c = cached_compile(step, self.mesh, self.state,
                                       self.params, self.config, amg,
                                       self._krylov)
                    self._aot[fp] = c
                self.state, self._krylov = c(self.mesh, self.state,
                                             self.params, amg, self._krylov)
            else:
                self.state, self._krylov = step(
                    self.mesh, self.state, self.params, self.config,
                    amg, self._krylov)
        elif os.environ.get("CFD2_AOT_CACHE"):
            # Executable-level persistence: Mosaic kernel compiles survive
            # across processes (runtime/aot_cache.py).  One lowering per
            # (config, arg-structure); steps then call the Compiled directly.
            amg = self._get_amg()
            fp = (self.config, _arg_fingerprint(
                (self.mesh, self.state, self.params, amg)))
            c = self._aot.get(fp)
            if c is None:
                from ..runtime.aot_cache import cached_compile
                c = cached_compile(step, self.mesh, self.state, self.params,
                                   self.config, amg)
                self._aot[fp] = c
            self.state = c(self.mesh, self.state, self.params, amg)
        else:
            self.state = step(self.mesh, self.state, self.params, self.config,
                              self._get_amg())
        # The step just taken becomes the BDF2 history step: without this
        # rotation a single set_dt change pins r = dt/dt_old at its
        # first-step value forever, and BDF2 is zero-UNstable for
        # r > 1+sqrt(2) (exponential blowup from round-off fields).
        if self.params.dt_old is not self.params.dt:
            self.params = replace(self.params, dt_old=self.params.dt)

    def run(self, num_steps: int):
        """Run N steps in one scan; returns per-step metrics (host arrays)."""
        self.state, metrics = multi_step(self.mesh, self.state, self.params,
                                         self.config, num_steps,
                                         self._get_amg())
        if num_steps > 0:   # scan rotated dt_old internally; mirror it
            self.params = replace(self.params, dt_old=self.params.dt)
        return jax.tree.map(np.asarray, metrics)

    # --- checkpoint/resume (new capability; runtime/checkpoint.py) ---
    def save_checkpoint(self, path: str):
        from ..runtime.checkpoint import save_checkpoint
        save_checkpoint(path, self.state, self.params)

    def load_checkpoint(self, path: str):
        from ..runtime.checkpoint import load_checkpoint
        state, params = load_checkpoint(path)
        self.state = state
        if params is not None:
            self.params = params

    # --- status (reference structs.rs should_stop / counters) ---
    @property
    def should_stop(self) -> bool:
        return bool(self.state.should_stop)

    @property
    def degenerate_count(self) -> int:
        return int(self.state.degenerate_count)

    @property
    def steady_state_count(self) -> int:
        return int(self.state.steady_count)
