"""Segregated pressure-Poisson assembly (SIMPLE-style corrector path).

Parity with the reference's segregated leftover kernel
(shaders/pressure_assembly.wgsl:56-210): scalar pressure-correction system
with RHS = -sum(mass fluxes) and a magnitude-limited, 0.5-under-relaxed
non-orthogonal correction from the stored pressure gradients.  The coupled
solver path (models/coupled.py) supersedes this — like in the reference —
but it completes the segregated SIMPLE capability and is exercised by tests.

Boundary conditions: outlet Dirichlet p=0; inlet/wall Neumann (zero flux).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..runtime.device_mesh import DeviceMesh
from ..runtime.state import SolverParams, SolverState


def assemble_pressure_poisson(mesh: DeviceMesh, state: SolverState,
                              params: SolverParams):
    """Returns (P_diag (N,), P_off (N,K), rhs (N,)) for the pressure
    correction equation."""
    mask = mesh.ck_mask
    is_b = mesh.ck_is_boundary
    internal = mask * (1.0 - is_b)
    bdry = mesh.ck_boundary

    flux_out = mesh.slot_fluxes(state.fluxes)          # (N, K) outward
    rhs = -jnp.sum(flux_out * mask, axis=1)

    # Laplacian coefficients: rho * d_p_face * A / |d| (plain distance,
    # pressure_assembly.wgsl:120-127).
    dp_this = state.d_p[:, None]
    dp_other = mesh.gather(state.d_p)
    lam = mesh.ck_lam
    dp_face = lam * dp_this + (1.0 - lam) * dp_other
    coeff = params.density * dp_face * mesh.ck_area / mesh.ck_dist
    P_off = -coeff * internal
    diag = jnp.sum(coeff * internal, axis=1)

    # Non-orthogonal correction (pressure_assembly.wgsl:146-189):
    # k = S - d * (A/|d|), clamped to |k| <= A/2; correction flux =
    # 0.5 * rho * dp_face * (grad_p_face . k), subtracted from the RHS.
    s_x = mesh.ck_nx * mesh.ck_area
    s_y = mesh.ck_ny * mesh.ck_area
    dvx = mesh.ck_dcdx
    dvy = mesh.ck_dcdy
    a_over_d = mesh.ck_area / mesh.ck_dist
    k_x = s_x - dvx * a_over_d
    k_y = s_y - dvy * a_over_d
    k_mag = jnp.sqrt(k_x * k_x + k_y * k_y)
    k_lim = 0.5 * mesh.ck_area
    scale = jnp.where(k_mag > k_lim, k_lim / jnp.maximum(k_mag, 1e-30), 1.0)
    k_x = k_x * scale
    k_y = k_y * scale

    gp_this = state.grad_p[:, None, :]
    gp_other = mesh.gather(state.grad_p)
    # Weight toward the neighbor by d_own/total (wgsl:174-182) = 1 - ck_lam.
    w = 1.0 - lam
    gp_f_x = gp_this[..., 0] + w * (gp_other[..., 0] - gp_this[..., 0])
    gp_f_y = gp_this[..., 1] + w * (gp_other[..., 1] - gp_this[..., 1])
    corr = 0.5 * params.density * dp_face * (gp_f_x * k_x + gp_f_y * k_y)
    rhs = rhs - jnp.sum(corr * internal, axis=1)

    # Outlet Dirichlet (wgsl:191-201): coeff from cell center to face center.
    is_outlet = (is_b > 0) & (bdry == 2)
    coeff_out = params.density * dp_this * mesh.ck_area / mesh.ck_dist
    diag = diag + jnp.sum(jnp.where(is_outlet, coeff_out, 0.0), axis=1)

    # Masked solid cells: identity rows.
    diag = jnp.where(mesh.c_valid > 0, diag, 1.0)
    rhs = rhs * mesh.c_valid
    return diag, P_off, rhs


# ----------------------------------------------------------------------
# Segregated SIMPLE stepper — a full predictor/corrector loop around the
# pressure-correction assembly above.  The reference kept only the assembly
# kernel of its segregated path (pressure_assembly.wgsl) after moving to the
# coupled solver; this completes the classical SIMPLE capability
# (BASELINE.json config: "Lid-driven cavity Re=100, SIMPLE
# pressure-correction + AMG Poisson solve"):
#
#   1. momentum predictor: solve A_uu u* = b_u - G p (BiCGStab, the momentum
#      block of the coupled assembly with the current-pressure gradient
#      moved to the RHS);
#   2. pressure correction: P p' = -div(flux(u*)) via assemble_pressure_
#      poisson + CG;
#   3. correct u -= d_p grad p' (Green-Gauss), p += alpha_p p'.


def _green_gauss_scalar(mesh: DeviceMesh, s: jnp.ndarray,
                        outlet_dirichlet: bool = True) -> jnp.ndarray:
    """Green-Gauss gradient of a cell scalar; outlet faces read 0 (the
    pressure-correction BC), other boundaries zero-normal-gradient."""
    mask = mesh.ck_mask
    is_b = mesh.ck_is_boundary
    bdry = mesh.ck_boundary
    lam = mesh.ck_lam
    s_this = s[:, None]
    s_other = mesh.gather(s)
    f_internal = lam * s_this + (1.0 - lam) * s_other
    f_bdry = jnp.where((bdry == 2) & outlet_dirichlet, 0.0, s_this)
    s_face = jnp.where(is_b > 0, f_bdry, f_internal) * mask
    inv_vol = 1.0 / mesh.c_vol
    return jnp.stack([
        jnp.sum(s_face * mesh.ck_nx * mesh.ck_area, axis=1) * inv_vol,
        jnp.sum(s_face * mesh.ck_ny * mesh.ck_area, axis=1) * inv_vol,
    ], axis=1)


def simple_step(mesh: DeviceMesh, state: SolverState, params: SolverParams,
                config, n_correctors: int = 2,
                mom_tol: float = 1e-6, p_tol: float = 1e-6):
    """One segregated SIMPLE timestep; returns the advanced state.

    Jit-friendly (python loop over a static corrector count); reuses the
    coupled assembly's momentum block so the discretization (upwind/deferred
    correction, BCs, time scheme) is identical to the coupled path.
    """
    from dataclasses import replace

    from ..ops.krylov import bicgstab_solve, cg_solve
    from .assembly import assemble_coupled, prepare

    state = replace(state, u_old_old=state.u_old, u_old=state.u,
                    linear_iters_total=jnp.asarray(0, jnp.int32))

    for _ in range(n_correctors):
        state = prepare(mesh, state, params, config)
        sys = assemble_coupled(mesh, state, params, config)

        # 1. Momentum predictor.
        p_g = mesh.gather(state.p)
        b_u = sys.rhs[:, 0] - (sys.A_diag[:, 0, 2] * state.p
                               + jnp.sum(sys.A_off[:, :, 0, 2] * p_g, axis=1))
        b_v = sys.rhs[:, 1] - (sys.A_diag[:, 1, 2] * state.p
                               + jnp.sum(sys.A_off[:, :, 1, 2] * p_g, axis=1))

        def mv_mom(x):
            return sys.A_diag[:, 0, 0] * x + \
                jnp.sum(sys.A_off[:, :, 0, 0] * mesh.gather(x), axis=1)

        d_inv = sys.diag_u_inv
        ru = bicgstab_solve(mv_mom, b_u, state.u[:, 0],
                            precond=lambda r: d_inv * r,
                            max_iters=200, tol=mom_tol)
        rv = bicgstab_solve(mv_mom, b_v, state.u[:, 1],
                            precond=lambda r: d_inv * r,
                            max_iters=200, tol=mom_tol)
        u_star = jnp.stack([ru.x, rv.x], axis=1)

        # Under-relax the predictor like classical SIMPLE.
        u_star = state.u + params.alpha_u * (u_star - state.u)

        # 2. Pressure correction from the predictor's fluxes.
        state_star = prepare(mesh, replace(state, u=u_star), params, config)
        diag, P_off, rhs = assemble_pressure_poisson(mesh, state_star, params)

        def mv_p(x):
            return diag * x + jnp.sum(P_off * mesh.gather(x), axis=1)

        p_inv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 0.0)
        rp = cg_solve(mv_p, rhs, jnp.zeros_like(rhs),
                      precond=lambda r: p_inv * r,
                      max_iters=500, tol=p_tol)
        p_corr = rp.x * mesh.c_valid

        # 3. Correct fields.
        gp_corr = _green_gauss_scalar(mesh, p_corr)
        u_new = u_star - state_star.d_p[:, None] * gp_corr
        p_new = state.p + params.alpha_p * p_corr

        diff_u = jnp.max(jnp.abs(u_new - state.u))
        diff_p = jnp.max(jnp.abs(params.alpha_p * p_corr))
        state = replace(state_star, u=u_new, p=p_new,
                        outer_residual_u=diff_u, outer_residual_p=diff_p,
                        linear_iters=ru.iterations + rv.iterations
                        + rp.iterations,
                        linear_residual=rp.residual,
                        linear_iters_total=(state.linear_iters_total
                                            + ru.iterations + rv.iterations
                                            + rp.iterations))

    from .coupled import check_evolution
    state = replace(state, time=state.time + params.dt,
                    outer_iters=jnp.asarray(n_correctors, jnp.int32))
    return check_evolution(state, config, valid=mesh.c_valid)
