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
