"""SIMPLE/Schur-complement preconditioner for the coupled system.

M^{-1} approximating  [A  G; D  C]^{-1}  via (reference schur_precond.wgsl:1-188):

  1. predict velocity:   z_u = D_u^{-1} r_u
  2. form Schur RHS:     r_p' = r_p - D z_u
  3. solve pressure:     A_p z_p ~= r_p'  (Chebyshev/Jacobi sweeps or AMG V-cycle)
  4. correct velocity:   z_u -= D_u^{-1} G z_p

Everything is expressed on the padded (N, K) slot structure; the pressure
relaxation is a `lax.fori_loop` of fused gather+elementwise sweeps — the
reference's 20..200 ping-pong dispatches collapse into one jitted loop with
no per-sweep launch overhead.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .blockell import BlockSystem


def chebyshev_pressure_solve(sys: BlockSystem, mesh, rhs_p: jnp.ndarray,
                             omega: float, n_sweeps: int) -> jnp.ndarray:
    """Damped-Jacobi / Chebyshev-style two-term relaxation of A_p x = rhs_p.

    x_{k+1} = (1-omega) x_{k-1} + omega * D^{-1}(rhs - R x_k), x_{-1} = 0,
    x_0 = D^{-1} rhs (reference schur_precond.wgsl:49-90,183-187).
    """
    x0 = sys.diag_p_inv * rhs_p
    x_prev = jnp.zeros_like(rhs_p)

    def sweep(_, carry):
        x_prev, x_cur = carry
        sigma = jnp.sum(sys.P_off * mesh.gather(x_cur), axis=1)
        hat = sys.diag_p_inv * (rhs_p - sigma)
        x_new = x_prev + omega * (hat - x_prev)
        return (x_cur, x_new)

    _, x = lax.fori_loop(0, n_sweeps, sweep, (x_prev, x0))
    return x


def block_jacobi_preconditioner(sys: BlockSystem, r: jnp.ndarray) -> jnp.ndarray:
    """Alternative preconditioner: per-cell 3x3 diagonal-block inverse
    (reference shaders/preconditioner.wgsl:106-224 — the block-Jacobi path
    used by the BiCGStab-style flow).  z_i = (A_ii)^{-1} r_i, batched."""
    return jnp.linalg.solve(sys.A_diag, r[..., None])[..., 0]


def _momentum_solve(sys: BlockSystem, mesh, r_u, r_v, sweeps: int):
    """Approximate momentum-block inverse: Jacobi iteration seeded with the
    diagonal predict.  ``sweeps=1`` matches the reference's bare diagonal
    (schur_precond.wgsl:149-156)."""
    z_u = sys.diag_u_inv * r_u
    z_v = sys.diag_v_inv * r_v
    for _ in range(sweeps - 1):
        z_u = sys.diag_u_inv * (
            r_u - jnp.sum(sys.A_off[:, :, 0, 0] * mesh.gather(z_u), axis=1))
        z_v = sys.diag_v_inv * (
            r_v - jnp.sum(sys.A_off[:, :, 1, 1] * mesh.gather(z_v), axis=1))
    return z_u, z_v


def schur_preconditioner(sys: BlockSystem, mesh, r: jnp.ndarray,
                         omega: float, n_sweeps: int,
                         pressure_solve=None, mom_sweeps: int = 1) -> jnp.ndarray:
    """Apply M^{-1} to a residual r of shape (N, 3); returns z of shape (N, 3).

    ``pressure_solve`` overrides step 3 (e.g. with an AMG V-cycle); it takes
    (rhs_p) and returns z_p.
    """
    r_u = r[:, 0]
    r_v = r[:, 1]
    r_p = r[:, 2]

    # 1. Predict velocity (schur_precond.wgsl:149-156).
    z_u, z_v = _momentum_solve(sys, mesh, r_u, r_v, mom_sweeps)

    # 2. Schur RHS: r_p' = r_p - D z_u using the pressure rows of the coupled
    #    blocks (schur_precond.wgsl:158-181).  Note the reference computes the
    #    neighbor contribution from r (not the updated z), which is identical
    #    since z = D^{-1} r elementwise.
    zg_u = mesh.gather(z_u)                      # (N, K)
    zg_v = mesh.gather(z_v)
    rhs_p = r_p \
        - sys.A_diag[:, 2, 0] * z_u - sys.A_diag[:, 2, 1] * z_v \
        - jnp.sum(sys.A_off[:, :, 2, 0] * zg_u
                  + sys.A_off[:, :, 2, 1] * zg_v, axis=1)

    # 3. Pressure solve.
    if pressure_solve is None:
        z_p = chebyshev_pressure_solve(sys, mesh, rhs_p, omega, n_sweeps)
    else:
        z_p = pressure_solve(rhs_p)

    # 4. Correct velocity with the gradient blocks G (schur_precond.wgsl:92-139).
    zg_p = mesh.gather(z_p)                      # (N, K)
    g_u = sys.A_diag[:, 0, 2] * z_p + jnp.sum(sys.A_off[:, :, 0, 2] * zg_p, axis=1)
    g_v = sys.A_diag[:, 1, 2] * z_p + jnp.sum(sys.A_off[:, :, 1, 2] * zg_p, axis=1)
    gz_u, gz_v = _momentum_solve(sys, mesh, g_u, g_v, mom_sweeps)
    z_u = z_u - gz_u
    z_v = z_v - gz_v

    return jnp.stack([z_u, z_v, z_p], axis=1)
