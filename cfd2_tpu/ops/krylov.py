"""CG and BiCGStab for the scalar pressure system, fully on-device.

Parity with the reference's alternate linear-solver path
(shaders/linear_solver.wgsl:50-200 + scalars.wgsl — SpMV kernels with the
alpha/beta/omega recurrences computed on-GPU).  Here each solver is one
``lax.while_loop`` whose scalar recurrences live in the carry; there are no
host round-trips, matching the reference's "fully-on-GPU scalar" design.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


@jax.tree_util.register_dataclass
@dataclass
class KrylovResult:
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual: jnp.ndarray
    converged: jnp.ndarray


def _dot(a, b):
    return jnp.sum(a * b)


def cg_solve(matvec: Callable, b: jnp.ndarray, x0: jnp.ndarray,
             precond: Callable | None = None,
             max_iters: int = 1000, tol: float = 1e-6,
             abstol: float = 1e-12) -> KrylovResult:
    """Preconditioned conjugate gradients (SPD systems)."""
    M = precond if precond is not None else (lambda r: r)
    bnorm = jnp.sqrt(_dot(b, b))
    target = jnp.maximum(tol * bnorm, abstol)

    r = b - matvec(x0)
    z = M(r)
    p = z
    rz = _dot(r, z)

    def cond(c):
        x, r, z, p, rz, it = c
        return (jnp.sqrt(_dot(r, r)) > target) & (it < max_iters)

    def body(c):
        x, r, z, p, rz, it = c
        Ap = matvec(p)
        alpha = rz / jnp.maximum(_dot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    x, r, z, p, rz, it = lax.while_loop(
        cond, body, (x0, r, z, p, rz, jnp.int32(0)))
    rn = jnp.sqrt(_dot(r, r))
    return KrylovResult(x=x, iterations=it, residual=rn,
                        converged=rn <= target)


def bicgstab_solve(matvec: Callable, b: jnp.ndarray, x0: jnp.ndarray,
                   precond: Callable | None = None,
                   max_iters: int = 1000, tol: float = 1e-6,
                   abstol: float = 1e-12) -> KrylovResult:
    """Preconditioned BiCGStab (general nonsymmetric systems), the
    reference's spmv_p_v/spmv_s_t recurrence structure
    (linear_solver.wgsl:50-200)."""
    M = precond if precond is not None else (lambda r: r)
    bnorm = jnp.sqrt(_dot(b, b))
    target = jnp.maximum(tol * bnorm, abstol)

    r = b - matvec(x0)
    r_hat = r
    rho = _dot(r_hat, r)
    p = r

    def cond(c):
        x, r, p, rho, it, brk = c
        return (jnp.sqrt(_dot(r, r)) > target) & (it < max_iters) & ~brk

    def body(c):
        x, r, p, rho, it, brk = c
        p_hat = M(p)
        v = matvec(p_hat)
        denom = _dot(r_hat, v)
        alpha = rho / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        s = r - alpha * v
        s_hat = M(s)
        t = matvec(s_hat)
        tt = _dot(t, t)
        omega = _dot(t, s) / jnp.where(tt > 1e-30, tt, 1e-30)
        x = x + alpha * p_hat + omega * s_hat
        r = s - omega * t
        rho_new = _dot(r_hat, r)
        beta = (rho_new / jnp.where(jnp.abs(rho) > 1e-30, rho, 1e-30)) \
            * (alpha / jnp.where(jnp.abs(omega) > 1e-30, omega, 1e-30))
        p = r + beta * (p - omega * v)
        # Breakdown guard.
        brk = (jnp.abs(rho_new) < 1e-30) | (jnp.abs(omega) < 1e-30)
        return x, r, p, rho_new, it + 1, brk

    x, r, p, rho, it, brk = lax.while_loop(
        cond, body, (x0, r, p, rho, jnp.int32(0), jnp.asarray(False)))
    rn = jnp.sqrt(_dot(r, r))
    return KrylovResult(x=x, iterations=it, residual=rn,
                        converged=rn <= target)
