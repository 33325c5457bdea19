"""Scalar-coefficient coupled system for the banded (unstructured) path.

The block-ELL container stores the coupled system as (N, K, 3, 3) blocks;
only 6 of the 9 entries are structurally nonzero, and the 3x3 minor dims
tile-pad on TPU, so the block SpMV reads ~10x the useful bytes (measured
1.27 ms at 145k cells vs ~0.1 ms of real traffic).  This container keeps
the per-slot scalar coefficient arrays the assembly already produces
(models/assembly.py:_assemble_parts) — the unstructured twin of
ops/stencil_system.py:

    [ A_uu   0     G_u ]   off_mom, off_up
    [ 0      A_vv  G_v ]   off_mom, off_vp
    [ D_u    D_v   C   ]   off_pu, off_pv, off_pp

Neighbor access goes through ``mesh.gather`` (the banded Pallas kernel);
the multi-component form gathers u, v, p in one kernel call sharing the
index-plane reads.  Duck-types ``P_diag``/``P_off``/``diag_p_inv`` so
ops/amg.make_pressure_solve works unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class EllSystem:
    # (N, K) per-slot off-diagonal coefficients
    off_mom: jnp.ndarray
    off_up: jnp.ndarray
    off_vp: jnp.ndarray
    off_pu: jnp.ndarray
    off_pv: jnp.ndarray
    off_pp: jnp.ndarray
    P_off: jnp.ndarray
    # (N,) diagonals
    diag_u: jnp.ndarray
    diag_up: jnp.ndarray
    diag_vp: jnp.ndarray
    diag_pu: jnp.ndarray
    diag_pv: jnp.ndarray
    diag_pp: jnp.ndarray
    P_diag: jnp.ndarray
    diag_u_inv: jnp.ndarray
    diag_p_inv: jnp.ndarray
    rhs: jnp.ndarray             # (N, 3)
    # Pre-blocked (NB, K, LANES) twins of the off planes (banded meshes
    # only): the banded kernel's native layout, built ONCE per assembly so
    # per-FGMRES-iteration dots skip the (N, K) -> (NB, K, LANES) minor-dims
    # relayout (which measured as a dominant per-iteration cost).  The flat
    # (N, K) planes above stay for the XLA-gather fallback and for AMG's
    # Galerkin coarsening (segment_sum over row-major flat order); XLA dead-
    # code-eliminates whichever form a given jit never reads.
    off_momB: jnp.ndarray | None = None
    off_upB: jnp.ndarray | None = None
    off_vpB: jnp.ndarray | None = None
    off_puB: jnp.ndarray | None = None
    off_pvB: jnp.ndarray | None = None
    off_ppB: jnp.ndarray | None = None
    P_offB: jnp.ndarray | None = None


def with_blocked(es: EllSystem, mesh) -> EllSystem:
    """Attach the pre-blocked coefficient planes for a banded mesh."""
    if not mesh.banded:
        return es
    from .banded_gather import to_blocked
    n = mesh.num_cells
    return replace(
        es,
        off_momB=to_blocked(es.off_mom, n), off_upB=to_blocked(es.off_up, n),
        off_vpB=to_blocked(es.off_vp, n), off_puB=to_blocked(es.off_pu, n),
        off_pvB=to_blocked(es.off_pv, n), off_ppB=to_blocked(es.off_pp, n),
        P_offB=to_blocked(es.P_off, n))


def _dotK(off, g):
    return jnp.sum(off * g, axis=1)


def spmv(es: EllSystem, mesh, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x, x (3, N) component-major; one fused banded-dot kernel shares
    the u/v/p neighbor reads and never materializes the (N, K, 3) gather.

    Component-major (3, N) is load-bearing for speed, not taste: an (N, 3)
    vector tile-pads its 3-wide lane dim 42x on TPU, so every solver-loop
    op on the interleaved form relayouts — the bare FGMRES loop measured
    3.1 ms/iter on flattened (N,3) vs 0.65 ms/iter on (3,N) at 403k."""
    xu, xv, xp = x[0], x[1], x[2]
    du, dv, dp_ = (es.diag_u * xu + es.diag_up * xp,
                   es.diag_u * xv + es.diag_vp * xp,
                   es.diag_pu * xu + es.diag_pv * xv + es.diag_pp * xp)
    if mesh.banded:
        su, sv, sp = mesh.banded_dot(
            (xu, xv, xp),
            (es.off_momB, es.off_upB, es.off_vpB,
             es.off_puB, es.off_pvB, es.off_ppB),
            (((0, 0), (1, 2)),            # A_uu gu + G_u gp
             ((0, 1), (2, 2)),            # A_vv gv + G_v gp
             ((3, 0), (4, 1), (5, 2))))   # D_u gu + D_v gv + C gp
    else:
        g = mesh.gather(x.T)
        gu, gv, gp = g[..., 0], g[..., 1], g[..., 2]
        su = _dotK(es.off_mom, gu) + _dotK(es.off_up, gp)
        sv = _dotK(es.off_mom, gv) + _dotK(es.off_vp, gp)
        sp = (_dotK(es.off_pu, gu) + _dotK(es.off_pv, gv)
              + _dotK(es.off_pp, gp))
    return jnp.stack([du + su, dv + sv, dp_ + sp], axis=0)


def _mom_dot2(es: EllSystem, mesh, z_u, z_v):
    """(A_off z_u, A_off z_v) sharing one kernel's neighbor reads."""
    if mesh.banded:
        return mesh.banded_dot((z_u, z_v), (es.off_momB,),
                               (((0, 0),), ((0, 1),)))
    g = mesh.gather(jnp.stack([z_u, z_v], axis=1))
    return _dotK(es.off_mom, g[..., 0]), _dotK(es.off_mom, g[..., 1])


def _momentum_solve(es: EllSystem, mesh, r_u, r_v, sweeps: int):
    """Jacobi momentum predict (see stencil_system._momentum_solve); u and v
    share one fused banded dot per sweep.  When the mesh is banded and the
    iterate fits VMEM, ALL sweeps run inside one Pallas kernel
    (banded_jacobi_sweeps) — at <=200k cells the per-sweep launch overhead
    dominates the preconditioner cost."""
    if sweeps >= 3 and mesh.banded and mesh.banded_sweeps_fit(2):
        return mesh.banded_jacobi_sweeps((r_u, r_v), es.diag_u_inv,
                                         es.off_momB, sweeps)
    z_u = es.diag_u_inv * r_u
    z_v = es.diag_u_inv * r_v
    for _ in range(sweeps - 1):
        su, sv = _mom_dot2(es, mesh, z_u, z_v)
        z_u = es.diag_u_inv * (r_u - su)
        z_v = es.diag_u_inv * (r_v - sv)
    return z_u, z_v


def chebyshev_pressure_solve(es: EllSystem, mesh, rhs_p, omega: float,
                             n_sweeps: int):
    from jax import lax

    x0 = es.diag_p_inv * rhs_p
    x_prev = jnp.zeros_like(rhs_p)

    def sweep(_, carry):
        x_prev, x_cur = carry
        if mesh.banded:
            (sigma,) = mesh.banded_dot((x_cur,), (es.P_offB,), (((0, 0),),))
        else:
            sigma = _dotK(es.P_off, mesh.gather(x_cur))
        hat = es.diag_p_inv * (rhs_p - sigma)
        return (x_cur, x_prev + omega * (hat - x_prev))

    _, x = lax.fori_loop(0, n_sweeps, sweep, (x_prev, x0))
    return x


def schur_precond(es: EllSystem, mesh, r: jnp.ndarray, omega: float,
                  n_sweeps: int, pressure_solve=None,
                  mom_sweeps: int = 1) -> jnp.ndarray:
    """SIMPLE/Schur preconditioner M^{-1} r (reference schur_precond.wgsl),
    scalar-coefficient form; r is (3, N) component-major (see spmv)."""
    r_u, r_v, r_p = r[0], r[1], r[2]

    z_u, z_v = _momentum_solve(es, mesh, r_u, r_v, mom_sweeps)

    if mesh.banded:
        (sig_p,) = mesh.banded_dot((z_u, z_v), (es.off_puB, es.off_pvB),
                                   (((0, 0), (1, 1)),))
    else:
        g = mesh.gather(jnp.stack([z_u, z_v], axis=1))
        sig_p = _dotK(es.off_pu, g[..., 0]) + _dotK(es.off_pv, g[..., 1])
    rhs_p = r_p - es.diag_pu * z_u - es.diag_pv * z_v - sig_p

    if pressure_solve is None:
        z_p = chebyshev_pressure_solve(es, mesh, rhs_p, omega, n_sweeps)
    else:
        z_p = pressure_solve(rhs_p)

    if mesh.banded:
        sg_u, sg_v = mesh.banded_dot((z_p,), (es.off_upB, es.off_vpB),
                                     (((0, 0),), ((1, 0),)))
    else:
        gp = mesh.gather(z_p)
        sg_u, sg_v = _dotK(es.off_up, gp), _dotK(es.off_vp, gp)
    g_u = es.diag_up * z_p + sg_u
    g_v = es.diag_vp * z_p + sg_v
    gz_u, gz_v = _momentum_solve(es, mesh, g_u, g_v, mom_sweeps)
    return jnp.stack([z_u - gz_u, z_v - gz_v, z_p], axis=0)
