"""2D-native coupled operator for structured meshes.

The block-ELL container (ops/blockell.py) stores the coupled system as
(N, K, 3, 3) blocks and applies it through ``mesh.gather`` — which on the
structured fast path still materializes (N, K, ...) intermediates and reads
the 36-entry blocks even though only 6 entries per block are structurally
nonzero (momentum off-diagonals are diagonal 2x2; see
reference shaders/coupled_assembly_merged.wgsl:295-350 for the block shape).

On TPU the profile showed those (N, K) stack/reshape chains lowering to
relayout kernels inside the FGMRES while_loop — the same failure mode that
motivated the 2D-native V-cycle (ops/amg.py _GridOps).  This module keeps the
*entire* Krylov hot path in (ny, nx) grid form:

* :class:`StencilSystem` holds only the 6 nonzero block-entry coefficient
  grids per directional slot, each (4, ny, nx), plus (ny, nx) diagonals —
  144 -> 96 coefficient bytes/cell and zero gathers;
* :func:`spmv` and :func:`schur_precond` are pure fused stencils (shifts +
  multiply-accumulate) mirroring ops/blockell.block_spmv and
  ops/schur.schur_preconditioner exactly (tests/test_stencil_system.py pins
  f32 agreement).

Off-diagonal coefficients are identically zero at boundary/extra slots (the
assembly multiplies them by the internal-face mask), so edge-clamped shifts
never contribute.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax


def _shifts2(xg: jnp.ndarray):
    """Edge-clamped E, W, N, S neighbor grids of an (ny, nx) array."""
    e = jnp.concatenate([xg[:, 1:], xg[:, -1:]], axis=1)
    w = jnp.concatenate([xg[:, :1], xg[:, :-1]], axis=1)
    n = jnp.concatenate([xg[1:], xg[-1:]], axis=0)
    s = jnp.concatenate([xg[:1], xg[:-1]], axis=0)
    return e, w, n, s


def _dot4(off: jnp.ndarray, sh) -> jnp.ndarray:
    """sum_s off[s] * sh[s] for the 4 directional slots."""
    return off[0] * sh[0] + off[1] * sh[1] + off[2] * sh[2] + off[3] * sh[3]


@dataclass
class StencilSystem:
    """Coupled (u,v,p) system on an (ny, nx) grid, stencil layout.

    Block entry names follow the coupled matrix
        [ A_uu   0     G_u ]   row u: off_mom, off_up
        [ 0      A_vv  G_v ]   row v: off_mom, off_vp
        [ D_u    D_v   C   ]   row p: off_pu, off_pv, off_pp
    (A_uu == A_vv by construction; diag_v == diag_u likewise).
    """
    grid: tuple                  # static (ny, nx)
    # (4, ny, nx): per-slot off-diagonal coefficients, slots E,W,N,S
    off_mom: jnp.ndarray
    off_up: jnp.ndarray
    off_vp: jnp.ndarray
    off_pu: jnp.ndarray
    off_pv: jnp.ndarray
    off_pp: jnp.ndarray
    P_off2: jnp.ndarray          # scalar pressure (Schur) off-diagonals
    # (ny, nx) diagonals
    diag_u2: jnp.ndarray
    diag_up2: jnp.ndarray
    diag_vp2: jnp.ndarray
    diag_pu2: jnp.ndarray
    diag_pv2: jnp.ndarray
    diag_pp2: jnp.ndarray
    P_diag2: jnp.ndarray
    diag_u_inv2: jnp.ndarray
    diag_p_inv2: jnp.ndarray
    rhs: jnp.ndarray             # (N, 3)

    def __post_init__(self):
        # `grid` is static metadata (meta field), not a traced child.
        self.grid = tuple(self.grid)


jax.tree_util.register_dataclass(
    StencilSystem,
    data_fields=[f for f in StencilSystem.__dataclass_fields__
                 if f != "grid"],
    meta_fields=["grid"],
)


def cast_coeffs(ss: StencilSystem, dtype) -> StencilSystem:
    """Copy of ``ss`` with every coefficient plane cast to ``dtype`` (``rhs``
    and the static grid kept).  Used to apply the Schur preconditioner in
    bf16: the matvec keeps the f32 system, the preconditioner reads half the
    bytes (see SolverConfig.precond_bf16)."""
    import dataclasses
    kw = {}
    for f in dataclasses.fields(StencilSystem):
        v = getattr(ss, f.name)
        kw[f.name] = v if f.name in ("grid", "rhs") else v.astype(dtype)
    return StencilSystem(**kw)


def _split3(x: jnp.ndarray, grid):
    ny, nx = grid
    return (x[:, 0].reshape(ny, nx), x[:, 1].reshape(ny, nx),
            x[:, 2].reshape(ny, nx))


def spmv(ss: StencilSystem, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x, x of shape (N, 3).  Matches ops/blockell.block_spmv on
    structured meshes to f32 roundoff."""
    xu, xv, xp = _split3(x, ss.grid)
    su = _shifts2(xu)
    sv = _shifts2(xv)
    sp = _shifts2(xp)

    yu = ss.diag_u2 * xu + ss.diag_up2 * xp \
        + _dot4(ss.off_mom, su) + _dot4(ss.off_up, sp)
    yv = ss.diag_u2 * xv + ss.diag_vp2 * xp \
        + _dot4(ss.off_mom, sv) + _dot4(ss.off_vp, sp)
    yp = ss.diag_pu2 * xu + ss.diag_pv2 * xv + ss.diag_pp2 * xp \
        + _dot4(ss.off_pu, su) + _dot4(ss.off_pv, sv) + _dot4(ss.off_pp, sp)

    return jnp.stack([yu.reshape(-1), yv.reshape(-1), yp.reshape(-1)], axis=1)


def chebyshev_pressure_solve2(ss: StencilSystem, rhs_p2: jnp.ndarray,
                              omega: float, n_sweeps: int) -> jnp.ndarray:
    """2D form of ops/schur.chebyshev_pressure_solve (two-term damped-Jacobi
    recurrence, reference schur_precond.wgsl:49-90)."""
    x0 = ss.diag_p_inv2 * rhs_p2
    x_prev = jnp.zeros_like(rhs_p2)

    def sweep(_, carry):
        x_prev, x_cur = carry
        sigma = _dot4(ss.P_off2, _shifts2(x_cur))
        hat = ss.diag_p_inv2 * (rhs_p2 - sigma)
        x_new = x_prev + omega * (hat - x_prev)
        return (x_cur, x_new)

    _, x = lax.fori_loop(0, n_sweeps, sweep, (x_prev, x0))
    return x


def schur_precond(ss: StencilSystem, r: jnp.ndarray, omega: float,
                  n_sweeps: int, pressure_solve=None) -> jnp.ndarray:
    """Apply the SIMPLE/Schur preconditioner M^{-1} r, all-stencil.

    Matches ops/schur.schur_preconditioner (reference schur_precond.wgsl):
    predict -> Schur RHS -> pressure solve -> velocity correct.
    ``pressure_solve`` takes and returns an (ny, nx) grid; defaults to the
    Chebyshev sweeps.
    """
    ru, rv, rp = _split3(r, ss.grid)

    # 1. Predict velocity.
    z_u = ss.diag_u_inv2 * ru
    z_v = ss.diag_u_inv2 * rv

    # 2. Schur RHS: r_p' = r_p - D z.
    rhs_p = rp - ss.diag_pu2 * z_u - ss.diag_pv2 * z_v \
        - _dot4(ss.off_pu, _shifts2(z_u)) - _dot4(ss.off_pv, _shifts2(z_v))

    # 3. Pressure solve.
    if pressure_solve is None:
        z_p = chebyshev_pressure_solve2(ss, rhs_p, omega, n_sweeps)
    else:
        z_p = pressure_solve(rhs_p)

    # 4. Correct velocity with the gradient blocks G.
    sp = _shifts2(z_p)
    g_u = ss.diag_up2 * z_p + _dot4(ss.off_up, sp)
    g_v = ss.diag_vp2 * z_p + _dot4(ss.off_vp, sp)
    z_u = z_u - ss.diag_u_inv2 * g_u
    z_v = z_v - ss.diag_u_inv2 * g_v

    return jnp.stack([z_u.reshape(-1), z_v.reshape(-1), z_p.reshape(-1)],
                     axis=1)


# ----------------------------------------------------------------------
# Planar variants: vectors as (3, ny, nx) component planes.
#
# The (N, 3) interleaved layout keeps a 3-wide minor axis: every _split3 is a
# strided slice + relayout and every output a re-interleave, measured ~11x
# above the HBM roofline per Schur apply at 1M cells.  Component planes make
# the split/stack free; the FGMRES driver works on flattened vectors anyway,
# so the only conversion is once per solve at entry/exit.


def spmv_planar(ss: StencilSystem, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x with x, y of shape (3, ny, nx) (component planes)."""
    xu, xv, xp = x[0], x[1], x[2]
    su = _shifts2(xu)
    sv = _shifts2(xv)
    sp = _shifts2(xp)

    yu = ss.diag_u2 * xu + ss.diag_up2 * xp \
        + _dot4(ss.off_mom, su) + _dot4(ss.off_up, sp)
    yv = ss.diag_u2 * xv + ss.diag_vp2 * xp \
        + _dot4(ss.off_mom, sv) + _dot4(ss.off_vp, sp)
    yp = ss.diag_pu2 * xu + ss.diag_pv2 * xv + ss.diag_pp2 * xp \
        + _dot4(ss.off_pu, su) + _dot4(ss.off_pv, sv) + _dot4(ss.off_pp, sp)

    return jnp.stack([yu, yv, yp])


def _momentum_solve(ss: StencilSystem, r_u, r_v, sweeps: int,
                    rbgs: bool = False):
    """Approximate A_uu^{-1} applied to (r_u, r_v): Jacobi iteration seeded
    with the diagonal predict.  ``sweeps=1`` is the reference's SIMPLE
    diagonal approximation (schur_precond.wgsl:19-34); extra sweeps fold the
    momentum off-diagonals in for a stronger predict at one extra stencil
    application each.  ``rbgs=True`` replaces each Jacobi sweep with a
    red-black Gauss-Seidel sweep (2 colored half-passes; ~2x the contraction
    per stencil application on the 5-point momentum operator)."""
    z_u = ss.diag_u_inv2 * r_u
    z_v = ss.diag_u_inv2 * r_v
    if not rbgs:
        for _ in range(sweeps - 1):
            z_u = ss.diag_u_inv2 * (r_u - _dot4(ss.off_mom, _shifts2(z_u)))
            z_v = ss.diag_u_inv2 * (r_v - _dot4(ss.off_mom, _shifts2(z_v)))
        return z_u, z_v
    ny, nx = ss.grid
    color = (jnp.arange(ny)[:, None] + jnp.arange(nx)[None, :]) % 2
    for _ in range(sweeps - 1):
        for c in (0, 1):
            zn_u = ss.diag_u_inv2 * (r_u - _dot4(ss.off_mom, _shifts2(z_u)))
            zn_v = ss.diag_u_inv2 * (r_v - _dot4(ss.off_mom, _shifts2(z_v)))
            z_u = jnp.where(color == c, zn_u, z_u)
            z_v = jnp.where(color == c, zn_v, z_v)
    return z_u, z_v


def _shift_along(x: jnp.ndarray, s: int, axis: int, fill: float) -> jnp.ndarray:
    """Value from index i+s along ``axis`` (s may be negative), edges filled
    with ``fill``."""
    n = x.shape[axis]
    pad = jnp.full_like(lax.slice_in_dim(x, 0, abs(s), axis=axis), fill)
    if s > 0:
        body = lax.slice_in_dim(x, s, n, axis=axis)
        return jnp.concatenate([body, pad], axis=axis)
    body = lax.slice_in_dim(x, 0, n + s, axis=axis)
    return jnp.concatenate([pad, body], axis=axis)


def pcr_line_solve(a, b, c, r, axis: int, steps: int = 4) -> jnp.ndarray:
    """Approximate batched tridiagonal solve along ``axis`` by truncated
    parallel cyclic reduction.

    Row i couples (a_i, b_i, c_i) to (i-1, i, i+1); each PCR step eliminates
    the couplings at distance s = 2^k, doubling the coupling distance and
    (for diagonally dominant systems) shrinking the off-diagonals roughly
    quadratically — K=3-4 steps + a diagonal solve is an excellent line
    solve, and every operation is an edge-filled shift + elementwise math
    (stencil-class on TPU; no scans, no sequential Thomas recurrence).
    Boundary rows carry a_0 = c_last = 0, which PCR propagates, so zero-fill
    shifts are exact.
    """
    for k in range(steps):
        s = 1 << k
        b_m = _shift_along(b, -s, axis, 1.0)
        b_p = _shift_along(b, +s, axis, 1.0)
        a_m = _shift_along(a, -s, axis, 0.0)
        c_m = _shift_along(c, -s, axis, 0.0)
        a_p = _shift_along(a, +s, axis, 0.0)
        c_p = _shift_along(c, +s, axis, 0.0)
        r_m = _shift_along(r, -s, axis, 0.0)
        r_p = _shift_along(r, +s, axis, 0.0)
        alpha = a / b_m
        gamma = c / b_p
        b = b - alpha * c_m - gamma * a_p
        r = r - alpha * r_m - gamma * r_p
        a = -alpha * a_m
        c = -gamma * c_p
    return r / b


def _momentum_solve_adi(ss: StencilSystem, r_u, r_v, passes: int = 1,
                        steps: int = 4):
    """ADI line-relaxation momentum predict: alternate implicit tridiagonal
    solves along x then y (truncated-PCR lines), treating the transverse
    coupling explicitly.  Unlike the pointwise Jacobi predict — whose
    contraction degrades as the diffusion coefficient grows ~1/h — line
    relaxation solves each direction exactly, so its strength is
    mesh-size-independent along lines (the classical ADI argument).
    """
    # Slot convention: off_mom[0]=E (couples to x+1), [1]=W, [2]=N (y+1),
    # [3]=S.  x-lines: axis=1 (nx); y-lines: axis=0 (ny) of (ny, nx) grids.
    cE, cW, cN, cS = (ss.off_mom[0], ss.off_mom[1], ss.off_mom[2],
                      ss.off_mom[3])
    b = 1.0 / ss.diag_u_inv2
    z_u = jnp.zeros_like(r_u)
    z_v = jnp.zeros_like(r_v)
    for _ in range(passes):
        # implicit in x, explicit in y
        rhs_u = r_u - _dot4(ss.off_mom, _shifts2(z_u)) \
            + cE * _shift_along(z_u, 1, 1, 0.0) \
            + cW * _shift_along(z_u, -1, 1, 0.0)
        rhs_v = r_v - _dot4(ss.off_mom, _shifts2(z_v)) \
            + cE * _shift_along(z_v, 1, 1, 0.0) \
            + cW * _shift_along(z_v, -1, 1, 0.0)
        z_u = pcr_line_solve(cW, b, cE, rhs_u, axis=1, steps=steps)
        z_v = pcr_line_solve(cW, b, cE, rhs_v, axis=1, steps=steps)
        # implicit in y, explicit in x
        rhs_u = r_u - cE * _shift_along(z_u, 1, 1, 0.0) \
            - cW * _shift_along(z_u, -1, 1, 0.0)
        rhs_v = r_v - cE * _shift_along(z_v, 1, 1, 0.0) \
            - cW * _shift_along(z_v, -1, 1, 0.0)
        z_u = pcr_line_solve(cS, b, cN, rhs_u, axis=0, steps=steps)
        z_v = pcr_line_solve(cS, b, cN, rhs_v, axis=0, steps=steps)
    return z_u, z_v


def schur_precond_planar(ss: StencilSystem, r: jnp.ndarray, omega: float,
                         n_sweeps: int, pressure_solve=None,
                         mom_sweeps: int = 1,
                         mom_rbgs: bool = False,
                         mom_adi: int = 0) -> jnp.ndarray:
    """Schur preconditioner on (3, ny, nx) component planes (see
    schur_precond).  ``mom_adi`` > 0 replaces the Jacobi momentum predict
    with that many ADI line-relaxation passes (_momentum_solve_adi)."""
    ru, rv, rp = r[0], r[1], r[2]

    if mom_adi > 0:
        mom = lambda a, b: _momentum_solve_adi(ss, a, b, passes=mom_adi)
    else:
        mom = lambda a, b: _momentum_solve(ss, a, b, mom_sweeps,
                                           rbgs=mom_rbgs)
    z_u, z_v = mom(ru, rv)

    rhs_p = rp - ss.diag_pu2 * z_u - ss.diag_pv2 * z_v \
        - _dot4(ss.off_pu, _shifts2(z_u)) - _dot4(ss.off_pv, _shifts2(z_v))

    if pressure_solve is None:
        z_p = chebyshev_pressure_solve2(ss, rhs_p, omega, n_sweeps)
    else:
        z_p = pressure_solve(rhs_p)

    sp = _shifts2(z_p)
    g_u = ss.diag_up2 * z_p + _dot4(ss.off_up, sp)
    g_v = ss.diag_vp2 * z_p + _dot4(ss.off_vp, sp)
    gz_u, gz_v = mom(g_u, g_v)
    z_u = z_u - gz_u
    z_v = z_v - gz_v

    return jnp.stack([z_u, z_v, z_p])


def pressure_apply(ss: StencilSystem, x2: jnp.ndarray) -> jnp.ndarray:
    """Scalar pressure (Schur) operator on an (ny, nx) grid: P x."""
    return ss.P_diag2 * x2 + _dot4(ss.P_off2, _shifts2(x2))


def pcg_pressure(ss: StencilSystem, rhs2: jnp.ndarray, pressure_solve,
                 iters: int) -> jnp.ndarray:
    """``iters`` preconditioned-CG iterations on the scalar pressure system,
    preconditioned by ``pressure_solve`` (a V-cycle from make_pressure_solve2
    or the Chebyshev relax).  Static unrolled count — used for the
    first-outer pressure presolve, where the elliptic component of the
    initial residual is orders of magnitude above the Krylov target and each
    *coupled* FGMRES iteration retires it no faster than a pressure-only CG
    iteration at ~3x the bytes."""
    x = jnp.zeros_like(rhs2)
    r = rhs2
    z = pressure_solve(r)
    p = z
    rz = jnp.sum(r * z)
    for _ in range(iters):
        Ap = pressure_apply(ss, p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = pressure_solve(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        rz = rz_new
        p = z + beta * p
    return x


def schur_guess(ss: StencilSystem, r: jnp.ndarray, omega: float,
                n_sweeps: int, pressure_solve=None, cg_iters: int = 8,
                mom_sweeps: int = 1, mom_adi: int = 0) -> jnp.ndarray:
    """One SIMPLE/Schur correction with a CG-strength pressure block: the
    first-outer initial-guess builder (VERDICT r3 #2).

    Identical structure to :func:`schur_precond_planar`, but the pressure
    solve runs ``cg_iters`` V-cycle-preconditioned CG iterations instead of a
    fixed 1-2 cycles.  Used once per step (gated on the initial residual
    being far from the Krylov target), NOT per FGMRES iteration: as a
    preconditioner CG's nonlinearity would break flexible-GMRES efficiency
    bookkeeping, but as an x0 builder it only moves the start point — the
    rtol/atol convergence contract is untouched."""
    ru, rv, rp = r[0], r[1], r[2]
    if mom_adi > 0:
        mom = lambda a, b: _momentum_solve_adi(ss, a, b, passes=mom_adi)
    else:
        mom = lambda a, b: _momentum_solve(ss, a, b, mom_sweeps)
    z_u, z_v = mom(ru, rv)
    rhs_p = rp - ss.diag_pu2 * z_u - ss.diag_pv2 * z_v \
        - _dot4(ss.off_pu, _shifts2(z_u)) - _dot4(ss.off_pv, _shifts2(z_v))
    if pressure_solve is None:
        pressure_solve = lambda rr: chebyshev_pressure_solve2(
            ss, rr, omega, n_sweeps)
    z_p = pcg_pressure(ss, rhs_p, pressure_solve, cg_iters)
    sp = _shifts2(z_p)
    g_u = ss.diag_up2 * z_p + _dot4(ss.off_up, sp)
    g_v = ss.diag_vp2 * z_p + _dot4(ss.off_vp, sp)
    gz_u, gz_v = mom(g_u, g_v)
    return jnp.stack([z_u - gz_u, z_v - gz_v, z_p])


def to_planar(ss: StencilSystem, x: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) interleaved -> (3, ny, nx) planes (once per solve)."""
    ny, nx = ss.grid
    return x.T.reshape(3, ny, nx)


def from_planar(ss: StencilSystem, x: jnp.ndarray) -> jnp.ndarray:
    """(3, ny, nx) planes -> (N, 3) interleaved (once per solve)."""
    return x.reshape(3, -1).T


def coarse_level_values2(hier, ss: StencilSystem):
    """Galerkin-coarsen once, returning ``(coarse_vals, factors)`` for
    :func:`make_pressure_solve2`'s ``frozen=`` argument (level-1+ stencil
    values + the coarsest dense factorization).  Lets the fused step
    re-coarsen once per TIMESTEP instead of per outer corrector
    (SolverConfig.amg_freeze_coarse); level 0 is rebuilt from the current
    assembly at apply time (elementwise, free)."""
    return coarse_level_values2_planes(hier, ss.P_diag2, ss.P_off2)


def coarse_level_values2_planes(hier, P_diag2, P_off2):
    """coarse_level_values2 from the bare planar pressure matrix — what the
    fused step's entry-time freeze uses (assembly.assemble_pressure computes
    just these two arrays instead of a full coupled assembly)."""
    from .amg import (_GridOps, _dense_factor,
                      compute_structured_level_values2)
    lv2 = compute_structured_level_values2(hier, P_diag2, P_off2)
    dc, oc = lv2[-1]
    factors = _dense_factor(
        dc.reshape(-1), jnp.moveaxis(oc.reshape(4, -1), 0, 1),
        _GridOps(hier.levels[-1].grid).neighbor_cols())
    return tuple(lv2[1:]), factors


def make_pressure_solve2(hier, ss: StencilSystem, n_cycles: int = 1,
                         frozen=None):
    """Structured-multigrid pressure solve taking/returning (ny, nx) grids.

    Galerkin re-coarsening runs in 2D stencil form
    (amg.compute_structured_level_values2) — the segment_sum formulation cost
    ~74 ms per assembly at 1M cells; this is ~2 ms.

    ``n_cycles``: V-cycles per application.  The piecewise-constant-transfer
    cycle contracts smooth error at ~0.7-0.9/cycle at 1M cells, and the
    outer loop's *first* solve (whose initial error is large and smooth)
    dominates step cost — extra cycles square/cube the contraction for
    ~18%/cycle more per-iteration bytes.
    """
    from .amg import (
        _NULL_SHIFT,
        StructuredAmgHierarchy,
        _GridOps,
        _dense_factor,
        compute_structured_level_values2,
        structured_v_cycle,
    )

    assert isinstance(hier, StructuredAmgHierarchy)
    if frozen is not None:
        # Per-step frozen coarse operators (see coarse_level_values2):
        # level 0 is re-derived from the CURRENT assembly (the same
        # elementwise shift compute_structured_level_values2 applies to its
        # vals[0]), so the smoother and fine residual track each outer;
        # only the level-1+ Galerkin products are reused.
        coarse_vals, factors = frozen
        d0 = ss.P_diag2 + _NULL_SHIFT * jnp.abs(ss.P_diag2)
        lv2 = [(d0, ss.P_off2[:4])] + list(coarse_vals)
    else:
        lv2 = compute_structured_level_values2(hier, ss.P_diag2, ss.P_off2)
        dc, oc = lv2[-1]
        factors = _dense_factor(
            dc.reshape(-1), jnp.moveaxis(oc.reshape(4, -1), 0, 1),
            _GridOps(hier.levels[-1].grid).neighbor_cols())

    def pressure_solve(rhs_p2):
        x = ss.diag_p_inv2 * rhs_p2
        for _ in range(n_cycles):
            x = structured_v_cycle(hier, lv2, rhs_p2.reshape(-1),
                                   x.reshape(-1),
                                   coarse_factors=factors).reshape(ss.grid)
        return x

    return pressure_solve
