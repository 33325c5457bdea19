"""Restarted FGMRES with right (flexible) preconditioning, fully on-device.

TPU-native redesign of the reference GPU FGMRES driver
(src/solver/gpu/coupled_solver_fgmres.rs:1728-2449).  The reference burns most
of its time on per-iteration parameter uniform rewrites and async scalar
readbacks for convergence; here the entire solve — classical Gram–Schmidt,
Hessenberg/Givens updates, convergence tests, restarts, stagnation detection —
runs inside nested ``lax.while_loop``s with zero host round-trips:

* the Krylov basis V (m+1, D) and preconditioned basis Z (m, D) are dense
  *flattened* arrays (D = prod of the vector shape): CGS is then a pair of
  plain matrix-vector products that stream the basis rows at HBM bandwidth.
  The earlier (m+1, N, 3) layout left the 3-wide component axis minor-most,
  which cost ~3x the roofline traffic in practice.  The user-facing
  matvec/precond still see the natural (N, 3) shape;
* Givens/Hessenberg logic operates on (m+1,) vectors on-device, replacing the
  reference's workgroup_size(1) shader (gmres_logic.wgsl);
* the restart triangular solve is a masked dense solve.

Numerics match the reference: restart m=50, <=20 restarts, rtol 1e-5,
atol 1e-7, single CGS pass, stagnation exit after 3 restarts with <1e-3
relative improvement (coupled_solver_fgmres.rs:1737-1740, 2403-2419).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


@jax.tree_util.register_dataclass
@dataclass
class FgmresResult:
    x: jnp.ndarray             # (N, 3) solution
    iterations: jnp.ndarray    # int32 total inner iterations
    residual: jnp.ndarray      # f32 final (true) residual norm
    converged: jnp.ndarray     # bool
    # Krylov recycling handoff (None unless return_basis=True): the last
    # cycle's (V, Z, R, cs, sn, j) — V/Z in internal (possibly flattened)
    # layout, R the Givens-rotated Hessenberg, j the valid column count.
    basis: tuple | None = None


def _norm(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(v * v))


def make_norm(f64_norms: bool, dtype):
    """Norm used for residual/convergence accumulation inside fgmres_solve.

    With ``f64_norms`` the sum of squares accumulates in float64 — needed for
    stiff cases (e.g. water rho=1000 backwards-step at fine h, matching the
    reference's stiffest regression `reproduce_divergence.rs`) where squared
    f32 magnitudes saturate.  Requires ``jax_enable_x64``; without it jnp
    silently keeps f32 and the flag is a harmless no-op (pinned by
    tests/test_f64_norms_x64.py, which asserts the accumulation dtype in the
    jaxpr under both settings)."""
    if not f64_norms:
        return _norm

    def nrm(v):
        acc = jnp.sum(v.astype(jnp.float64) ** 2)
        return jnp.sqrt(acc).astype(dtype)

    return nrm


def fgmres_solve(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    precond: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray,
    restart: int = 50,
    max_restarts: int = 20,
    tol: float = 1e-5,
    abstol: float = 1e-7,
    stagnation_tol: float = 1e-3,
    stagnation_limit: int = 3,
    cgs_chunk_rows: int = 8,
    flatten: bool | None = None,
    basis_dtype=None,
    f64_norms: bool = False,
    incycle_window: int = 0,
    incycle_tol: float = 0.02,
    recycle: tuple | None = None,
    return_basis: bool = False,
) -> FgmresResult:
    """Solve A x = b; vectors have shape (N, 3) (or any fixed shape).

    ``flatten``: work on flattened (D,) vectors internally (basis (m+1, D)).
    Right for interleaved (N, 3) vectors, whose 3-wide minor axis would
    otherwise tile-pad the basis 42x.  For 2D-tiled planar vectors (e.g.
    (3, ny, nx)) flattening is *wrong*: TPU stores the flat vector in linear
    T(1024) layout while the stencil matvec/precond operate in T(8,128)
    tiles, so every iteration pays physical relayouts at the pc/mv
    boundaries.  Default (None): flatten unless the trailing axis is
    lane-sized (>= 128).

    ``basis_dtype``: storage dtype for the Krylov basis V (default: b.dtype).
    ``jnp.bfloat16`` halves the dominant HBM traffic of the solve — the CGS
    pass streams the basis twice per iteration (~50% of all bytes at 1M
    cells, DESIGN.md §9b).  All arithmetic stays f32: the bf16 rows are
    promoted at the multiply, dots and norms accumulate in f32, and the
    preconditioned basis Z (which forms the solution update) stays full
    precision.  The basis rows are merely rounded to ~3 decimal digits of
    orthogonality; the per-cycle *true-residual* recomputation and restart
    logic absorb that, so convergence is protected by construction (flexible
    GMRES already tolerates inexact preconditioning of exactly this kind).

    ``recycle``: a previous solve's ``FgmresResult.basis`` (same shapes).
    Before the first Arnoldi cycle the initial guess is improved by the
    least-squares projection of r0 onto the recycled search space:
    A_prev Z = V Q^T R_ext (Arnoldi + Givens), so
    min_y ||r0 - A_prev Z y|| solves R y = (Q V^T r0)[:j] with the stored
    rotations — one basis read + one triangular solve.  The current matrix
    differs from A_prev (outer correctors re-linearize), so the correction
    is self-guarded: one extra matvec confirms it reduced ||r0|| before it
    is taken (same guard discipline as the pressure presolve).  Krylov
    recycling/deflation for sequences of slowly-varying systems follows
    Parks et al., GCRO-DR (SIAM J. Sci. Comput. 28, 2006) — this is its
    cheapest projection-only form, with FGMRES flexibility standing in for
    exact deflation.

    ``return_basis``: return the last cycle's (V, Z, R, cs, sn, j) in
    ``FgmresResult.basis`` for a later solve's ``recycle``.

    ``incycle_window``: if > 0, exit an Arnoldi cycle early when the
    minimized-residual estimate |g_{j+1}| has improved by less than
    ``incycle_tol`` (relative) over the last ``incycle_window`` iterations.
    Near the f32 attainable-accuracy floor the estimate flattens and further
    iterations only burn bandwidth; this is the reference's restart-level
    stagnation test (coupled_solver_fgmres.rs:2403-2419) applied at
    iteration granularity.  The outer true-residual recomputation and
    restart stagnation logic are unchanged, so the exit never loosens the
    convergence contract — it only stops paying for progress that is not
    happening.  0 disables (reference-parity default).
    """
    m = restart
    shape = b.shape
    dtype = b.dtype
    if flatten is None:
        flatten = shape[-1] < 128

    if flatten:
        # Work on flattened vectors internally; user callables see `shape`.
        bf = b.reshape(-1)
        mv = lambda xf: matvec(xf.reshape(shape)).reshape(-1)
        pc = lambda rf: precond(rf.reshape(shape)).reshape(-1)
        x0 = x0.reshape(-1)
    else:
        bf = b
        mv = matvec
        pc = precond
    vshape = bf.shape
    vaxes = tuple(range(1, len(vshape) + 1))   # basis-row reduction axes

    def rowdot(Vc, w):
        """Per-row dots <V_i, w> without layout change: matmul on flat
        vectors (MXU, measured at HBM roofline), multiply-reduce on tiled."""
        if flatten:
            return Vc @ w
        return jnp.sum(Vc * w[None], axis=vaxes)

    def rowexp(d, Vc):
        """sum_i d_i V_i (the projection / solution update)."""
        if flatten:
            return d @ Vc
        return jnp.sum(d.reshape(d.shape + (1,) * len(vshape)) * Vc, axis=0)

    if basis_dtype is None:
        basis_dtype = dtype

    nrm = make_norm(f64_norms, dtype)

    rhs_norm = nrm(bf)
    target = jnp.maximum(tol * rhs_norm, abstol)

    r0 = bf - mv(x0)
    beta0 = nrm(r0)

    if recycle is not None:
        # Projection warm start from a previous solve's basis (see
        # docstring).  All dead-cheap relative to one Arnoldi iteration
        # except the guard matvec and the two basis reads.
        V_r, Z_r, R_r, cs_r, sn_r, j_r = recycle
        d = rowdot(V_r.astype(dtype), r0)            # (m+1,) = V^T r0

        def _rot(i, dd):
            c, s = cs_r[i], sn_r[i]
            di, di1 = dd[i], dd[i + 1]
            return dd.at[i].set(c * di + s * di1).at[i + 1].set(
                -s * di + c * di1)

        d = lax.fori_loop(0, j_r, _rot, d)           # Q V^T r0
        km = jnp.arange(m)
        # Truncate to the well-conditioned leading columns: near the donor
        # solve's convergence the trailing R diagonals are tiny, and R^{-1}
        # through them turns the projection into amplified f32 noise that
        # COSTS iterations (measured: 29 -> 43 linear iters/step without
        # this guard).  valid_i = every diagonal up to i is healthy.
        diag = jnp.abs(jnp.diagonal(R_r[:m, :m]))
        healthy = (km < j_r) & (diag > 1e-4 * jnp.maximum(diag[0], 1e-30))
        valid = jnp.cumprod(healthy.astype(jnp.int32)) > 0
        mask2 = (valid[:, None] & valid[None, :]).astype(dtype)
        Reff = R_r[:m, :m] * mask2 + jnp.diag(
            jnp.where(valid, 0.0, 1.0).astype(dtype))
        geff = jnp.where(valid, d[:m], 0.0)
        y_r = jax.scipy.linalg.solve_triangular(Reff, geff, lower=False)
        dx = rowexp(y_r, Z_r)
        r_try = r0 - mv(dx)
        rn_try = nrm(r_try)
        # Accept only a MEANINGFUL reduction: a marginal one means the old
        # space barely overlaps the new error and the dx noise floor would
        # dominate.
        ok = (j_r > 0) & (rn_try < 0.7 * beta0)
        x0 = jnp.where(ok, x0 + dx, x0)
        r0 = jnp.where(ok, r_try, r0)
        beta0 = jnp.where(ok, rn_try, beta0)

    V0 = jnp.zeros((m + 1,) + vshape, basis_dtype)
    Z0 = jnp.zeros((m,) + vshape, dtype)
    H0 = jnp.zeros((m + 1, m), dtype)

    def inner_cycle(x, V, Z, H, beta):
        """One Arnoldi cycle of up to m iterations; returns updated x."""
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        idx = jnp.arange(m + 1)

        def cond(carry):
            V, Z, H, cs, sn, g, j, conv, best_r, best_j = carry
            return (j < m) & ~conv

        def body(carry):
            V, Z, H, cs, sn, g, j, conv, best_r, best_j = carry
            v_j = V[j].astype(dtype)
            z = pc(v_j)
            w = mv(z)
            Z = lax.dynamic_update_index_in_dim(Z, z, j, 0)

            # Classical Gram-Schmidt against the basis, masked to i<=j (stale
            # rows from earlier restarts are masked out).  The basis is
            # processed in static chunks gated on j: iteration j only needs
            # rows 0..j, and reading all m+1 rows of V twice dominated the
            # per-iteration cost at >=1M cells (TPU conditionals execute only
            # the taken branch, so skipped chunks cost no HBM traffic).
            # Masked-out rows contribute exact zeros, so the result is
            # identical to the unchunked form.
            ch = max(1, min(cgs_chunk_rows, m + 1))
            dots_parts = []
            proj = jnp.zeros_like(w)
            for start in range(0, m + 1, ch):
                size = min(ch, m + 1 - start)
                Vc = lax.slice_in_dim(V, start, start + size, axis=0)
                maskc = idx[start:start + size] <= j

                def _chunk(Vc=Vc, maskc=maskc):
                    d = rowdot(Vc, w)
                    d = jnp.where(maskc, d, 0.0)
                    p = rowexp(d, Vc)
                    return d, p

                if start == 0:
                    d, p = _chunk()
                else:
                    d, p = lax.cond(
                        j >= start, _chunk,
                        lambda size=size: (jnp.zeros((size,), dtype),
                                           jnp.zeros_like(w)))
                dots_parts.append(d)
                proj = proj + p
            dots = (dots_parts[0] if len(dots_parts) == 1
                    else jnp.concatenate(dots_parts))
            w = w - proj

            hnorm = nrm(w)
            v_next = jnp.where(hnorm > 0.0, 1.0 / jnp.maximum(hnorm, 1e-30), 0.0) * w
            V = lax.dynamic_update_index_in_dim(
                V, v_next.astype(basis_dtype), j + 1, 0)

            # Hessenberg column with subdiagonal entry.
            h = dots.at[j + 1].set(hnorm)

            # Apply previous Givens rotations 0..j-1 — vectorized.  The
            # sequential update is a first-order linear recurrence
            #   t_{i+1} = -s_i t_i + c_i h_{i+1},   out_i = c_i t_i + s_i h_{i+1}
            # (rotation i reads the still-untouched h_{i+1}), solved in log
            # depth with an associative scan; unused rotations (i >= j) are
            # masked to the identity.  Replaces an m-step scalar fori_loop
            # that dominated the per-iteration cost on TPU.
            use = (jnp.arange(m) < j).astype(dtype)
            c_eff = jnp.where(use > 0, cs, 1.0)
            s_eff = jnp.where(use > 0, sn, 0.0)
            a = -s_eff                       # (m,)
            bvec = c_eff * h[1:]             # (m,)

            def combine(x, y):
                a1, b1 = x
                a2, b2 = y
                return a2 * a1, a2 * b1 + b2

            cumA, cumB = lax.associative_scan(combine, (a, bvec))
            t = jnp.concatenate([h[:1], cumA * h[0] + cumB])   # (m+1,)
            out_head = c_eff * t[:m] + s_eff * h[1:]
            h = jnp.concatenate([out_head, t[m:]])

            # New rotation annihilating h[j+1].
            a = h[j]
            bb = h[j + 1]
            r = jnp.sqrt(a * a + bb * bb)
            nonzero = r > 1e-30
            c = jnp.where(nonzero, a / jnp.maximum(r, 1e-30), 1.0)
            s = jnp.where(nonzero, bb / jnp.maximum(r, 1e-30), 0.0)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            h = h.at[j].set(c * a + s * bb)
            h = h.at[j + 1].set(0.0)
            H = H.at[:, j].set(h)

            gj = g[j]
            g = g.at[j].set(c * gj)
            g = g.at[j + 1].set(-s * gj)

            resid = jnp.abs(g[j + 1])
            conv = resid < target
            if incycle_window > 0:
                improved = resid < (1.0 - incycle_tol) * best_r
                best_r = jnp.where(improved, resid, best_r)
                best_j = jnp.where(improved, j + 1, best_j)
                conv = conv | (j + 1 - best_j >= incycle_window)
            return V, Z, H, cs, sn, g, j + 1, conv, best_r, best_j

        V, Z, H, cs, sn, g, j, conv, _, _ = lax.while_loop(
            cond, body, (V, Z, H, cs, sn, g, jnp.int32(0), jnp.asarray(False),
                         beta, jnp.int32(0)))

        # Masked triangular solve for y (rows/cols >= j are padded to
        # identity so stale entries are inert).
        km = jnp.arange(m)
        Heff = H[:m, :m] + jnp.diag(jnp.where(km >= j, 1.0, 0.0).astype(dtype))
        geff = jnp.where(km < j, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Heff, geff, lower=False)
        # Solution update in static chunks gated on j, like the CGS pass:
        # y_i = 0 exactly for i >= j, so skipped chunks contribute nothing —
        # without the gating this read all m rows of Z (624 MB at 1M cells)
        # when a typical solve uses ~11-30.
        ch = max(1, min(cgs_chunk_rows, m))
        upd = jnp.zeros_like(x)
        for start in range(0, m, ch):
            size = min(ch, m - start)
            Zc = lax.slice_in_dim(Z, start, start + size, axis=0)
            yc = lax.dynamic_slice_in_dim(y, start, size)

            def _part(Zc=Zc, yc=yc):
                return rowexp(yc, Zc)

            if start == 0:
                p = _part()
            else:
                p = lax.cond(j > start, _part, lambda: jnp.zeros_like(x))
            upd = upd + p
        x = x + upd
        return x, V, Z, H, cs, sn, j, conv

    def outer_cond(carry):
        (x, V, Z, H, cs, sn, jl, beta, k, total, conv, stag, prev_res,
         res) = carry
        return (k < max_restarts) & ~conv & (beta > 0.0)

    def outer_body(carry):
        (x, V, Z, H, cs, sn, jl, beta, k, total, conv, stag, prev_res,
         res) = carry
        # Seed V[0] = r / beta.
        r = bf - mv(x)
        rn = nrm(r)
        v0 = jnp.where(rn > 0.0, 1.0 / jnp.maximum(rn, 1e-30), 0.0) * r
        V = V.at[0].set(v0.astype(basis_dtype))

        x, V, Z, H, cs, sn, j, cyc_conv = inner_cycle(x, V, Z, H, rn)
        total = total + j

        # True residual after the cycle (coupled_solver_fgmres.rs:2354-2373).
        r_new = bf - mv(x)
        res_new = nrm(r_new)
        conv_new = res_new < target

        # Stagnation detection across restarts (:2403-2419).
        improvement = (prev_res - res_new) / jnp.maximum(prev_res, 1e-30)
        stagnated = improvement < stagnation_tol
        stag_new = jnp.where(stagnated, stag + 1, 0)
        conv_new = conv_new | (stag_new >= stagnation_limit)

        return (x, V, Z, H, cs, sn, j, res_new, k + 1, total, conv_new,
                stag_new, res_new, res_new)

    cs0 = jnp.zeros((m,), dtype)
    init = (x0, V0, Z0, H0, cs0, cs0, jnp.int32(0), beta0, jnp.int32(0),
            jnp.int32(0), beta0 < target, jnp.int32(0),
            jnp.asarray(jnp.finfo(dtype).max, dtype), beta0)
    (x, V, Z, H, cs, sn, jl, beta, k, total, conv, stag, prev_res, res) = \
        lax.while_loop(outer_cond, outer_body, init)

    basis = (V, Z, H, cs, sn, jl) if return_basis else None
    return FgmresResult(x=x.reshape(shape), iterations=total, residual=res,
                        converged=conv, basis=basis)
