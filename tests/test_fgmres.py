"""FGMRES unit tests (the reference has no isolated Krylov tests; these pin
down the solver the stability tests depend on)."""

import numpy as np
import jax.numpy as jnp

from cfd2_tpu.ops.fgmres import fgmres_solve


def _dense_solve(A, b, precond_scale, restart=20, max_restarts=10):
    N = b.shape[0]
    Aj = jnp.asarray(A)
    matvec = lambda x: (Aj @ x.reshape(-1)).reshape(N, 3)
    precond = lambda r: r * precond_scale
    return fgmres_solve(matvec, precond, jnp.asarray(b),
                        jnp.zeros((N, 3), jnp.float32),
                        restart=restart, max_restarts=max_restarts,
                        tol=1e-6, abstol=1e-10)


def test_diagonally_dominant_system():
    rng = np.random.default_rng(0)
    N = 40
    A = rng.standard_normal((3 * N, 3 * N)).astype(np.float32) * 0.1
    A += np.eye(3 * N, dtype=np.float32) * 5.0
    b = rng.standard_normal((N, 3)).astype(np.float32)
    res = _dense_solve(A, b, 0.2)
    x = np.asarray(res.x).reshape(-1)
    rel = np.linalg.norm(A @ x - b.reshape(-1)) / np.linalg.norm(b)
    assert bool(res.converged)
    assert rel < 1e-4


def test_restart_path():
    """Force multiple restarts with a small restart length."""
    rng = np.random.default_rng(1)
    N = 30
    A = rng.standard_normal((3 * N, 3 * N)).astype(np.float32) * 0.3
    A += np.eye(3 * N, dtype=np.float32) * 4.0
    b = rng.standard_normal((N, 3)).astype(np.float32)
    res = _dense_solve(A, b, 0.25, restart=5, max_restarts=40)
    x = np.asarray(res.x).reshape(-1)
    rel = np.linalg.norm(A @ x - b.reshape(-1)) / np.linalg.norm(b)
    assert rel < 1e-3


def test_zero_rhs_returns_initial_guess():
    N = 10
    A = np.eye(3 * N, dtype=np.float32)
    b = np.zeros((N, 3), np.float32)
    res = _dense_solve(A, b, 1.0)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), 0.0)


def test_exact_initial_guess_takes_zero_iterations():
    rng = np.random.default_rng(2)
    N = 10
    A = np.eye(3 * N, dtype=np.float32) * 2.0
    x_true = rng.standard_normal((N, 3)).astype(np.float32)
    b = (A @ x_true.reshape(-1)).reshape(N, 3)
    Aj = jnp.asarray(A)
    matvec = lambda x: (Aj @ x.reshape(-1)).reshape(N, 3)
    res = fgmres_solve(matvec, lambda r: r, jnp.asarray(b),
                       jnp.asarray(x_true), restart=10, max_restarts=5,
                       tol=1e-5, abstol=1e-7)
    assert bool(res.converged)
    assert int(res.iterations) == 0


def test_no_flatten_path_matches_flat():
    """flatten=False keeps vectors in their native (possibly tiled) shape;
    the multiply-reduce CGS must agree with the flat matmul formulation."""
    rng = np.random.default_rng(3)
    N = 60
    A = rng.standard_normal((3 * N, 3 * N)).astype(np.float32) * 0.1
    A += np.eye(3 * N, dtype=np.float32) * 5.0
    b = rng.standard_normal((N, 3)).astype(np.float32)
    Aj = jnp.asarray(A)

    # Planar shape (3, 4, 15): matvec reorders to/from the flat layout.
    def mv_planar(xp):
        xf = xp.reshape(3, -1).T.reshape(-1)      # planar -> interleaved flat
        yf = Aj @ xf
        return yf.reshape(-1, 3).T.reshape(3, 4, 15)

    bp = jnp.asarray(b).T.reshape(3, 4, 15)
    pc = lambda r: r * 0.2
    res_flat = fgmres_solve(mv_planar, pc, bp, jnp.zeros_like(bp),
                            restart=20, max_restarts=10, tol=1e-6,
                            abstol=1e-10, flatten=True)
    res_nf = fgmres_solve(mv_planar, pc, bp, jnp.zeros_like(bp),
                          restart=20, max_restarts=10, tol=1e-6,
                          abstol=1e-10, flatten=False)
    assert bool(res_flat.converged) and bool(res_nf.converged)
    xf = np.asarray(res_flat.x)
    xn = np.asarray(res_nf.x)
    assert np.abs(xf - xn).max() < 1e-4 * max(np.abs(xf).max(), 1.0)
    # Both actually solve the system.
    for x in (xf, xn):
        xi = x.reshape(3, -1).T.reshape(-1)
        rel = np.linalg.norm(A @ xi - b.reshape(-1)) / np.linalg.norm(b)
        assert rel < 1e-4


def test_bf16_basis_solution_parity():
    """bf16 Krylov basis storage must converge to the same solution as the
    f32 basis (VERDICT r2 #1a): the basis rows are storage-rounded but all
    arithmetic and the true-residual restart check stay f32."""
    rng = np.random.default_rng(7)
    N = 60
    A = rng.standard_normal((3 * N, 3 * N)).astype(np.float32) * 0.2
    A += np.eye(3 * N, dtype=np.float32) * 4.0
    b = rng.standard_normal((N, 3)).astype(np.float32)
    Aj = jnp.asarray(A)
    matvec = lambda x: (Aj @ x.reshape(-1)).reshape(N, 3)
    precond = lambda r: r * 0.25
    kw = dict(restart=20, max_restarts=20, tol=1e-6, abstol=1e-10)
    r32 = fgmres_solve(matvec, precond, jnp.asarray(b),
                       jnp.zeros((N, 3), jnp.float32), **kw)
    r16 = fgmres_solve(matvec, precond, jnp.asarray(b),
                       jnp.zeros((N, 3), jnp.float32),
                       basis_dtype=jnp.bfloat16, **kw)
    assert bool(r16.converged)
    x32 = np.asarray(r32.x).reshape(-1)
    x16 = np.asarray(r16.x).reshape(-1)
    # Both converged to rtol 1e-6 on a well-conditioned system: solutions
    # agree far tighter than bf16 resolution would suggest.
    assert np.linalg.norm(x16 - x32) / np.linalg.norm(x32) < 1e-4
    rel = np.linalg.norm(A @ x16 - b.reshape(-1)) / np.linalg.norm(b)
    assert rel < 1e-5


def test_f64_norms_option_converges():
    """ROADMAP #5: f64 norm accumulation option — functional parity with the
    f32 path (a silent no-op without jax_enable_x64, full f64 with it)."""
    rng = np.random.default_rng(11)
    N = 40
    A = rng.standard_normal((3 * N, 3 * N)).astype(np.float32) * 0.1
    A += np.eye(3 * N, dtype=np.float32) * 5.0
    b = rng.standard_normal((N, 3)).astype(np.float32)
    Aj = jnp.asarray(A)
    matvec = lambda x: (Aj @ x.reshape(-1)).reshape(N, 3)
    res = fgmres_solve(matvec, lambda r: r * 0.2, jnp.asarray(b),
                       jnp.zeros((N, 3), jnp.float32),
                       restart=20, max_restarts=10, tol=1e-6, abstol=1e-10,
                       f64_norms=True)
    x = np.asarray(res.x).reshape(-1)
    rel = np.linalg.norm(A @ x - b.reshape(-1)) / np.linalg.norm(b)
    assert bool(res.converged) and rel < 1e-4


def test_incycle_stall_exit_cuts_iterations():
    """When the tolerance is unattainable, the opt-in in-cycle stall exit
    must stop burning iterations while returning an equivalent solution."""
    rng = np.random.default_rng(21)
    N = 50
    # Moderately conditioned system + noisy preconditioner: residual floors
    # well above the 1e-12 target.
    A = rng.standard_normal((3 * N, 3 * N)).astype(np.float32) * 0.3
    A += np.eye(3 * N, dtype=np.float32) * 3.0
    b = rng.standard_normal((N, 3)).astype(np.float32)
    Aj = jnp.asarray(A)
    matvec = lambda x: (Aj @ x.reshape(-1)).reshape(N, 3)
    precond = lambda r: r * 0.3
    kw = dict(restart=40, max_restarts=4, tol=1e-14, abstol=1e-30)
    r_ref = fgmres_solve(matvec, precond, jnp.asarray(b),
                         jnp.zeros((N, 3), jnp.float32), **kw)
    r_cut = fgmres_solve(matvec, precond, jnp.asarray(b),
                         jnp.zeros((N, 3), jnp.float32),
                         incycle_window=12, **kw)
    # The knob trades tail accuracy for iterations (opt-in; the outer
    # loop's true-residual contract still guards the fields).
    assert int(r_cut.iterations) < int(r_ref.iterations)
    assert float(r_cut.residual) < 2.0 * max(float(r_ref.residual), 1e-9)


def test_recycle_warm_start_cuts_iterations():
    """A second solve of a slightly perturbed system warm-started from the
    first solve's basis (recycle=, return_basis=) must (a) keep the
    convergence contract and (b) take fewer Arnoldi iterations than a cold
    solve of the same system (SolverConfig.fgmres_recycle rationale)."""
    rng = np.random.default_rng(3)
    N = 60
    A1 = rng.standard_normal((3 * N, 3 * N)).astype(np.float32) * 0.1
    A1 += np.eye(3 * N, dtype=np.float32) * 4.0
    # Perturbed system: one outer corrector's worth of drift.
    A2 = A1 + 0.01 * rng.standard_normal((3 * N, 3 * N)).astype(np.float32)
    b = rng.standard_normal((N, 3)).astype(np.float32)

    def solve(A, recycle=None):
        Aj = jnp.asarray(A)
        return fgmres_solve(
            lambda x: (Aj @ x.reshape(-1)).reshape(N, 3),
            lambda r: r * 0.25, jnp.asarray(b),
            jnp.zeros((N, 3), jnp.float32), restart=30, max_restarts=10,
            tol=1e-6, abstol=1e-10, recycle=recycle, return_basis=True)

    r1 = solve(A1)
    assert bool(r1.converged) and r1.basis is not None
    cold = solve(A2)
    warm = solve(A2, recycle=r1.basis)
    for res in (cold, warm):
        x = np.asarray(res.x).reshape(-1)
        rel = np.linalg.norm(A2 @ x - b.reshape(-1)) / np.linalg.norm(b)
        assert bool(res.converged) and rel < 1e-4
    assert int(warm.iterations) < int(cold.iterations)


def test_recycle_zero_seed_is_noop():
    """The j=0 zero-basis seed (outer 0 of a fused step) must leave the solve
    bitwise identical to a cold solve — the guard rejects it."""
    rng = np.random.default_rng(4)
    N = 24
    A = rng.standard_normal((3 * N, 3 * N)).astype(np.float32) * 0.1
    A += np.eye(3 * N, dtype=np.float32) * 5.0
    b = rng.standard_normal((N, 3)).astype(np.float32)
    Aj = jnp.asarray(A)
    kw = dict(restart=20, max_restarts=5, tol=1e-6, abstol=1e-10)
    mv = lambda x: (Aj @ x.reshape(-1)).reshape(N, 3)
    pc = lambda r: r * 0.2
    x0 = jnp.zeros((N, 3), jnp.float32)
    cold = fgmres_solve(mv, pc, jnp.asarray(b), x0, **kw)
    m = 20
    D = 3 * N
    seed = (jnp.zeros((m + 1, D), jnp.float32), jnp.zeros((m, D), jnp.float32),
            jnp.zeros((m + 1, m), jnp.float32), jnp.zeros((m,), jnp.float32),
            jnp.zeros((m,), jnp.float32), jnp.int32(0))
    warm = fgmres_solve(mv, pc, jnp.asarray(b), x0, recycle=seed,
                        return_basis=True, **kw)
    assert int(cold.iterations) == int(warm.iterations)
    np.testing.assert_array_equal(np.asarray(cold.x), np.asarray(warm.x))
