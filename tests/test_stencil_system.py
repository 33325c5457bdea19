"""StencilSystem (2D-native coupled operator) parity with the block-ELL path.

The stencil system is the structured-mesh hot path; these tests pin its SpMV,
Schur preconditioner, and full linear solve to the generic block-ELL
formulation at f32 roundoff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
from cfd2_tpu.models.assembly import (assemble_coupled, assemble_stencil,
                                      prepare)
from cfd2_tpu.ops import stencil_system as st
from cfd2_tpu.ops.blockell import block_spmv
from cfd2_tpu.ops.schur import schur_preconditioner
from cfd2_tpu.runtime.device_mesh import encode_mesh
from cfd2_tpu.runtime.state import SolverConfig, SolverParams, initial_state


@pytest.fixture(scope="module")
def setup():
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    dm = encode_mesh(mesh)
    assert dm.structured
    config = SolverConfig()
    params = SolverParams.default(dt=0.01)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < 0.05, 0] = 1.0
    state = initial_state(dm, u0=u0)
    state = jax.jit(prepare, static_argnames=("config",))(
        dm, state, params, config)
    sys_ = assemble_coupled(dm, state, params, config)
    ss = assemble_stencil(dm, state, params, config)
    return dm, config, sys_, ss


def _rand_x(dm, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((dm.num_cells, 3)).astype(np.float32)
        * np.asarray(dm.c_valid)[:, None])


def test_coefficients_match(setup):
    dm, _, sys_, ss = setup
    ny, nx = dm.grid_shape
    # Off-diagonal blocks: stencil grids == block entries on slots 0..3.
    for (a, b), name in [((0, 0), "off_mom"), ((0, 2), "off_up"),
                         ((1, 2), "off_vp"), ((2, 0), "off_pu"),
                         ((2, 1), "off_pv"), ((2, 2), "off_pp")]:
        blk = np.asarray(sys_.A_off[:, :4, a, b]).T.reshape(4, ny, nx)
        grid = np.asarray(getattr(ss, name))
        np.testing.assert_allclose(grid, blk, rtol=0, atol=0)
    # Slots beyond 4 carry no couplings (the stencil path drops them).
    if sys_.A_off.shape[1] > 4:
        assert np.abs(np.asarray(sys_.A_off[:, 4:])).max() == 0.0


def test_spmv_matches_blockell(setup):
    dm, _, sys_, ss = setup
    x = _rand_x(dm)
    y_ref = np.asarray(block_spmv(sys_, dm, x))
    y_st = np.asarray(st.spmv(ss, x))
    scale = np.abs(y_ref).max()
    assert np.abs(y_st - y_ref).max() < 1e-5 * max(scale, 1.0)


def test_schur_precond_matches(setup):
    dm, config, sys_, ss = setup
    r = _rand_x(dm, seed=1)
    n_sweeps = config.pressure_sweeps(dm.num_cells)
    z_ref = np.asarray(schur_preconditioner(
        sys_, dm, r, config.precond_omega, n_sweeps))
    z_st = np.asarray(st.schur_precond(
        ss, r, config.precond_omega, n_sweeps))
    scale = np.abs(z_ref).max()
    assert np.abs(z_st - z_ref).max() < 1e-4 * max(scale, 1.0)


def test_schur_precond_mom_sweeps_matches(setup):
    """Multi-sweep momentum predict: planar stencil form == generic
    block-ELL form (both fold momentum off-diagonals identically)."""
    dm, config, sys_, ss = setup
    r = _rand_x(dm, seed=7)
    n_sweeps = config.pressure_sweeps(dm.num_cells)
    for ms in (2, 3):
        z_ref = np.asarray(schur_preconditioner(
            sys_, dm, r, config.precond_omega, n_sweeps, mom_sweeps=ms))
        z_pl = np.asarray(st.from_planar(ss, st.schur_precond_planar(
            ss, st.to_planar(ss, r), config.precond_omega, n_sweeps,
            mom_sweeps=ms)))
        scale = np.abs(z_ref).max()
        assert np.abs(z_pl - z_ref).max() < 1e-4 * max(scale, 1.0)
    # sweeps=1 stays the bare diagonal predict (reference parity).
    z1 = np.asarray(schur_preconditioner(
        sys_, dm, r, config.precond_omega, n_sweeps, mom_sweeps=1))
    z_default = np.asarray(schur_preconditioner(
        sys_, dm, r, config.precond_omega, n_sweeps))
    np.testing.assert_allclose(z1, z_default, rtol=0, atol=0)


def test_planar_variants_match(setup):
    """(3, ny, nx) component-plane spmv/precond == (N, 3) interleaved forms."""
    dm, config, _, ss = setup
    x = _rand_x(dm, seed=3)
    xp = st.to_planar(ss, x)
    np.testing.assert_allclose(np.asarray(st.from_planar(ss, xp)),
                               np.asarray(x), rtol=0, atol=0)
    y_ref = np.asarray(st.spmv(ss, x))
    y_pl = np.asarray(st.from_planar(ss, st.spmv_planar(ss, xp)))
    np.testing.assert_allclose(y_pl, y_ref, rtol=0, atol=0)
    n_sweeps = config.pressure_sweeps(dm.num_cells)
    z_ref = np.asarray(st.schur_precond(ss, x, config.precond_omega, n_sweeps))
    z_pl = np.asarray(st.from_planar(ss, st.schur_precond_planar(
        ss, xp, config.precond_omega, n_sweeps)))
    np.testing.assert_allclose(z_pl, z_ref, rtol=0, atol=0)


def test_structured_coarsening_stencil_matches_segment_sum(setup):
    """The 2D stencil-form Galerkin re-coarsening
    (compute_structured_level_values2) must reproduce the segment_sum
    formulation exactly at every level."""
    dm, _, sys_, ss = setup
    from cfd2_tpu.ops.amg import (build_hierarchy_for_mesh,
                                  compute_structured_level_values,
                                  compute_structured_level_values2)
    hier = build_hierarchy_for_mesh(dm)
    ny, nx = dm.grid_shape
    lv_ref = compute_structured_level_values(
        hier, ss.P_diag2.reshape(-1),
        jnp.moveaxis(ss.P_off2.reshape(4, -1), 0, 1))
    lv2 = compute_structured_level_values2(hier, ss.P_diag2, ss.P_off2)
    assert len(lv_ref) == len(lv2)
    grids = [hier.levels[0].fine_grid] + [l.grid for l in hier.levels]
    for (dr, orf), (d2, o2), g in zip(lv_ref, lv2, grids):
        dr = np.asarray(dr).reshape(g)
        orf = np.asarray(orf).T.reshape((4,) + g)
        scale = max(np.abs(dr).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(d2), dr, rtol=0,
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(o2), orf, rtol=0,
                                   atol=1e-5 * scale)


def test_amg_pressure_solve_matches(setup):
    dm, config, sys_, ss = setup
    from cfd2_tpu.ops.amg import (build_hierarchy_for_mesh,
                                  make_pressure_solve)
    hier = build_hierarchy_for_mesh(dm)
    rhs = _rand_x(dm, seed=2)[:, 2]
    z_ref = np.asarray(make_pressure_solve(hier, dm, sys_)(rhs))
    ps2 = st.make_pressure_solve2(hier, ss)
    z_st = np.asarray(ps2(rhs.reshape(dm.grid_shape))).reshape(-1)
    scale = np.abs(z_ref).max()
    assert np.abs(z_st - z_ref).max() < 1e-4 * max(scale, 1.0)


def test_chebyshev_recurrence_matches_reference_pingpong():
    """VERDICT r2 carryover #8: the reference's relax_pressure kernel
    (schur_precond.wgsl:49-90) computes, per ping-pong dispatch,
        x_new = mix(x_prev, D^-1 (rhs - R x_cur), omega)
    writing into the buffer that becomes x_prev — i.e. the exact two-term
    recurrence chebyshev_pressure_solve implements, with the same seed
    (x_0 = D^-1 rhs, x_{-1} = 0; :183-187).  Pin equivalence against an
    explicit ping-pong re-implementation on a random diagonally-dominant
    operator mapped onto a small structured grid.
    """
    import numpy as np
    import jax.numpy as jnp
    from cfd2_tpu.ops.stencil_system import (StencilSystem,
                                             chebyshev_pressure_solve2)

    rng = np.random.default_rng(3)
    ny, nx = 6, 9
    off = rng.standard_normal((4, ny, nx)).astype(np.float32) * 0.1
    diag = 4.0 + rng.random((ny, nx)).astype(np.float32)
    rhs = rng.standard_normal((ny, nx)).astype(np.float32)
    omega = 1.2
    sweeps = 17

    def shifts(x):
        e = np.concatenate([x[:, 1:], x[:, -1:]], axis=1)
        w = np.concatenate([x[:, :1], x[:, :-1]], axis=1)
        n = np.concatenate([x[1:], x[-1:]], axis=0)
        s = np.concatenate([x[:1], x[:-1]], axis=0)
        return e, w, n, s

    def sigma(x):
        e, w, n, s = shifts(x)
        return off[0] * e + off[1] * w + off[2] * n + off[3] * s

    # Reference-style ping-pong: two buffers, each dispatch reads "current"
    # and "previous", writes the previous buffer (which becomes current).
    d_inv = 1.0 / diag
    buf_prev = np.zeros((ny, nx), np.float32)       # x_{-1}
    buf_cur = d_inv * rhs                           # x_0 (Jacobi init)
    for _ in range(sweeps):
        hat = d_inv * (rhs - sigma(buf_cur))
        x_new = buf_prev + omega * (hat - buf_prev)  # mix(prev, hat, omega)
        buf_prev, buf_cur = buf_cur, x_new

    z = np.zeros((ny * nx,), np.float32)
    ss = StencilSystem(
        grid=(ny, nx),
        off_mom=jnp.zeros((4, ny, nx)), off_up=jnp.zeros((4, ny, nx)),
        off_vp=jnp.zeros((4, ny, nx)), off_pu=jnp.zeros((4, ny, nx)),
        off_pv=jnp.zeros((4, ny, nx)), off_pp=jnp.zeros((4, ny, nx)),
        P_off2=jnp.asarray(off),
        diag_u2=jnp.zeros((ny, nx)), diag_up2=jnp.zeros((ny, nx)),
        diag_vp2=jnp.zeros((ny, nx)), diag_pu2=jnp.zeros((ny, nx)),
        diag_pv2=jnp.zeros((ny, nx)), diag_pp2=jnp.zeros((ny, nx)),
        P_diag2=jnp.asarray(diag),
        diag_u_inv2=jnp.zeros((ny, nx)),
        diag_p_inv2=jnp.asarray(d_inv),
        rhs=jnp.zeros((ny * nx, 3)))
    ours = np.asarray(chebyshev_pressure_solve2(
        ss, jnp.asarray(rhs), omega, sweeps))
    np.testing.assert_allclose(ours, buf_cur, rtol=1e-5, atol=1e-6)


def test_frozen_coarse_pressure_solve2_exact(setup):
    """make_pressure_solve2(frozen=coarse_level_values2(...)) built from the
    SAME assembly must be bitwise-identical to the per-call re-coarsening —
    pins the structured half of SolverConfig.amg_freeze_coarse (the fused
    step freezes the level-1+ Galerkin stencils at step entry; level 0 is
    re-derived from the current assembly inside make_pressure_solve2)."""
    dm, config, sys_, ss = setup
    from cfd2_tpu.ops.amg import build_hierarchy_for_mesh
    hier = build_hierarchy_for_mesh(dm)
    rhs = _rand_x(dm, seed=5)[:, 2].reshape(dm.grid_shape)
    z_live = st.make_pressure_solve2(hier, ss)(rhs)
    frozen = st.coarse_level_values2(hier, ss)
    z_frozen = st.make_pressure_solve2(hier, ss, frozen=frozen)(rhs)
    np.testing.assert_array_equal(np.asarray(z_live), np.asarray(z_frozen))


def test_frozen_coarse_structured_step_matches_refresh():
    """A fused structured step with amg_freeze_coarse on/off lands on the
    same converged fields (staleness is preconditioner-only)."""
    from dataclasses import replace as _rep
    from cfd2_tpu.models.coupled import CoupledSolver

    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.04, 0.04, 1.2, (3.0, 1.0))
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < 0.08, 0] = 1.0

    fields = []
    for freeze in (True, False):
        s = CoupledSolver(mesh)
        assert s.mesh.structured
        s.set_precond_type(1)
        s.set_dt(0.005)
        s.config = _rep(s.config, amg_freeze_coarse=freeze)
        s.set_u(u0)
        for _ in range(2):
            s.step(mode="fused")
        fields.append((s.get_u(), s.get_p()))
        assert np.isfinite(fields[-1][0]).all()

    (u_f, p_f), (u_r, p_r) = fields
    assert np.abs(u_f - u_r).max() < 5e-4
    assert np.abs(p_f - p_r).max() < 5e-3
