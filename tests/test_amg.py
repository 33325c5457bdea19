"""AMG tests: V-cycle convergence as a standalone solver, and the
AMG-preconditioned coupled path (port of reference tests/amg_test.rs:6-90:
Jacobi then AMG, 5 steps each, pressure finite and 0 < max_p < 1000)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cfd2_tpu.mesh import BackwardsStep, generate_cut_cell_mesh
from cfd2_tpu.models.assembly import assemble_coupled, prepare
from cfd2_tpu.models.coupled import CoupledSolver
from cfd2_tpu.ops.amg import build_hierarchy, compute_level_values, v_cycle
from cfd2_tpu.ops.blockell import scalar_spmv
from cfd2_tpu.runtime.device_mesh import encode_mesh
from cfd2_tpu.runtime.state import (
    PRECOND_AMG,
    PRECOND_JACOBI,
    SolverConfig,
    SolverParams,
    initial_state,
)


@pytest.fixture(scope="module")
def bstep_mesh():
    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.5, 1.0))
    mesh.smooth(geo, 0.3, 50)
    return mesh


def test_hierarchy_structure(bstep_mesh):
    dm = encode_mesh(bstep_mesh)
    hier = build_hierarchy(np.asarray(dm.ck_neighbor), np.asarray(dm.ck_mask),
                           np.asarray(dm.c_valid))
    assert len(hier.levels) >= 2
    sizes = [lvl.n for lvl in hier.levels]
    assert sizes == sorted(sizes, reverse=True)
    assert sizes[-1] <= 100 or len(hier.levels) == 20
    # Aggregates partition the fine grid.
    agg = np.asarray(hier.levels[0].agg)
    assert agg.min() == 0 and agg.max() == hier.levels[0].n - 1


def test_v_cycle_reduces_residual(bstep_mesh):
    dm = encode_mesh(bstep_mesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.001)
    state = initial_state(dm, u0=np.full((dm.num_host_cells, 2), [0.1, 0.0]))
    state = prepare(dm, state, params, config)
    sys = assemble_coupled(dm, state, params, config)
    hier = build_hierarchy(np.asarray(dm.ck_neighbor), np.asarray(dm.ck_mask),
                           np.asarray(dm.c_valid))
    lv = compute_level_values(hier, sys.P_diag, sys.P_off)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(dm.num_cells).astype(np.float32))
    bn = float(jnp.linalg.norm(b))
    x = jnp.where(jnp.abs(sys.P_diag) > 1e-30, b / sys.P_diag, 0.0)
    residuals = []
    for _ in range(5):
        x = v_cycle(hier, lv, dm, b, x)
        r = b - scalar_spmv(sys.P_diag, sys.P_off, dm, x)
        residuals.append(float(jnp.linalg.norm(r)) / bn)
    assert residuals[-1] < 0.5          # monotone contraction
    assert residuals[-1] < residuals[0]


def _run_steps(mesh, precond, n_steps=5):
    s = CoupledSolver(mesh)
    s.set_precond_type(precond)
    s.set_dt(0.001)
    s.set_density(1.0)
    s.set_viscosity(0.01)
    s.set_u(np.full((mesh.num_cells, 2), [0.1, 0.0]))
    for _ in range(n_steps):
        s.step()
    return s


def test_grid_ops_2d_match_flat():
    """The 2D-native V-cycle ops (relayout-free TPU path) must reproduce the
    flat reference implementations exactly."""
    from cfd2_tpu.ops.amg import _GridOps
    rng = np.random.default_rng(1)
    ny, nx = 13, 21          # odd dims — the case that hit relayouts on TPU
    n = ny * nx
    ops = _GridOps((ny, nx))
    diag = jnp.asarray(rng.uniform(1.0, 2.0, n).astype(np.float32))
    off = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    diag2 = diag.reshape(ny, nx)
    off2 = off.T.reshape(4, ny, nx)
    x2, b2 = x.reshape(ny, nx), b.reshape(ny, nx)

    np.testing.assert_allclose(ops.spmv2(diag2, off2, x2).reshape(-1),
                               ops.spmv(diag, off, x), rtol=1e-6)
    np.testing.assert_allclose(
        ops.smooth_rbgs2(diag2, off2, x2, b2, sweeps=2).reshape(-1),
        ops.smooth_rbgs(diag, off, x, b, sweeps=2), rtol=1e-6)
    cg = (7, 11)
    np.testing.assert_allclose(ops.restrict2(cg, x2).reshape(-1),
                               ops.restrict_to(cg, x), rtol=1e-6)
    xc = jnp.asarray(rng.standard_normal(cg[0] * cg[1]).astype(np.float32))
    np.testing.assert_allclose(ops.prolong2(cg, xc.reshape(cg)).reshape(-1),
                               ops.prolong_from(cg, xc), rtol=1e-6)


def test_jacobi_then_amg_preconditioner(bstep_mesh):
    """Reference amg_test.rs: both preconditioners give finite bounded p."""
    for precond in (PRECOND_JACOBI, PRECOND_AMG):
        s = _run_steps(bstep_mesh, precond)
        p = s.get_p()
        u = s.get_u()
        assert np.isfinite(p).all()
        assert np.isfinite(u).all()
        max_p = np.abs(p).max()
        assert 0.0 < max_p < 1000.0, f"precond {precond}: max_p={max_p}"


def test_truncated_structured_hierarchy_contracts():
    """min_coarse truncation (bigger dense coarsest solve, fewer tiny
    levels) must preserve V-cycle contraction on a structured mesh."""
    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.assembly import assemble_stencil
    from cfd2_tpu.ops.amg import (_GridOps, _dense_factor,
                                  build_structured_hierarchy,
                                  compute_structured_level_values2,
                                  structured_v_cycle)

    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.02, 0.02, 1.2, (3.0, 1.0))
    dm = encode_mesh(mesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.005)
    state = initial_state(dm, u0=np.full((dm.num_host_cells, 2), [0.1, 0.0]))
    state = prepare(dm, state, params, config)
    ss = assemble_stencil(dm, state, params, config)

    rng = np.random.default_rng(1)
    ny, nx = dm.grid_shape
    b = jnp.asarray(rng.standard_normal(ny * nx).astype(np.float32))
    bn = float(jnp.linalg.norm(b))
    from cfd2_tpu.ops import stencil_system as st

    for min_coarse in (100, 1500):
        hier = build_structured_hierarchy(dm, min_coarse=min_coarse)
        assert hier is not None
        if min_coarse == 1500:
            assert len(hier.levels) < n_levels_ref
        else:
            n_levels_ref = len(hier.levels)
        lv2 = compute_structured_level_values2(hier, ss.P_diag2, ss.P_off2)
        dc, oc = lv2[-1]
        fac = _dense_factor(
            dc.reshape(-1), jnp.moveaxis(oc.reshape(4, -1), 0, 1),
            _GridOps(hier.levels[-1].grid).neighbor_cols())
        x = jnp.zeros_like(b)
        for _ in range(4):
            x = structured_v_cycle(hier, lv2, b, x, coarse_factors=fac)
        # residual via the level-0 pressure stencil
        x2 = x.reshape(ny, nx)
        sigma = st._dot4(ss.P_off2, st._shifts2(x2))
        r = b.reshape(ny, nx) - (ss.P_diag2 * x2 + sigma)
        rel = float(jnp.linalg.norm(r.reshape(-1))) / bn
        assert rel < 0.2, f"min_coarse={min_coarse}: rel={rel}"


def test_structured_hierarchy_build_is_host_only():
    """Hierarchy construction must not dispatch eager device ops: through
    the remote-compile tunnel each tiny eager primitive compiles its own
    executable — measured 410 s of 'amg hierarchy build' at 1M cells on a
    slow-tunnel day (round-5 bench phase decomposition) for milliseconds of
    arithmetic.  Pin: no jax compilations occur during the build."""
    import logging

    import jax

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.ops.amg import build_hierarchy_for_mesh

    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5),
                              obstacle_radius=0.2)
    mesh = encode_mesh(generate_cut_cell_mesh(geo, 0.02, 0.02, 1.2,
                                              (3.0, 1.0)))
    from cfd2_tpu.mesh import generate_delaunay_mesh
    gmesh = encode_mesh(generate_delaunay_mesh(geo, 0.05, 0.05, 1.2,
                                               (3.0, 1.0)))
    jax.block_until_ready(mesh.ck_mask)   # flush pending transfers
    jax.block_until_ready(gmesh.ck_mask)

    jax.clear_caches()
    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logger = logging.getLogger("jax._src.interpreters.pxla")
    old_level = logger.level
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG)
    jax.config.update("jax_log_compiles", True)
    try:
        hier = build_hierarchy_for_mesh(mesh)            # structured path
        ghier = build_hierarchy_for_mesh(gmesh)          # generic path
    finally:
        jax.config.update("jax_log_compiles", False)
        logger.setLevel(old_level)
        logger.removeHandler(handler)
    assert hier is not None and ghier is not None
    compiles = [m for m in records if "Compiling" in m]
    assert not compiles, compiles
