"""Discretization sanity tests for the assembled operators — internal
consistency checks the reference enforces only implicitly through its
stability tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from cfd2_tpu.mesh import BackwardsStep, generate_cut_cell_mesh
from cfd2_tpu.models.assembly import assemble_coupled, prepare
from cfd2_tpu.ops.blockell import block_spmv, scalar_spmv
from cfd2_tpu.runtime.device_mesh import encode_mesh
from cfd2_tpu.runtime.state import SolverConfig, SolverParams, initial_state


@pytest.fixture(scope="module")
def setup():
    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    mesh = generate_cut_cell_mesh(geo, 0.1, 0.1, 1.2, (3.5, 1.0))
    dm = encode_mesh(mesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.001)
    state = initial_state(dm, u0=np.full((dm.num_host_cells, 2), [0.1, 0.0]))
    state = prepare(dm, state, params, config)
    sys = assemble_coupled(dm, state, params, config)
    return dm, sys


def _dense_from_blocks(dm, sys):
    """Materialize the block-ELL operator as a dense (3N, 3N) matrix."""
    N = dm.num_cells
    A = np.zeros((3 * N, 3 * N), np.float64)
    Ad = np.asarray(sys.A_diag, np.float64)
    Ao = np.asarray(sys.A_off, np.float64)
    ngh = np.asarray(dm.ck_neighbor)
    for i in range(N):
        A[3 * i:3 * i + 3, 3 * i:3 * i + 3] += Ad[i]
        for k in range(dm.max_faces):
            j = ngh[i, k]
            A[3 * i:3 * i + 3, 3 * j:3 * j + 3] += Ao[i, k]
    return A


def test_block_spmv_matches_dense(setup):
    dm, sys = setup
    N = dm.num_cells
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, 3)).astype(np.float32)
    y = np.asarray(block_spmv(sys, dm, jnp.asarray(x)))
    A = _dense_from_blocks(dm, sys)
    y_ref = (A @ x.reshape(-1).astype(np.float64)).reshape(N, 3)
    assert np.allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_scalar_pressure_matrix_symmetric(setup):
    """The Schur pressure matrix is a weighted Laplacian -> symmetric."""
    dm, sys = setup
    N = dm.num_cells
    P = np.zeros((N, N), np.float64)
    Pd = np.asarray(sys.P_diag, np.float64)
    Po = np.asarray(sys.P_off, np.float64)
    ngh = np.asarray(dm.ck_neighbor)
    for i in range(N):
        P[i, i] += Pd[i]
        for k in range(dm.max_faces):
            P[i, ngh[i, k]] += Po[i, k]
    assert np.abs(P - P.T).max() < 1e-5 * max(np.abs(P).max(), 1.0)


def test_scalar_pressure_row_sums(setup):
    """Interior rows of the pressure Laplacian sum to zero; rows of cells
    touching the outlet are positive (Dirichlet p=0 there)."""
    dm, sys = setup
    x = jnp.ones((dm.num_cells,), jnp.float32)
    row_sums = np.asarray(scalar_spmv(sys.P_diag, sys.P_off, dm, x))
    valid = np.asarray(dm.c_valid) > 0   # skip masked solid identity rows
    touches_outlet = (np.asarray(
        jnp.max((dm.ck_boundary == 2) * dm.ck_mask, axis=1)) > 0) & valid
    interior = valid & ~touches_outlet
    assert np.abs(row_sums[interior]).max() < 1e-3 * np.abs(
        np.asarray(sys.P_diag)).max()
    assert (row_sums[touches_outlet] > 0).all()


def test_momentum_diag_positive(setup):
    dm, sys = setup
    Ad = np.asarray(sys.A_diag)
    assert (Ad[:, 0, 0] > 0).all()
    assert (Ad[:, 1, 1] > 0).all()


def test_divergence_row_of_uniform_flow(setup):
    """Continuity rows applied to uniform velocity (and zero p) measure the
    discrete divergence: zero for interior cells away from boundaries."""
    dm, sys = setup
    N = dm.num_cells
    x = np.zeros((N, 3), np.float32)
    x[:, 0] = 1.0  # uniform u
    y = np.asarray(block_spmv(sys, dm, jnp.asarray(x)))
    touches_boundary = np.asarray(jnp.max(dm.ck_is_boundary, axis=1)) > 0
    div = y[:, 2]
    assert np.abs(div[~touches_boundary]).max() < 1e-4


def test_simple_segregated_stepper():
    """Full segregated SIMPLE loop (BASELINE.json config 2): the predictor/
    corrector must advance a channel flow with finite fields and shrink the
    divergence RHS across correctors."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.pressure_poisson import (assemble_pressure_poisson,
                                                  simple_step)
    from cfd2_tpu.models.assembly import prepare
    from cfd2_tpu.runtime.device_mesh import encode_mesh
    from cfd2_tpu.runtime.state import (SolverConfig, SolverParams,
                                        initial_state)

    geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
    hmesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    mesh = encode_mesh(hmesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.01)
    u0 = np.zeros((hmesh.num_cells, 2))
    u0[hmesh.cell_cx < 0.1, 0] = 1.0
    state = initial_state(mesh, u0=u0)

    step_fn = jax.jit(partial(simple_step, n_correctors=2), static_argnums=(3,))
    div0 = None
    for i in range(3):
        state = step_fn(mesh, state, params, config)
        st = prepare(mesh, state, params, config)
        _, _, rhs = assemble_pressure_poisson(mesh, st, params)
        div = float(jnp.max(jnp.abs(rhs)))
        if div0 is None:
            div0 = div
    assert np.isfinite(np.asarray(state.u)).all()
    assert np.isfinite(np.asarray(state.p)).all()
    assert float(jnp.max(jnp.abs(state.u[:, 0]))) < 20.0
    # mass residual shrinks as the corrector loop converges the flow
    assert div < div0 * 2.0 + 1e-3


def test_assemble_pressure_matches_full_assembly():
    """assemble_pressure (the frozen-coarse entry assembly) must reproduce
    the full assembly's scalar pressure matrix exactly — same expressions in
    the same order (models/coupled.py freezes coarse AMG operators from it
    instead of running a discarded full assembly, advisor r4)."""
    from dataclasses import replace

    from cfd2_tpu.models.assembly import assemble_pressure

    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    mesh = generate_cut_cell_mesh(geo, 0.1, 0.1, 1.2, (3.5, 1.0))
    dm = encode_mesh(mesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.001)
    rng = np.random.default_rng(0)
    state = initial_state(dm, u0=np.full((dm.num_host_cells, 2), [0.1, 0.0]))
    state = prepare(dm, state, params, config)
    # Perturb d_p so the pressure Laplacian is not trivially uniform.
    state = replace(state, d_p=state.d_p *
                    jnp.asarray(rng.uniform(0.5, 2.0, dm.num_cells)
                                .astype(np.float32)))
    sys = assemble_coupled(dm, state, params, config)
    P_diag, P_off = assemble_pressure(dm, state, params)
    np.testing.assert_array_equal(np.asarray(P_diag), np.asarray(sys.P_diag))
    np.testing.assert_array_equal(np.asarray(P_off), np.asarray(sys.P_off))
