"""Auxiliary-path tests: async reader, host GMRES verification path, and
the segregated pressure-Poisson assembly."""

import numpy as np
import jax.numpy as jnp
import pytest

from cfd2_tpu.mesh import BackwardsStep, generate_cut_cell_mesh
from cfd2_tpu.models.assembly import assemble_coupled, prepare
from cfd2_tpu.models.pressure_poisson import assemble_pressure_poisson
from cfd2_tpu.ops.blockell import scalar_spmv
from cfd2_tpu.ops.host_krylov import host_gmres
from cfd2_tpu.runtime.async_reader import AsyncFieldReader
from cfd2_tpu.runtime.device_mesh import encode_mesh
from cfd2_tpu.runtime.state import SolverConfig, SolverParams, initial_state


@pytest.fixture(scope="module")
def setup():
    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.5, 1.0))
    dm = encode_mesh(mesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.001)
    state = initial_state(dm, u0=np.full((dm.num_host_cells, 2), [0.1, 0.0]))
    state = prepare(dm, state, params, config)
    return dm, state, params, config


def test_async_reader(setup):
    dm, state, params, config = setup
    r = AsyncFieldReader()
    r.start_read(state.u)
    r.start_read(state.p)
    val = r.flush()
    assert val is not None
    assert r.get_last_value().shape == state.p.shape
    r.reset()
    assert r.get_last_value() is None


def test_host_gmres_verifies_device_system(setup):
    """scipy GMRES over the device scalar SpMV solves the pressure system —
    the legacy CPU-GMRES verification role (gmres.rs)."""
    dm, state, params, config = setup
    sys = assemble_coupled(dm, state, params, config)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(dm.num_cells).astype(np.float32)
    b = b * np.asarray(dm.c_valid)

    matvec = lambda v: scalar_spmv(sys.P_diag, sys.P_off, dm,
                                   jnp.asarray(v))
    x, info = host_gmres(matvec, b, restart=60, max_restarts=50, tol=1e-6)
    rel = np.linalg.norm(np.asarray(matvec(x.astype(np.float32))) - b) \
        / np.linalg.norm(b)
    assert rel < 1e-3


def test_pressure_poisson_assembly(setup):
    """Segregated pressure-correction system: symmetric-structure Laplacian,
    zero row sums away from the outlet, RHS equals minus the divergence."""
    dm, state, params, config = setup
    diag, off, rhs = assemble_pressure_poisson(dm, state, params)
    assert np.isfinite(np.asarray(diag)).all()
    assert np.isfinite(np.asarray(rhs)).all()
    valid = np.asarray(dm.c_valid) > 0
    assert (np.asarray(diag)[valid] > 0).all()
    # Row sums: zero for interior cells (Neumann), positive at the outlet.
    ones = jnp.ones((dm.num_cells,), jnp.float32)
    rs = np.asarray(scalar_spmv(diag, off, dm, ones))
    touches_outlet = (np.asarray(
        jnp.max((dm.ck_boundary == 2) * dm.ck_mask, axis=1)) > 0) & valid
    interior = valid & ~touches_outlet
    assert np.abs(rs[interior]).max() < 1e-3 * np.abs(np.asarray(diag)).max()
    assert (rs[touches_outlet] > 0).all()
    # RHS equals the negative flux divergence (up to the non-orth term,
    # which vanishes on this orthogonal mesh).
    div = np.asarray(jnp.sum(dm.slot_fluxes(state.fluxes) * dm.ck_mask,
                             axis=1))
    assert np.abs(np.asarray(rhs) + div * valid).max() < 1e-3
