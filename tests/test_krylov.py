"""CG / BiCGStab / block-Jacobi alternate-path tests (reference
linear_solver.wgsl + preconditioner.wgsl parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cfd2_tpu.mesh import BackwardsStep, generate_cut_cell_mesh
from cfd2_tpu.models.assembly import assemble_coupled, prepare
from cfd2_tpu.models.coupled import CoupledSolver
from cfd2_tpu.ops.blockell import scalar_spmv
from cfd2_tpu.ops.krylov import bicgstab_solve, cg_solve
from cfd2_tpu.runtime.device_mesh import encode_mesh
from cfd2_tpu.runtime.state import (
    PRECOND_BLOCK_JACOBI,
    SolverConfig,
    SolverParams,
    initial_state,
)


@pytest.fixture(scope="module")
def pressure_system():
    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.5, 1.0))
    dm = encode_mesh(mesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.001)
    state = initial_state(dm, u0=np.full((dm.num_host_cells, 2), [0.1, 0.0]))
    state = prepare(dm, state, params, config)
    sys = assemble_coupled(dm, state, params, config)
    return dm, sys


def test_cg_on_pressure_system(pressure_system):
    dm, sys = pressure_system
    matvec = lambda x: scalar_spmv(sys.P_diag, sys.P_off, dm, x)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(dm.num_cells).astype(np.float32))
    b = b * dm.c_valid
    dinv = sys.diag_p_inv
    res = cg_solve(matvec, b, jnp.zeros_like(b), precond=lambda r: dinv * r,
                   max_iters=2000, tol=1e-5)
    assert bool(res.converged)
    rel = float(jnp.linalg.norm(b - matvec(res.x)) / jnp.linalg.norm(b))
    assert rel < 1e-4


def test_bicgstab_on_pressure_system(pressure_system):
    dm, sys = pressure_system
    matvec = lambda x: scalar_spmv(sys.P_diag, sys.P_off, dm, x)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(dm.num_cells).astype(np.float32))
    b = b * dm.c_valid
    dinv = sys.diag_p_inv
    res = bicgstab_solve(matvec, b, jnp.zeros_like(b),
                         precond=lambda r: dinv * r,
                         max_iters=2000, tol=1e-5)
    rel = float(jnp.linalg.norm(b - matvec(res.x)) / jnp.linalg.norm(b))
    assert rel < 1e-3


def test_block_jacobi_preconditioned_step():
    """The block-Jacobi alternate preconditioner path runs and stays finite
    (2 steps, like the scheme-matrix contract)."""
    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    mesh = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.5, 1.0))
    s = CoupledSolver(mesh)
    s.set_precond_type(PRECOND_BLOCK_JACOBI)
    s.set_dt(0.001)
    s.set_u(np.full((mesh.num_cells, 2), [0.1, 0.0]))
    s.set_alpha_u(0.9)
    s.set_alpha_p(0.9)
    for _ in range(2):
        s.step()
    assert np.isfinite(s.get_u()).all()
    assert np.isfinite(s.get_p()).all()
