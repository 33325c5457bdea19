"""Multilevel (locally-refined quadtree) fast path.

The reference runs refined cut-cell meshes through its one GPU path at full
speed (src/solver/mesh/quadtree.rs:24-60, cut_cell.rs:48-105).  Here refined
meshes get their own device layout — one (ny, nx) grid per refinement level,
neighbor access by per-level shifts plus a tiny gather/scatter for the
cross-level (hanging-node) faces.  These tests pin:

* quadtree provenance metadata from the mesher,
* exact gather parity with the generic (ck_neighbor) encoding,
* slot-flux conservation (mirrors + direct cross-level evaluation),
* solver-level agreement with the generic path over several steps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
from cfd2_tpu.models.coupled import CoupledSolver
from cfd2_tpu.runtime.device_mesh import encode_mesh


@pytest.fixture(scope="module")
def refined():
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.02, 0.04, 1.2, (3.0, 1.0))
    return geo, mesh


def test_quadtree_metadata(refined):
    _, mesh = refined
    assert mesh.cell_level is not None
    counts = np.bincount(mesh.cell_level)
    assert len(counts) >= 2 and (counts > 0).all()
    # Every cell center lies inside its claimed leaf square.
    h0 = 0.02
    sz = h0 * (2.0 ** mesh.cell_level)
    x0 = mesh.cell_gi * sz
    y0 = mesh.cell_gj * sz
    assert ((mesh.cell_cx >= x0 - 1e-9) & (mesh.cell_cx <= x0 + sz + 1e-9)
            & (mesh.cell_cy >= y0 - 1e-9)
            & (mesh.cell_cy <= y0 + sz + 1e-9)).all()


def test_multilevel_encoding_and_gather_parity(refined):
    _, mesh = refined
    dm = encode_mesh(mesh)
    dg = encode_mesh(mesh, structured="never")
    assert dm.multilevel and not dm.structured
    assert len(dm.ml_levels) >= 2
    assert int(dm.ml_exc_cell.shape[0]) > 0

    rng = np.random.default_rng(0)
    xh = rng.standard_normal(mesh.num_cells).astype(np.float32)
    xml = dm.from_host_order(jnp.asarray(xh))
    np.testing.assert_allclose(np.asarray(dm.to_host_order(xml)), xh)

    g_ml = np.asarray(dm.gather(xml))
    g_g = np.asarray(dg.gather(dg.from_host_order(jnp.asarray(xh))))

    def facemap(dev, g):
        out = {}
        ck_face = np.asarray(dev.ck_face)
        ck_mask = np.asarray(dev.ck_mask)
        ck_sign = np.asarray(dev.ck_sign)
        ck_int = 1.0 - np.asarray(dev.ck_is_boundary)
        N, K = ck_face.shape
        for c in range(N):
            for k in range(K):
                if ck_mask[c, k] > 0 and ck_int[c, k] > 0:
                    out[(ck_face[c, k], ck_sign[c, k])] = g[c, k]
        return out

    f_ml = facemap(dm, g_ml)
    f_g = facemap(dg, g_g)
    assert set(f_ml) == set(f_g)
    assert max(abs(f_ml[k] - f_g[k]) for k in f_g) == 0.0


def test_slot_flux_conservation(refined):
    """Internal slot fluxes must be (near-)antisymmetric across each face:
    summing both sides' outward values over all internal entries ~ 0."""
    _, mesh = refined
    from cfd2_tpu.models.assembly import prepare
    from cfd2_tpu.runtime.state import (SolverConfig, SolverParams,
                                        initial_state)
    dm = encode_mesh(mesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.005)
    rng = np.random.default_rng(1)
    u0 = rng.standard_normal((mesh.num_cells, 2)) * 0.1
    state = initial_state(dm, u0=u0)
    state = jax.jit(prepare, static_argnames=("config",))(
        dm, state, params, config)
    flux = np.asarray(state.fluxes)          # (N, K) outward
    ck_face = np.asarray(dm.ck_face)
    sel = (np.asarray(dm.ck_mask) > 0) & (np.asarray(dm.ck_is_boundary) == 0)
    sums = np.zeros(dm.num_faces)
    np.add.at(sums, ck_face[sel], flux[sel])
    scale = np.abs(flux[sel]).max()
    # EXACT antisymmetry: mirrored same-level faces by shift, hanging /
    # non-mirrored faces by the owner-side scatter (ml_pair_*).
    assert np.abs(sums).max() == 0.0, \
        f"max face-sum {np.abs(sums).max():.2e} (scale {scale:.2e})"


def test_multilevel_fine_grid_amg(refined):
    """The fine-grid-embedded multigrid preconditioner (MultilevelAmg) must
    match the chebyshev path's FGMRES iteration count, and its per-apply
    action must leave hole components untouched (identity rows)."""
    _, mesh = refined
    from cfd2_tpu.models.assembly import assemble_coupled, prepare
    from cfd2_tpu.ops.amg import (MultilevelAmg, build_hierarchy_for_mesh,
                                  make_pressure_solve)
    from cfd2_tpu.ops.blockell import block_spmv
    from cfd2_tpu.ops.fgmres import fgmres_solve
    from cfd2_tpu.ops.schur import schur_preconditioner
    from cfd2_tpu.runtime.state import (SolverConfig, SolverParams,
                                        initial_state)
    dm = encode_mesh(mesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.005)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < 0.04, 0] = 1.0
    state = initial_state(dm, u0=u0)
    state = jax.jit(prepare, static_argnames=("config",))(
        dm, state, params, config)
    sys_ = assemble_coupled(dm, state, params, config)
    hier = build_hierarchy_for_mesh(dm)
    assert isinstance(hier, MultilevelAmg)
    ps = make_pressure_solve(hier, dm, sys_,
                             coeff=params.density * state.d_p)

    # Identity on holes.
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal(dm.num_cells).astype(np.float32))
    z = np.asarray(ps(r))
    holes = np.asarray(dm.c_valid) == 0
    np.testing.assert_allclose(z[holes], np.asarray(r)[holes], rtol=0, atol=0)

    nsw = config.pressure_sweeps(dm.num_cells)
    x0 = jnp.concatenate([state.u, state.p[:, None]], axis=1)
    mv = lambda x: block_spmv(sys_, dm, x)
    iters = {}
    for tag, psolve in [("amg", ps), ("cheb", None)]:
        pc = lambda rr: schur_preconditioner(
            sys_, dm, rr, config.precond_omega, nsw, pressure_solve=psolve)
        res = fgmres_solve(mv, pc, sys_.rhs, x0, restart=50,
                           max_restarts=20, tol=1e-5, abstol=1e-7)
        assert bool(res.converged)
        iters[tag] = int(res.iterations)
    assert iters["amg"] <= 2 * iters["cheb"], iters


def test_multilevel_solver_matches_generic(refined):
    _, mesh = refined
    results = {}
    for tag, structured in [("ml", "auto"), ("gen", "never")]:
        dm = encode_mesh(mesh, structured=structured)
        if tag == "ml":
            assert dm.multilevel
        s = CoupledSolver.__new__(CoupledSolver)
        s.host_mesh = mesh
        s.mesh = dm
        from cfd2_tpu.runtime.state import (SolverConfig, SolverParams,
                                            initial_state)
        # Strict outer policy: this is an encoding-parity test, and the
        # accelerated outer loop (alpha ramp / plateau exit) amplifies
        # path-rounding differences between the two encodings.
        s.config = SolverConfig(alpha_u_final=0.0, outer_pressure_patience=0)
        s.params = SolverParams.default()
        s.state = initial_state(s.mesh)
        s._amg = None
        s.set_dt(0.005)
        s.set_viscosity(0.01)
        s.set_density(1.0)
        u0 = np.zeros((mesh.num_cells, 2))
        u0[mesh.cell_cx < 0.04, 0] = 1.0
        s.set_u(u0)
        for _ in range(5):
            s.step()
        results[tag] = (s.get_u(), s.get_p())
    u_ml, p_ml = results["ml"]
    u_g, p_g = results["gen"]
    assert np.isfinite(u_ml).all() and np.isfinite(p_ml).all()
    du = np.abs(u_ml - u_g).max()
    dp = np.abs(p_ml - p_g).max()
    assert du < 2e-3 * max(np.abs(u_g).max(), 1.0)
    assert dp < 2e-3 * max(np.abs(p_g).max(), 1.0)
