"""Pallas stencil kernel tests (interpret mode on CPU)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from cfd2_tpu.ops.amg import _GridOps
from cfd2_tpu.ops.pallas_stencil import rbgs_half_sweep, smooth_rbgs_pallas


def _random_system(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    n = ny * nx
    diag = jnp.asarray(rng.uniform(1, 2, n).astype(np.float32))
    off = jnp.asarray((rng.standard_normal((n, 4)) * 0.1).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    return diag, off, x, b


def test_pallas_rbgs_matches_jnp():
    ny, nx = 37, 53
    diag, off, x, b = _random_system(ny, nx)
    ops = _GridOps((ny, nx))
    ref = ops.smooth_rbgs(diag, off, x, b, sweeps=2)
    pal = smooth_rbgs_pallas((ny, nx), diag, off, x, b, sweeps=2,
                             interpret=True)
    assert float(jnp.abs(ref - pal).max()) < 1e-5


def test_pallas_half_sweep_updates_one_color_only():
    ny, nx = 16, 24
    diag, off, x, b = _random_system(ny, nx, seed=1)
    out = rbgs_half_sweep(x, diag, off, b, 0, (ny, nx), interpret=True)
    j, i = np.divmod(np.arange(ny * nx), nx)
    other_color = (j + i) % 2 == 1
    assert np.allclose(np.asarray(out)[other_color],
                       np.asarray(x)[other_color])
    same_color = ~other_color
    assert not np.allclose(np.asarray(out)[same_color],
                           np.asarray(x)[same_color])


def test_pallas_blocked_grid():
    """Grid taller than one block (exercises the DMA slab path + padding)."""
    ny, nx = 300, 128
    diag, off, x, b = _random_system(ny, nx, seed=2)
    ops = _GridOps((ny, nx))
    ref = ops.smooth_rbgs(diag, off, x, b, sweeps=1)
    pal = smooth_rbgs_pallas((ny, nx), diag, off, x, b, sweeps=1,
                             interpret=True)
    assert float(jnp.abs(ref - pal).max()) < 1e-5


def _grid_system(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    diag2 = jnp.asarray(rng.uniform(1, 2, (ny, nx)).astype(np.float32))
    off2 = jnp.asarray((rng.standard_normal((4, ny, nx)) * 0.1)
                       .astype(np.float32))
    x = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))
    return diag2, off2, x, b


def test_fused_rbgs_matches_jnp():
    """Fused-leg kernel == smooth_rbgs2 (+ spmv2 residual) elementwise."""
    from cfd2_tpu.ops.pallas_stencil import fused_rbgs2
    for ny, nx, sweeps, seed in ((37, 53, 1, 0), (37, 53, 2, 1),
                                 (16, 24, 1, 2)):
        diag2, off2, x, b = _grid_system(ny, nx, seed=seed)
        ops = _GridOps((ny, nx))
        ref_x = ops.smooth_rbgs2(diag2, off2, x, b, sweeps=sweeps)
        ref_r = b - ops.spmv2(diag2, off2, ref_x)
        pal_x, pal_r = fused_rbgs2(x, diag2, off2, b, (ny, nx),
                                   sweeps=sweeps, residual=True,
                                   interpret=True)
        assert float(jnp.abs(ref_x - pal_x).max()) < 1e-5, (ny, nx, sweeps)
        assert float(jnp.abs(ref_r - pal_r).max()) < 1e-5, (ny, nx, sweeps)
        # No-residual variant returns x alone with the same values.
        pal_x2 = fused_rbgs2(x, diag2, off2, b, (ny, nx), sweeps=sweeps,
                             interpret=True)
        assert float(jnp.abs(pal_x2 - pal_x).max()) == 0.0


def test_fused_rbgs_blocked_grid():
    """Grid spanning several row blocks: redundant-halo compute must hand
    back bitwise the single-block answer at every interior row."""
    from cfd2_tpu.ops.pallas_stencil import fused_rbgs2
    ny, nx = 300, 128
    diag2, off2, x, b = _grid_system(ny, nx, seed=3)
    ops = _GridOps((ny, nx))
    ref_x = ops.smooth_rbgs2(diag2, off2, x, b, sweeps=1)
    ref_r = b - ops.spmv2(diag2, off2, ref_x)
    pal_x, pal_r = fused_rbgs2(x, diag2, off2, b, (ny, nx), sweeps=1,
                               residual=True, interpret=True)
    assert float(jnp.abs(ref_x - pal_x).max()) < 1e-5
    assert float(jnp.abs(ref_r - pal_r).max()) < 1e-5


def test_fused_vcycle_matches_jnp(monkeypatch):
    """structured_v_cycle under CFD2_PALLAS=2 == the jnp path on a real
    structured pressure hierarchy."""
    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.assembly import assemble_stencil, prepare
    from cfd2_tpu.ops.amg import (_GridOps, _dense_factor,
                                  build_structured_hierarchy,
                                  compute_structured_level_values2,
                                  structured_v_cycle)
    from cfd2_tpu.runtime.device_mesh import encode_mesh
    from cfd2_tpu.runtime.state import (SolverConfig, SolverParams,
                                        initial_state)

    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5),
                              obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.025, 0.025, 1.2, (3.0, 1.0))
    dm = encode_mesh(mesh)
    config = SolverConfig()
    params = SolverParams.default(dt=0.005)
    state = initial_state(dm, u0=np.full((dm.num_host_cells, 2),
                                         [0.1, 0.0]))
    state = prepare(dm, state, params, config)
    ss = assemble_stencil(dm, state, params, config)
    hier = build_structured_hierarchy(dm)
    assert hier is not None
    lv2 = compute_structured_level_values2(hier, ss.P_diag2, ss.P_off2)
    dc, oc = lv2[-1]
    fac = _dense_factor(dc.reshape(-1),
                        jnp.moveaxis(oc.reshape(4, -1), 0, 1),
                        _GridOps(hier.levels[-1].grid).neighbor_cols())
    ny, nx = dm.grid_shape
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(ny * nx).astype(np.float32))
    x0 = jnp.zeros(ny * nx, jnp.float32)
    ref = structured_v_cycle(hier, lv2, b, x0, coarse_factors=fac)
    monkeypatch.setenv("CFD2_PALLAS", "2")
    fused = structured_v_cycle(hier, lv2, b, x0, coarse_factors=fac)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(ref - fused).max()) < 1e-5 * max(scale, 1.0)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Mosaic lowering needs real TPU "
                           "(suite forces CPU unless RUN_FINE_MESH=1)")
def test_fused_rbgs_compiled_tpu():
    """Advisor r4: the interpret=True parity tests never exercise the actual
    Mosaic lowering (sublane-offset output slice, DMA slab alignment).  On a
    real TPU, the compiled kernel must match the jnp path elementwise on
    both a single-block and a multi-block grid."""
    from cfd2_tpu.ops.pallas_stencil import fused_rbgs2
    for ny, nx, sweeps, seed in ((37, 53, 2, 0), (300, 128, 1, 3)):
        diag2, off2, x, b = _grid_system(ny, nx, seed=seed)
        ops = _GridOps((ny, nx))
        ref_x = ops.smooth_rbgs2(diag2, off2, x, b, sweeps=sweeps)
        ref_r = b - ops.spmv2(diag2, off2, ref_x)
        pal_x, pal_r = fused_rbgs2(x, diag2, off2, b, (ny, nx),
                                   sweeps=sweeps, residual=True,
                                   interpret=False)
        assert float(jnp.abs(ref_x - pal_x).max()) < 1e-5, (ny, nx)
        assert float(jnp.abs(ref_r - pal_r).max()) < 1e-5, (ny, nx)
