"""Pallas stencil kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

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
