"""Executable-level compile persistence (runtime/aot_cache.py).

The JAX persistent cache misses Pallas/Mosaic compiles through the remote
tunnel; the AOT cache serializes whole PJRT executables so a second process
skips compilation entirely.  These tests exercise the mechanism on the CPU
backend (serialize/deserialize round-trip + key stability + solver hook)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd2_tpu.runtime.aot_cache import cached_compile


def test_roundtrip_and_hit(tmp_path):
    d = str(tmp_path)

    @jax.jit
    def f(x, y):
        return x @ y + 1.0

    x = jnp.ones((8, 8))
    y = jnp.full((8, 8), 2.0)
    c1 = cached_compile(f, x, y, cache_dir=d)
    files = [p for p in os.listdir(d) if p.endswith(".pjrt")]
    if not files:
        pytest.skip("backend cannot serialize executables")
    out1 = np.asarray(c1(x, y))

    # Second call must load the stored executable (same key), not recompile.
    c2 = cached_compile(f, x, y, cache_dir=d)
    out2 = np.asarray(c2(x, y))
    np.testing.assert_array_equal(out1, out2)
    assert len([p for p in os.listdir(d) if p.endswith(".pjrt")]) == 1


def test_key_varies_with_shape_and_static(tmp_path):
    d = str(tmp_path)
    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def f(x, k):
        return x * k

    cached_compile(f, jnp.ones((4,)), k=2, cache_dir=d)
    cached_compile(f, jnp.ones((8,)), k=2, cache_dir=d)
    cached_compile(f, jnp.ones((4,)), k=3, cache_dir=d)
    files = [p for p in os.listdir(d) if p.endswith(".pjrt")]
    if not files:
        pytest.skip("backend cannot serialize executables")
    assert len(files) == 3


def test_solver_step_under_aot_cache(tmp_path, monkeypatch):
    """CoupledSolver.step with CFD2_AOT_CACHE matches the plain jit path."""
    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.coupled import CoupledSolver

    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, 0.1, 0.1, 1.2, (3.0, 1.0))

    def make():
        s = CoupledSolver(mesh)
        s.set_dt(0.01)
        s.set_viscosity(0.01)
        u0 = np.zeros((mesh.num_cells, 2), np.float32)
        u0[np.asarray(mesh.cell_cx) < 0.1, 0] = 1.0
        s.set_u(u0)
        return s

    a = make()
    for _ in range(2):
        a.step()
    monkeypatch.setenv("CFD2_AOT_CACHE", "1")
    monkeypatch.setenv("CFD2_AOT_CACHE_DIR", str(tmp_path))
    import cfd2_tpu.runtime.aot_cache as ac
    monkeypatch.setattr(ac, "DEFAULT_DIR", str(tmp_path))
    b = make()
    for _ in range(2):
        b.step()
    np.testing.assert_allclose(a.get_u(), b.get_u(), rtol=0, atol=0)

    # One entry cached; a third solver reuses it byte-for-byte.
    c = make()
    for _ in range(2):
        c.step()
    np.testing.assert_array_equal(np.asarray(b.state.u), np.asarray(c.state.u))
