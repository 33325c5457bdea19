"""Banded-gather unit tests (ops/banded_gather.py): the Pallas kernel (in
interpret mode on CPU) must agree exactly with the plain XLA gather for
mesh-style neighbor maps, rectangular maps (restriction/prolongation), and
padded shapes."""

import numpy as np
import jax.numpy as jnp

from cfd2_tpu.ops.banded_gather import (LANES, banded_gather_nk,
                                        build_banded_map)


def _check(idx, n_src, rng):
    bm = build_banded_map(idx, n_src)
    assert bm is not None
    lane, sel, base, W = bm
    x = jnp.asarray(rng.standard_normal(n_src), jnp.float32)
    out = np.asarray(banded_gather_nk(
        x, jnp.asarray(lane), jnp.asarray(sel), jnp.asarray(base), W,
        m_out=idx.shape[0]))
    ref = np.asarray(x)[idx]
    np.testing.assert_array_equal(out, ref)
    return W


def test_mesh_style_banded_map():
    rng = np.random.default_rng(0)
    N, K, band = 1024, 5, 200
    base = np.arange(N)[:, None]
    idx = np.clip(base + rng.integers(-band, band + 1, (N, K)), 0, N - 1)
    W = _check(idx, N, rng)
    assert W <= 2 * (band // LANES + 1) + 1


def test_rectangular_map_restriction_like():
    """Coarse destinations gathering from a 3x larger fine operand."""
    rng = np.random.default_rng(1)
    nc, m = 700, 4                      # not a multiple of 128 (pads)
    n_fine = 2100
    centers = (np.arange(nc) * 3)[:, None]
    idx = np.clip(centers + rng.integers(-40, 41, (nc, m)), 0, n_fine - 1)
    _check(idx, n_fine, rng)


def test_prolongation_like_single_slot():
    rng = np.random.default_rng(2)
    n_fine, nc = 1500, 500
    agg = np.clip(np.arange(n_fine) // 3
                  + rng.integers(-2, 3, n_fine), 0, nc - 1)
    _check(agg[:, None], nc, rng)


def test_wide_band_returns_none():
    rng = np.random.default_rng(3)
    N = 2048
    idx = rng.integers(0, N, (N, 4))    # random: band ~ N
    assert build_banded_map(idx, N, w_max=8) is None


def test_tail_dims():
    rng = np.random.default_rng(4)
    N, K = 512, 3
    idx = np.clip(np.arange(N)[:, None]
                  + rng.integers(-100, 101, (N, K)), 0, N - 1)
    lane, sel, base, W = build_banded_map(idx, N)
    x = jnp.asarray(rng.standard_normal((N, 2)), jnp.float32)
    out = np.asarray(banded_gather_nk(
        x, jnp.asarray(lane), jnp.asarray(sel), jnp.asarray(base), W,
        m_out=N))
    np.testing.assert_array_equal(out, np.asarray(x)[idx])


# ---------------------------------------------------------------------------
# Two-window (multilevel) variant


def _check2(idx, n_src, rng, n_windows=3):
    from cfd2_tpu.ops.banded_gather import (banded_gather2_nk,
                                            build_banded_map2)
    bm = build_banded_map2(idx, n_src, n_windows=n_windows)
    assert bm is not None
    lane, sel, bases, W = bm
    x = jnp.asarray(rng.standard_normal(n_src), jnp.float32)
    out = np.asarray(banded_gather2_nk(
        x, jnp.asarray(lane), jnp.asarray(sel), jnp.asarray(bases), W,
        m_out=idx.shape[0]))
    np.testing.assert_array_equal(out, np.asarray(x)[idx])
    return W


def test_two_window_disjoint_bands():
    """Multilevel-style map: each block reads its own band plus a far
    second band (the parent level), far beyond single-window w_max."""
    rng = np.random.default_rng(5)
    N, K = 8192, 4
    base = np.arange(N)[:, None]
    own = np.clip(base + rng.integers(-64, 65, (N, K - 1)), 0, N - 1)
    far = np.clip(N - 1 - base // 2 + rng.integers(-64, 65, (N, 1)),
                  0, N - 1)
    idx = np.concatenate([own, far], axis=1)
    from cfd2_tpu.ops.banded_gather import build_banded_map
    assert build_banded_map(idx, N, w_max=8) is None   # 1-window fails
    _check2(idx, N, rng)


def test_two_window_three_clusters():
    """Three refinement levels: own band + finer band + coarser band."""
    rng = np.random.default_rng(6)
    N, K = 896, 5                        # pads to 1024
    base = np.arange(N)[:, None]
    c1 = np.clip(base + rng.integers(-50, 51, (N, 2)), 0, N - 1)
    c2 = np.clip(N // 3 + base // 4 + rng.integers(-50, 51, (N, 2)),
                 0, N - 1)
    c3 = np.clip(2 * N // 3 + base // 8 + rng.integers(-50, 51, (N, 1)),
                 0, N - 1)
    idx = np.concatenate([c1, c2, c3], axis=1)
    _check2(idx, N, rng)


def test_two_window_tail_dims():
    rng = np.random.default_rng(7)
    N, K = 512, 3
    idx = np.clip(np.arange(N)[:, None]
                  + rng.integers(-80, 81, (N, K)), 0, N - 1)
    from cfd2_tpu.ops.banded_gather import (banded_gather2_nk,
                                            build_banded_map2)
    lane, sel, bases, W = build_banded_map2(idx, N)
    x = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    out = np.asarray(banded_gather2_nk(
        x, jnp.asarray(lane), jnp.asarray(sel), jnp.asarray(bases), W,
        m_out=N))
    np.testing.assert_array_equal(out, np.asarray(x)[idx])


def test_two_window_span_limit_returns_none():
    from cfd2_tpu.ops.banded_gather import build_banded_map2
    rng = np.random.default_rng(8)
    N = 1024
    idx = rng.integers(0, N, (N, 4))
    assert build_banded_map2(idx, N, w_max=4) is None


# ---------------------------------------------------------------------------
# Fused coefficient dot (banded SpMV)


def test_banded_dot_matches_gather_dot():
    from cfd2_tpu.ops.banded_gather import banded_dot
    rng = np.random.default_rng(9)
    N, K = 1024, 5
    idx = np.clip(np.arange(N)[:, None]
                  + rng.integers(-150, 151, (N, K)), 0, N - 1)
    lane, sel, base, W = build_banded_map(idx, N)
    xs = [rng.standard_normal(N).astype(np.float32) for _ in range(3)]
    offs = [rng.standard_normal((N, K)).astype(np.float32)
            for _ in range(4)]
    prods = (((0, 0), (1, 2)), ((0, 1), (2, 2)), ((3, 0),))
    outs = banded_dot(tuple(jnp.asarray(x) for x in xs),
                      tuple(jnp.asarray(o) for o in offs),
                      jnp.asarray(lane), jnp.asarray(sel),
                      jnp.asarray(base), W, prods, m_out=N)
    for j, pairs in enumerate(prods):
        ref = np.zeros(N, np.float32)
        for (oi, ci) in pairs:
            ref += (offs[oi] * xs[ci][idx]).sum(axis=1)
        np.testing.assert_allclose(np.asarray(outs[j]), ref,
                                   rtol=1e-5, atol=1e-5)


def test_banded_dot_two_window_k1():
    """K=1 (prolongation-style) fused dot through the multi-window map."""
    from cfd2_tpu.ops.banded_gather import banded_dot, build_banded_map2
    rng = np.random.default_rng(10)
    n_fine, nc = 1664, 512
    agg = np.clip(np.arange(n_fine) // 3
                  + rng.integers(-2, 3, n_fine), 0, nc - 1)
    idx = agg[:, None]
    lane, sel, bases, W = build_banded_map2(idx, nc)
    x = rng.standard_normal(nc).astype(np.float32)
    off = rng.standard_normal((n_fine, 1)).astype(np.float32)
    (out,) = banded_dot((jnp.asarray(x),), (jnp.asarray(off),),
                        jnp.asarray(lane), jnp.asarray(sel),
                        jnp.asarray(bases), W, (((0, 0),),), m_out=n_fine)
    ref = (off * x[idx]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_banded_dot_nonmultiple_blocks():
    """NB not a multiple of the per-program block count (padding path)."""
    from cfd2_tpu.ops.banded_gather import banded_dot
    rng = np.random.default_rng(11)
    N, K = 3 * 128, 4
    idx = np.clip(np.arange(N)[:, None]
                  + rng.integers(-60, 61, (N, K)), 0, N - 1)
    lane, sel, base, W = build_banded_map(idx, N)
    x = rng.standard_normal(N).astype(np.float32)
    off = rng.standard_normal((N, K)).astype(np.float32)
    (out,) = banded_dot((jnp.asarray(x),), (jnp.asarray(off),),
                        jnp.asarray(lane), jnp.asarray(sel),
                        jnp.asarray(base), W, (((0, 0),),), m_out=N)
    ref = (off * x[idx]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# One-kernel multi-sweep Jacobi (banded_jacobi_sweeps)


def test_banded_jacobi_sweeps_matches_loop():
    """The fused multi-sweep kernel must reproduce the per-sweep banded_dot
    loop (ellsys._momentum_solve semantics) exactly."""
    from cfd2_tpu.ops.banded_gather import banded_dot, banded_jacobi_sweeps
    rng = np.random.default_rng(12)
    N, K = 1000, 5                       # pads to 1024 (non-multiple of 128)
    idx = np.clip(np.arange(N)[:, None]
                  + rng.integers(-150, 151, (N, K)), 0, N - 1)
    lane, sel, base, W = build_banded_map(idx, N)
    lane, sel, base = jnp.asarray(lane), jnp.asarray(sel), jnp.asarray(base)
    off = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32)) * 0.1
    dinv = jnp.asarray(1.0
                       + 0.1 * rng.standard_normal(N).astype(np.float32))
    r_u = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    r_v = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    for sweeps in (3, 8):
        z_u, z_v = banded_jacobi_sweeps((r_u, r_v), dinv, off, lane, sel,
                                        base, W, sweeps, m_out=N)
        e_u, e_v = dinv * r_u, dinv * r_v
        for _ in range(sweeps - 1):
            su, sv = banded_dot((e_u, e_v), (off,), lane, sel, base, W,
                                (((0, 0),), ((0, 1),)), m_out=N)
            e_u = dinv * (r_u - su)
            e_v = dinv * (r_v - sv)
        np.testing.assert_allclose(np.asarray(z_u), np.asarray(e_u),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(z_v), np.asarray(e_v),
                                   rtol=1e-5, atol=1e-6)


def test_banded_jacobi_sweeps_two_window():
    """Multi-window (multilevel-style) map through the fused sweep kernel."""
    from cfd2_tpu.ops.banded_gather import (banded_dot,
                                            banded_jacobi_sweeps,
                                            build_banded_map2)
    rng = np.random.default_rng(13)
    N, K = 768, 4
    # Two bands: local neighbors plus a far window (parent-level style).
    near = np.arange(N)[:, None] + rng.integers(-50, 51, (N, K - 1))
    far = (np.arange(N) // 2)[:, None] + rng.integers(-20, 21, (N, 1))
    idx = np.clip(np.concatenate([near, far], axis=1), 0, N - 1)
    bm = build_banded_map2(idx, N)
    assert bm is not None
    lane, sel, bases, W = bm
    lane, sel, bases = jnp.asarray(lane), jnp.asarray(sel), jnp.asarray(bases)
    off = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32)) * 0.1
    dinv = jnp.asarray(1.0
                       + 0.1 * rng.standard_normal(N).astype(np.float32))
    r = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    (z,) = banded_jacobi_sweeps((r,), dinv, off, lane, sel, bases, W, 4,
                                m_out=N)
    e = dinv * r
    for _ in range(3):
        (s,) = banded_dot((e,), (off,), lane, sel, bases, W, (((0, 0),),),
                          m_out=N)
        e = dinv * (r - s)
    np.testing.assert_allclose(np.asarray(z), np.asarray(e),
                               rtol=1e-5, atol=1e-6)


def test_generic_mesh_multiwindow_dispatch():
    """A generic (non-multilevel) DeviceMesh whose banded map is the
    multi-window form must gather through the bd2 planes identically to the
    plain XLA neighbor gather (runtime/device_mesh.py gather(): generic
    meshes may carry bd2 when NW*W beats the single-window span)."""
    from dataclasses import replace

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_voronoi_mesh
    from cfd2_tpu.models.coupled import CoupledSolver
    from cfd2_tpu.ops.banded_gather import build_banded_map2

    geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
    mesh = generate_voronoi_mesh(geo, 0.04, 0.04, 1.2, (3.0, 1.0), seed=3)
    dm = CoupledSolver(mesh).mesh
    assert dm.bd_W is not None
    ref = np.asarray(dm.gather(jnp.arange(dm.num_cells, dtype=jnp.float32)))

    bl2 = build_banded_map2(np.asarray(dm.ck_neighbor), dm.num_cells,
                            n_windows=2)
    assert bl2 is not None
    lane, sel, bases, W2 = bl2
    # The hand-built map covers the FULL slot range: clear the slot cap.
    dm2 = replace(dm, bd_lane=None, bd_sel=None, bd_base=None, bd_W=None,
                  bd2_lane=jnp.asarray(lane), bd2_sel=jnp.asarray(sel),
                  bd2_bases=jnp.asarray(bases), bd2_W=W2,
                  bd_k=None, bd_of_rows=None, bd_of_slots=None,
                  bd_of_src=None)
    assert dm2.banded and not dm2.multilevel
    out = np.asarray(dm2.gather(jnp.arange(dm.num_cells, dtype=jnp.float32)))
    np.testing.assert_array_equal(out, ref)


def test_slot_cap_exactness():
    """Voronoi meshes carry K=9+ slots with the 9th occupied on ~0.1% of
    cells; encode caps the banded kernel at 8 slots (one vreg per walk
    step) and carries the occupied overflow as a COO list.  gather() and
    banded_dot() must stay EXACT (pad slots hold zero coefficients — the
    assembly invariant)."""
    from cfd2_tpu.mesh import ChannelWithObstacle, generate_voronoi_mesh
    from cfd2_tpu.models.coupled import CoupledSolver

    geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
    mesh = generate_voronoi_mesh(geo, 0.02, 0.02, 1.2, (3.0, 1.0), seed=1)
    dm = CoupledSolver(mesh).mesh
    if dm.bd_k is None:                      # seed produced a K<=8 mesh
        import pytest
        pytest.skip("mesh has no capped slots")
    assert dm.bd_of_rows.shape[0] >= 1
    rng = np.random.default_rng(5)
    N, K = dm.num_cells, dm.max_faces
    ck = np.asarray(dm.ck_neighbor)
    msk = np.asarray(dm.ck_mask)
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    out = np.asarray(dm.gather(x))
    np.testing.assert_array_equal(out, np.asarray(x)[ck])
    x2 = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(dm.gather(x2)),
                                  np.asarray(x2)[ck])
    off = jnp.asarray(rng.standard_normal((N, K)) * msk, jnp.float32)
    y = jnp.asarray(rng.standard_normal(N), jnp.float32)
    o0, o1 = dm.banded_dot((x, y), (off,), (((0, 0),), ((0, 1),)))
    np.testing.assert_allclose(
        np.asarray(o0), (np.asarray(off) * np.asarray(x)[ck]).sum(1),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(o1), (np.asarray(off) * np.asarray(y)[ck]).sum(1),
        rtol=2e-5, atol=2e-5)
