"""Where does the dynamic per-block walk actually win?

probe_dyn_prod measured the voronoi 294k map (mean width 10.7, W=17):
production dynamic LOSES (24.4 vs 18.0 ms) — fori_loop trip overhead plus
lost cross-step scheduling eats the 1.6x step saving.  This probe times the
production kernels across width-variability regimes at fixed N to find the
mean_width/W threshold below which the dynamic walk pays:

  uniform      mean/W ~ 1.0   (voronoi-like; expect static wins)
  mixed        mean/W ~ 0.25  (1 of 8 blocks wide — refined-mesh-like)
  spike        mean/W ~ 0.06  (one wide block in the whole map)
  two-window   multilevel map with mostly-empty second windows
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cfd2_tpu.ops.banded_gather import (LANES, banded_dot, banded_gather_nk,
                                        build_banded_map, build_banded_map2)


def time_case(name, fn, x):
    o = fn(x)
    ov = o[0] if isinstance(o, (tuple, list)) else o
    float(np.asarray(ov).ravel()[0])
    t0 = time.time()
    n_iter = 30
    for _ in range(n_iter):
        o = fn(x)
    ov = o[0] if isinstance(o, (tuple, list)) else o
    float(np.asarray(ov).ravel()[0])
    dt = (time.time() - t0) / n_iter * 1e3
    print(f"    {name}: {dt:.3f} ms")
    return dt


def single_window_case(label, N, K, spread_fn, rng):
    base = np.arange(N)[:, None]
    spread = spread_fn(np.arange(N))[:, None]
    idx = np.clip(base + rng.integers(-1, 2, (N, K)) * spread
                  + rng.integers(-60, 61, (N, K)), 0, N - 1)
    bm = build_banded_map(idx, N, w_max=64)
    if bm is None:
        print(f"  {label}: no banded map (span too wide)")
        return
    lane, sel, b, W, widths = bm
    print(f"  {label}: W={W} mean_width={widths.mean():.1f} "
          f"ratio={widths.mean() / W:.2f}")
    lane, sel, b, widths = map(jnp.asarray, (lane, sel, b, widths))
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    off = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))
    st = jax.jit(lambda x: banded_gather_nk(x, lane, sel, b, W, m_out=N))
    dy = jax.jit(lambda x: banded_gather_nk(x, lane, sel, b, W, m_out=N,
                                            widths=widths))
    st_d = jax.jit(lambda x: banded_dot((x,), (off,), lane, sel, b, W,
                                        (((0, 0),),), m_out=N))
    dy_d = jax.jit(lambda x: banded_dot((x,), (off,), lane, sel, b, W,
                                        (((0, 0),),), m_out=N,
                                        widths=widths))
    a = time_case("gather static ", st, x)
    c = time_case("gather dynamic", dy, x)
    e = time_case("dot static    ", st_d, x)
    f = time_case("dot dynamic   ", dy_d, x)
    print(f"    -> gather dyn/static = {c / a:.2f}  dot dyn/static = "
          f"{f / e:.2f}")


def two_window_case(label, N, K, rng):
    """Most blocks touch only their own band (window 2 empty); a minority
    also reach a far band — the multilevel refined-mesh shape."""
    base = np.arange(N)[:, None]
    near = np.clip(base + rng.integers(-90, 91, (N, K)), 0, N - 1)
    far_rows = (np.arange(N) // LANES) % 6 == 0
    far = np.clip(base + N // 3 + rng.integers(-90, 91, (N, K)), 0, N - 1)
    idx = np.where(far_rows[:, None], far, near)
    idx[:, 0] = near[:, 0]          # keep one near slot everywhere
    bm = build_banded_map2(idx, N, w_max=32, n_windows=2)
    if bm is None:
        print(f"  {label}: no two-window map")
        return
    lane, sel, bases, W, widths = bm
    print(f"  {label}: W={W} NW=2 mean_widths={widths.mean(axis=0)} "
          f"empty_w2={float((widths[:, 1] == 0).mean()):.2f}")
    lane, sel, bases, widths = map(jnp.asarray, (lane, sel, bases, widths))
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    st = jax.jit(lambda x: banded_gather_nk(x, lane, sel, bases, W,
                                            m_out=N))
    dy = jax.jit(lambda x: banded_gather_nk(x, lane, sel, bases, W,
                                            m_out=N, widths=widths))
    a = time_case("gather static ", st, x)
    c = time_case("gather dynamic", dy, x)
    print(f"    -> gather dyn/static = {c / a:.2f}")


def main():
    rng = np.random.default_rng(7)
    N, K = 512 * 1024, 7
    print("single-window regimes:")
    single_window_case("uniform(1600)", N, K,
                       lambda i: np.full_like(i, 1600), rng)
    single_window_case("mixed(1/8 wide)", N, K,
                       lambda i: np.where((i // LANES) % 8 == 0, 1600, 90),
                       rng)
    single_window_case("spike(1/64 wide)", N, K,
                       lambda i: np.where((i // LANES) % 64 == 0, 1600, 90),
                       rng)
    print("two-window multilevel shape:")
    two_window_case("2win(1/6 far)", N, K, rng)


if __name__ == "__main__":
    main()
