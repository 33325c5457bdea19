"""Time the PRODUCTION banded kernels (banded_gather_nk) over the cached
294k voronoi map in all four (map, walk) configurations:

  single-window static | single-window dynamic | grouped static | grouped dyn

to locate the 8.6x step regression seen after enabling the grouped map +
dynamic walk on this mesh (wgs=(17,17,17,9) — the sorted slots are NOT
narrow here, unlike the smaller voronoi meshes the grouped map was built
for).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    d = np.load("/tmp/probe_ordering_voronoi_0.0025.npz")
    owner, neigh, cx = d["owner"], d["neigh"], d["cx"]
    N = len(cx)
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    adj = sp.csr_matrix(
        (np.ones(2 * len(owner)),
         (np.concatenate([owner, neigh]), np.concatenate([neigh, owner]))),
        shape=(N, N))
    perm = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True),
                      dtype=np.int64)
    rank = np.empty(N, np.int64)
    rank[perm] = np.arange(N)
    from tools.probe_ordering import ell_from_rank
    ck, N_dev = ell_from_rank(owner, neigh, rank, N)
    K = ck.shape[1]

    from cfd2_tpu.ops.banded_gather import (banded_gather_nk,
                                            build_banded_map,
                                            build_banded_map_grouped,
                                            grouped_cost)
    bl = build_banded_map(ck, N_dev)
    lane, sel, base, W, widths = bl
    blg = build_banded_map_grouped(ck, N_dev)
    lg, sg, bg, wgs, widg = blg
    print(f"N={N_dev} K={K} W={W} wgs={wgs[0]} bounds={wgs[1]}")
    print(f"cost single={W * K} grouped={grouped_cost(wgs)} "
          f"mean width single={widths.mean():.1f} "
          f"mean widths grouped={widg.mean(axis=0)}")

    x = jnp.asarray(np.random.rand(N_dev).astype(np.float32))
    # Pre-stage all index planes on device (in production they live in the
    # DeviceMesh pytree; converting inside the timed loop would measure the
    # host->device tunnel, not the kernel).
    lane_d, sel_d, base_d, widths_d = map(jnp.asarray,
                                          (lane, sel, base, widths))
    lg_d, sg_d, bg_d, widg_d = map(jnp.asarray, (lg, sg, bg, widg))
    jax.block_until_ready((lane_d, lg_d))
    # One jit per case: production calls these inside the step jit, so the
    # wrapper's reshape/transpose must not dispatch eagerly here.
    cases = {
        "single-static": jax.jit(lambda x: banded_gather_nk(
            x, lane_d, sel_d, base_d, W, m_out=N_dev)),
        "single-dyn": jax.jit(lambda x: banded_gather_nk(
            x, lane_d, sel_d, base_d, W, m_out=N_dev, widths=widths_d)),
        "grouped-static": jax.jit(lambda x: banded_gather_nk(
            x, lg_d, sg_d, bg_d, W, m_out=N_dev, wgs=wgs)),
        "grouped-dyn": jax.jit(lambda x: banded_gather_nk(
            x, lg_d, sg_d, bg_d, W, m_out=N_dev, wgs=wgs, widths=widg_d)),
    }
    cases = {k: (lambda fn=fn: fn(x)) for k, fn in cases.items()}
    ref = None
    for name, fn in cases.items():
        o = fn()
        o = np.asarray(o)
        if ref is None:
            ref = o
        else:
            print(f"  {name}: max|diff| = {np.abs(o - ref).max()}")
        t0 = time.time()
        n_iter = 20
        for _ in range(n_iter):
            o2 = fn()
        float(np.asarray(o2)[0, 0])   # value read: real sync
        dt = (time.time() - t0) / n_iter
        print(f"  {name}: {dt * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
