"""Probe-kernel vs production-kernel on IDENTICAL inputs (294k voronoi,
single-window W=17 map): the standalone microbench measured 3.1 ms dynamic
vs 16.5 ms static, but the production `_banded_raw` dynamic path measures
~19 ms — find the structural difference.
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.probe_dyn_walk import _kernel_dyn, _kernel_static

LANES = 128
R = 8


def time_it(name, fn, *args, n_iter=20):
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n_iter):
        o = fn(*args)
    ov = o[0] if isinstance(o, (tuple, list)) else o
    float(np.asarray(ov).ravel()[0])
    print(f"  {name}: {(time.time() - t0) / n_iter * 1e3:.3f} ms")
    return np.asarray(ov)


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

    from cfd2_tpu.ops import banded_gather as bgm
    from cfd2_tpu.ops.banded_gather import _banded_raw, build_banded_map
    lane, sel, base, W, widths = build_banded_map(ck, N_dev)
    NB = lane.shape[0]
    NBt = (NB // R) * R            # probe kernels need whole grid steps
    print(f"N={N_dev} K={K} W={W} NB={NB} NBt={NBt}")

    lane_t = jnp.asarray(lane[:NBt])
    sel_t = jnp.asarray(sel[:NBt])
    base_t = jnp.asarray(base[:NBt, None])
    widths_t = jnp.asarray(widths[:NBt])
    n_rows = N_dev // LANES
    x2 = jnp.asarray(np.random.rand(n_rows, LANES).astype(np.float32))
    x1 = x2.reshape(-1)

    blk = pl.BlockSpec((R, K, LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    sm = pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((NBt, K, LANES), jnp.float32)

    f_st = jax.jit(lambda b, l, s, x: pl.pallas_call(
        partial(_kernel_static, W, K, R), grid=(NBt // R,),
        out_shape=out_shape, in_specs=[sm, blk, blk, full],
        out_specs=blk)(b, l, s, x))
    f_dy = jax.jit(lambda b, w, l, s, x: pl.pallas_call(
        partial(_kernel_dyn, W, K, R), grid=(NBt // R,),
        out_shape=out_shape, in_specs=[sm, sm, blk, blk, full],
        out_specs=blk)(b, w, l, s, x))

    o1 = time_it("probe-static ", f_st, base_t, lane_t, sel_t, x2)
    o2 = time_it("probe-dyn    ", f_dy, base_t, widths_t, lane_t, sel_t, x2)
    print("  probe diff:", np.abs(o1 - o2).max())

    # Production raw kernel on the SAME (trimmed) map.
    p_st = jax.jit(lambda x: _banded_raw(
        (x,), (), lane_t, sel_t, base_t, W)[0])
    p_dy = jax.jit(lambda x: _banded_raw(
        (x,), (), lane_t, sel_t, base_t, W, widths=widths_t)[0])
    o3 = time_it("prod-static  ", p_st, x1)
    o4 = time_it("prod-dyn     ", p_dy, x1)
    print("  prod diff vs probe:", np.abs(o3 - o1).max(),
          np.abs(o4 - o1).max())


if __name__ == "__main__":
    main()
