"""Microbench: static unrolled banded walk vs dynamic per-block fori_loop.

The grouped banded map's static walk burns max-over-blocks steps on every
block; a scalar-bounded fori_loop walks each block's own span (mean ~half
the max on voronoi meshes).  This probe times both kernel shapes on the
real TPU over the cached 294k voronoi map to decide whether Mosaic's
dynamic-loop overhead eats the saved steps.
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

LANES = 128
R = 8


def _kernel_static(W, K, R, bases_ref, lane_ref, sel_ref, x_ref, o_ref):
    for r in range(R):
        lanes = lane_ref[r]
        selv = sel_ref[r]
        acc = jnp.zeros((K, LANES), jnp.float32)
        bw = bases_ref[r, 0]
        for s in range(W):
            src = x_ref[pl.ds(bw + s, 1), :]
            srcb = jnp.broadcast_to(src, (K, LANES))
            g = jnp.take_along_axis(srcb, lanes, axis=1)
            acc = acc + jnp.where(selv == s, g, 0.0)
        o_ref[r] = acc


def _kernel_dyn(W, K, R, bases_ref, widths_ref, lane_ref, sel_ref, x_ref,
                o_ref):
    for r in range(R):
        lanes = lane_ref[r]
        selv = sel_ref[r]
        bw = bases_ref[r, 0]
        nw = widths_ref[r, 0]

        def body(s, acc):
            src = x_ref[pl.ds(bw + s, 1), :]
            srcb = jnp.broadcast_to(src, (K, LANES))
            g = jnp.take_along_axis(srcb, lanes, axis=1)
            return acc + jnp.where(selv == s, g, 0.0)

        o_ref[r] = jax.lax.fori_loop(
            0, nw, body, jnp.zeros((K, LANES), jnp.float32))


def run(ck, N_dev, n_iter=50):
    NB = ck.shape[0] // LANES
    NB = (NB // R) * R           # probe only: whole grid steps
    ck = ck[:NB * LANES]
    K = ck.shape[1]
    n_rows = N_dev // LANES
    sb = (ck // LANES).reshape(NB, LANES, K)
    lane = (ck % LANES).reshape(NB, LANES, K).astype(np.int32)
    lo = sb.min(axis=(1, 2))
    hi = sb.max(axis=(1, 2))
    W = int((hi - lo).max()) + 1
    # Dynamic bounds never read past the block's own hi, so base needs no
    # end-of-operand clamp (the static kernel keeps it for bounds safety —
    # here both kernels share the unclamped map and W <= n_rows holds).
    assert W <= n_rows
    base = lo.astype(np.int32)
    sel = (sb - base[:, None, None]).astype(np.int32)
    widths = (hi - lo + 1).astype(np.int32)
    lane = np.ascontiguousarray(lane.transpose(0, 2, 1))
    sel = np.ascontiguousarray(sel.transpose(0, 2, 1))
    print(f"N={N_dev} K={K} W={W} mean width={widths.mean():.1f}")

    x = jnp.asarray(np.random.rand(n_rows, LANES).astype(np.float32))
    laned = jnp.asarray(lane)
    seld = jnp.asarray(sel)
    based = jnp.asarray(base[:, None])
    widthsd = jnp.asarray(widths[:, None])

    blk = pl.BlockSpec((R, K, LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    sm = pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((NB, K, LANES), jnp.float32)

    f_st = jax.jit(lambda b, l, s, x: pl.pallas_call(
        partial(_kernel_static, W, K, R), grid=(NB // R,),
        out_shape=out_shape, in_specs=[sm, blk, blk, full],
        out_specs=blk)(b, l, s, x))
    f_dy = jax.jit(lambda b, w, l, s, x: pl.pallas_call(
        partial(_kernel_dyn, W, K, R), grid=(NB // R,),
        out_shape=out_shape, in_specs=[sm, sm, blk, blk, full],
        out_specs=blk)(b, w, l, s, x))

    o1 = f_st(based, laned, seld, x)
    o2 = f_dy(based, widthsd, laned, seld, x)
    print("max |diff| =", float(jnp.max(jnp.abs(o1 - o2))))

    for name, fn, args in (("static", f_st, (based, laned, seld, x)),
                           ("dynamic", f_dy,
                            (based, widthsd, laned, seld, x))):
        fn(*args).block_until_ready()
        t0 = time.time()
        for _ in range(n_iter):
            o = fn(*args)
        float(o[0, 0, 0])   # value read: a real sync through the tunnel
        dt = (time.time() - t0) / n_iter
        gb = (NB * K * LANES * 4) / dt / 1e9
        print(f"  {name}: {dt*1e3:.3f} ms ({gb:.1f} GB/s out)")


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
    run(ck, N_dev)


if __name__ == "__main__":
    main()
