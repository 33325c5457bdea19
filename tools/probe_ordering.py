"""Compare cell orderings for the banded gather: RCM vs geometric sweeps.

The banded kernel's walk cost is set by how many 128-row source windows a
destination block's neighbors span.  For a quasi-uniform 2D mesh over a
3x1 channel the optimal cut is ~one column of cells (sqrt(N/3)), so the
achievable W is ~ceil(2*sqrt(N/3)/128)+1; measured RCM gives 2-4x that on
voronoi meshes.  This probe builds the real adjacency once (cached npz)
and reports the banded-map costs under candidate orderings.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

CACHE = "/tmp/probe_ordering_{}.npz"
LANES = 128


def load_mesh(mt="voronoi", h=0.0025):
    path = CACHE.format(f"{mt}_{h}")
    if os.path.exists(path):
        d = np.load(path)
        return d["owner"], d["neigh"], d["cx"], d["cy"]
    from cfd2_tpu.mesh import (ChannelWithObstacle, generate_delaunay_mesh,
                               generate_voronoi_mesh)
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    gen = {"voronoi": generate_voronoi_mesh,
           "delaunay": generate_delaunay_mesh}[mt]
    mesh = gen(geo, h, h, 1.2, (3.0, 1.0))
    internal = mesh.face_neighbor >= 0
    owner = mesh.face_owner[internal].astype(np.int64)
    neigh = mesh.face_neighbor[internal].astype(np.int64)
    np.savez(path, owner=owner, neigh=neigh,
             cx=mesh.cell_cx, cy=mesh.cell_cy)
    return owner, neigh, mesh.cell_cx, mesh.cell_cy


def ell_from_rank(owner, neigh, rank, N):
    """(N_dev, K) sorted-slot neighbor map under ordering ``rank``."""
    N_dev = ((N + 127) // 128) * 128
    o = rank[owner]
    n = rank[neigh]
    ii = np.concatenate([o, n])
    jj = np.concatenate([n, o])
    order = np.lexsort((jj, ii))
    ii, jj = ii[order], jj[order]
    counts = np.bincount(ii, minlength=N_dev)
    K = int(counts.max())
    start = np.zeros(N_dev + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    slot = np.arange(len(ii)) - start[ii]
    ck = np.tile(np.arange(N_dev, dtype=np.int64)[:, None], (1, K))
    ck[ii, slot] = jj
    occ = np.zeros((N_dev, K), bool)
    occ[ii, slot] = True
    ffi = np.maximum.accumulate(np.where(occ, np.arange(K)[None, :], 0),
                                axis=1)
    ck = np.take_along_axis(ck, ffi, axis=1)
    return ck, N_dev


def report(tag, ck, N_dev):
    """Costs in vreg-gather units (production model: banded_gather
    .window_cost / grouped_cost)."""
    from cfd2_tpu.ops.banded_gather import (build_banded_map,
                                            build_banded_map2,
                                            build_banded_map_grouped,
                                            grouped_cost, window_cost)
    K = ck.shape[1]
    r = build_banded_map(ck, N_dev, w_max=200)
    c1 = window_cost(r[3], K) if r else None
    best2 = None
    for nw in (2, 3, 4):
        r2 = build_banded_map2(ck, N_dev, w_max=200, n_windows=nw)
        if r2 and (best2 is None or window_cost(r2[3], K, nw) < best2):
            best2 = window_cost(r2[3], K, nw)
    rg = build_banded_map_grouped(ck, N_dev, w_max=200)
    cg = grouped_cost(rg[3]) if rg else None
    print(f"  {tag}: K={K} W={r[3] if r else '>200'} "
          f"vreg costs window={c1} multi={best2} grouped={cg}"
          f" wgs={rg[3][0] if rg else None}")


def main():
    for mt, h in (("voronoi", 0.0025), ("delaunay", 0.003)):
        owner, neigh, cx, cy = load_mesh(mt, h)
        N = len(cx)
        print(f"{mt} {h}: N={N} ideal column ~{(N/3)**.5:.0f} cells"
              f" -> W~{int(2*(N/3)**.5/128)+2}")
        # RCM (current)
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
        report("rcm", *ell_from_rank(owner, neigh, rank, N))
        # Geometric column sweep: bucket x by the mean spacing, sort by
        # (bucket, y).  Neighbors live within +-1 bucket.
        for bw_mult in (1.0, 2.0, 4.0):
            hx = bw_mult * 3.0 / max(np.sqrt(N * 3.0), 1)
            bx = np.floor(cx / hx).astype(np.int64)
            order = np.lexsort((cy, bx))
            rank = np.empty(N, np.int64)
            rank[order] = np.arange(N)
            report(f"colsweep x{bw_mult}", *ell_from_rank(owner, neigh,
                                                          rank, N))
        # Boustrophedon: alternate y direction per column (halves the jump
        # between adjacent columns' ends).
        hx = 2.0 * 3.0 / max(np.sqrt(N * 3.0), 1)
        bx = np.floor(cx / hx).astype(np.int64)
        ys = np.where(bx % 2 == 0, cy, -cy)
        order = np.lexsort((ys, bx))
        rank = np.empty(N, np.int64)
        rank[order] = np.arange(N)
        report("boustrophedon x2", *ell_from_rank(owner, neigh, rank, N))


if __name__ == "__main__":
    main()
