"""Estimate the win from per-slot sorted windows in the banded gather.

Current kernel cost per destination block ~ NW * W masked steps, each doing a
(K, LANES) gather.  If each cell's slots are sorted by neighbor device id
(legal on the generic path: slot order is arbitrary CSR order), slot k holds
the k-th smallest source row, so per-(block, slot) spans collapse.  This
probe reports, for a real voronoi/delaunay mesh:

  * the current best map cost  min(W_single, min_nw nw * W_nw) * K
  * sorted per-slot:  sum_k W_k      (k-major walk, one slot per step)
  * sorted slot-pairs: 2 * sum_pairs W_pair  (gather two slots per step)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from cfd2_tpu.mesh import (ChannelWithObstacle, generate_delaunay_mesh,
                           generate_voronoi_mesh)
from cfd2_tpu.runtime.device_mesh import encode_mesh

LANES = 128


def span_stats(idx, NB):
    sb = (idx // LANES).reshape(NB, LANES, -1)
    K = sb.shape[2]
    # unsorted single window
    W_single = int((sb.max(axis=(1, 2)) - sb.min(axis=(1, 2))).max()) + 1
    # sorted slots
    ss = np.sort(sb, axis=2)
    spans = ss.max(axis=1) - ss.min(axis=1) + 1          # (NB, K)
    per_slot = int(spans.max(axis=0).sum())              # static sum_k W_k
    wmax = int(spans.max())
    # pairs of adjacent sorted slots
    pair_cost = 0
    for k0 in range(0, K, 2):
        k1 = min(k0 + 1, K - 1)
        lo = np.minimum(ss[:, :, k0].min(axis=1), ss[:, :, k1].min(axis=1))
        hi = np.maximum(ss[:, :, k0].max(axis=1), ss[:, :, k1].max(axis=1))
        pair_cost += 2 * int((hi - lo).max() + 1)
    return W_single, K, per_slot, wmax, pair_cost


def main():
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    for mt, gen, h in (("voronoi", generate_voronoi_mesh, 0.006),
                       ("delaunay", generate_delaunay_mesh, 0.008)):
        mesh = gen(geo, h, h, 1.2, (3.0, 1.0))
        dm = encode_mesh(mesh)
        idx = np.asarray(dm.ck_neighbor, dtype=np.int64)
        N = idx.shape[0]
        NB = N // LANES
        W_single, K, per_slot, wmax, pair_cost = span_stats(idx, NB)
        cur = dm.bd_W if dm.bd_W is not None else None
        cur2 = (dm.bd2_bases.shape[1] * dm.bd2_W
                if dm.bd2_W is not None else None)
        cur_steps = cur if cur is not None else cur2
        print(f"{mt} {h}: N={N} K={K} NB={NB}")
        print(f"  current map: W_single={W_single} chosen_steps={cur_steps}"
              f" -> gather work ~ {cur_steps * K} row-gathers/block")
        print(f"  sorted slots: sum_k W_k = {per_slot} (k-major walk)"
              f"  W_max={wmax} (K-row walk ~ {wmax * K})")
        print(f"  sorted pairs: cost = {pair_cost}")
        print(f"  est. speedup k-major: {cur_steps * K / per_slot:.1f}x, "
              f"pairs: {cur_steps * K / pair_cost:.1f}x")


if __name__ == "__main__":
    main()
