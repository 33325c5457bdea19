"""Dispatch-scaling sweep: cell-updates/sec across mesh sizes, mirroring the
reference's criterion size sweep (benches/gpu_dispatch_benchmark.rs:59-130:
meshes 0.05 / 0.02 / 0.01 with Throughput::Elements(num_cells), plus the
Jacobi-vs-AMG comparison at 0.01 (:161-190)).

Prints one JSON line per (size, preconditioner) combination.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def bench_one(min_cell: float, precond: int, steps: int = 6,
              max_cell: float = 0.0, mesh_type: str = "cutcell"):
    import jax
    from cfd2_tpu.mesh import (ChannelWithObstacle, generate_cut_cell_mesh,
                               generate_delaunay_mesh, generate_voronoi_mesh)
    from cfd2_tpu.models.coupled import CoupledSolver

    if mesh_type in ("delaunay", "voronoi") and not max_cell:
        # Unstructured generation at fine h is minutes of host work shared
        # across bench runs — go through the npz cache.
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from mesh_cache import get_mesh
        mesh = get_mesh(mesh_type, min_cell)
    else:
        geo = ChannelWithObstacle(length=3.0, height=1.0,
                                  obstacle_center=(1.0, 0.5),
                                  obstacle_radius=0.2)
        gen = {"cutcell": generate_cut_cell_mesh,
               "delaunay": generate_delaunay_mesh,
               "voronoi": generate_voronoi_mesh}[mesh_type]
        t0 = time.time()
        mesh = gen(geo, min_cell, max(max_cell, min_cell), 1.2, (3.0, 1.0))
        print(f"# {mesh_type} {min_cell}: {mesh.num_cells} cells "
              f"({time.time()-t0:.0f}s)", flush=True)
    n = mesh.num_cells
    s = CoupledSolver(mesh)
    s.set_dt(min(0.002, 0.4 * min_cell))
    s.set_precond_type(precond)
    u0 = np.zeros((n, 2))
    u0[mesh.cell_cx < min_cell * 2, 0] = 1.0
    s.set_u(u0)

    mode = "fused"
    for _ in range(2):   # compile + warmup
        s.step(mode=mode)
        int(s.state.outer_iters)   # value read: a real device sync
        # (block_until_ready is not a reliable fence through the tunnel)
    t0 = time.time()
    for _ in range(steps):
        s.step(mode=mode)
        int(s.state.outer_iters)
    dt = (time.time() - t0) / steps
    assert np.isfinite(s.get_u()).all()
    m = s.mesh
    kc = "" if m.bd_k is None else f",k{m.bd_k}"
    layout = ("structured" if m.structured
              else (f"multilevel-banded(W={m.bd2_W})"
                    if m.bd2_W is not None else "multilevel")
              if m.multilevel
              else (f"banded-grouped(wgs={m.bd_wgs[0]}{kc})"
                    if m.bd_wgs is not None
                    else f"banded(W={m.bd_W}{kc})")
              if m.bd_W is not None
              else (f"banded-multi(W={m.bd2_W},"
                    f"NW={m.bd2_bases.shape[1]}{kc})")
              if m.bd2_W is not None
              else "generic")
    print(json.dumps({
        "mesh": min_cell if not max_cell else f"{min_cell}/{max_cell}",
        "mesh_type": mesh_type,
        "cells": n, "layout": layout,
        "precond": ["jacobi", "amg", "block-jacobi"][precond],
        "step_seconds": round(dt, 4),
        "cell_updates_per_sec": round(n / dt, 1),
    }), flush=True)


def main():
    sizes = [float(x) for x in os.environ.get(
        "SWEEP_SIZES", "0.05,0.02,0.01").split(",")]
    for h in sizes:
        bench_one(h, precond=1)
    # Jacobi vs AMG at 0.01 (reference :161-190).
    cmp_size = float(os.environ.get("SWEEP_COMPARE", "0.01"))
    bench_one(cmp_size, precond=0)
    # Locally-refined quadtree mesh (multilevel fast path).
    bench_one(0.01, precond=1, max_cell=0.04)
    # Unstructured meshes on the banded-gather path (VERDICT r2 #3).
    for mt in ("delaunay", "voronoi"):
        bench_one(float(os.environ.get("SWEEP_UNSTRUCTURED", "0.005")),
                  precond=1, mesh_type=mt)


if __name__ == "__main__":
    main()
