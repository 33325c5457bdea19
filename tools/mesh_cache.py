"""Generate-and-cache host meshes (.bench_cache/mesh_*.npz).

Unstructured generation at ~1M cells is minutes of host work; the bench and
the developed-state cascade both need the same meshes, so they are built once
and reloaded from npz.  Usage:

    python tools/mesh_cache.py delaunay 0.0019
    python tools/mesh_cache.py voronoi 0.0025
"""

import os
import sys
import time
from dataclasses import fields

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".bench_cache")


def mesh_path(mesh_type: str, size: float, geo: str = "channel",
              max_cell: float = 0.0) -> str:
    tag = f"{size}" if not max_cell else f"{size}-{max_cell}"
    return os.path.join(CACHE, f"mesh_{geo}_{mesh_type}_{tag}.npz")


def save_mesh(mesh, path: str):
    from cfd2_tpu.mesh.structs import Mesh
    arrs = {}
    for f in fields(Mesh):
        v = getattr(mesh, f.name)
        if v is None:
            continue
        arrs[f.name] = np.asarray(v)
    np.savez_compressed(path, **arrs)


def load_mesh(path: str):
    from cfd2_tpu.mesh.structs import Mesh
    d = np.load(path)
    return Mesh(**{k: d[k] for k in d.files})


def get_mesh(mesh_type: str, size: float, geo: str = "channel",
             max_cell: float = 0.0):
    """Load from cache or generate + cache.  ``geo``: channel (3x1 channel
    with the r=0.2 obstacle at (1.0, 0.5) — the bench configuration).
    ``max_cell`` > size produces a locally-refined cut-cell mesh."""
    from cfd2_tpu.mesh import (ChannelWithObstacle, generate_cut_cell_mesh,
                               generate_delaunay_mesh, generate_voronoi_mesh)
    os.makedirs(CACHE, exist_ok=True)
    path = mesh_path(mesh_type, size, geo, max_cell)
    if os.path.exists(path):
        t0 = time.time()
        m = load_mesh(path)
        print(f"# mesh cache hit {path}: {m.num_cells} cells "
              f"({time.time()-t0:.0f}s load)", flush=True)
        return m
    gen = {"cutcell": generate_cut_cell_mesh,
           "delaunay": generate_delaunay_mesh,
           "voronoi": generate_voronoi_mesh}[mesh_type]
    geo_obj = ChannelWithObstacle(length=3.0, height=1.0,
                                  obstacle_center=(1.0, 0.5),
                                  obstacle_radius=0.2)
    t0 = time.time()
    mesh = gen(geo_obj, size, max(max_cell, size), 1.2, (3.0, 1.0))
    print(f"# generated {mesh_type} {size}: {mesh.num_cells} cells "
          f"({time.time()-t0:.0f}s)", flush=True)
    save_mesh(mesh, path)
    return mesh


if __name__ == "__main__":
    mt = sys.argv[1]
    sz = float(sys.argv[2])
    m = get_mesh(mt, sz)
    print(f"# done: {m.num_cells} cells, {m.num_faces} faces", flush=True)
