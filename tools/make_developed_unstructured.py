"""Produce a developed vortex-shedding state on an UNSTRUCTURED mesh.

The north-star standard (VERDICT r3 #1) applies the developed-state honesty
to the banded unstructured path: rather than re-running the whole grid
cascade on a mesh where steps are expensive, this prolongs the structured
developed street (``bench_developed_1m.npz`` from tools/make_developed.py:
Re=160, h=0.0017, several shedding periods) onto the target Delaunay/Voronoi
mesh by bilinear point sampling at the cell centers, then heals the
interpolation + geometry mismatch with real solver steps on the target mesh.

The reference solves these meshes through the same CSR kernels as cut-cell
ones (coupled_solver_fgmres.rs:1728 fed by delaunay.rs:732 / voronoi.rs:23),
so the comparable state is the same physical configuration.

Usage:
    python tools/make_developed_unstructured.py delaunay 0.0019 [heal_steps]

Writes .bench_cache/developed_{type}_{size}.npz (f16 fields in HOST mesh
order + meta) consumed by tools/bench_unstructured_developed.py.
"""

import json
import os
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".bench_cache")
SRC = os.path.join(ROOT, "bench_developed_1m.npz")
PROBE_XY = (1.8, 0.6)


def developed_path(mesh_type: str, size: float, max_cell: float = 0.0) -> str:
    tag = f"{size}" if not max_cell else f"{size}-{max_cell}"
    return os.path.join(CACHE, f"developed_{mesh_type}_{tag}.npz")


def bilerp(field, x, y, h):
    """Sample an (ny, nx[, C]) cell-center grid field at continuous (x, y).

    Mirrors tools/make_developed.py:bilerp (cell centers at (i+0.5)h)."""
    ny, nx = field.shape[:2]
    gi = np.clip(x / h - 0.5, 0.0, nx - 1.0)
    gj = np.clip(y / h - 0.5, 0.0, ny - 1.0)
    i0 = np.clip(np.floor(gi).astype(int), 0, nx - 2)
    j0 = np.clip(np.floor(gj).astype(int), 0, ny - 2)
    fx = (gi - i0)[..., None] if field.ndim == 3 else (gi - i0)
    fy = (gj - j0)[..., None] if field.ndim == 3 else (gj - j0)
    f00 = field[j0, i0]
    f01 = field[j0, i0 + 1]
    f10 = field[j0 + 1, i0]
    f11 = field[j0 + 1, i0 + 1]
    return ((1 - fy) * ((1 - fx) * f00 + fx * f01)
            + fy * ((1 - fx) * f10 + fx * f11))


def main():
    mesh_type = sys.argv[1] if len(sys.argv) > 1 else "delaunay"
    size = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0019
    heal_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    max_cell = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

    from mesh_cache import get_mesh

    from cfd2_tpu.models.coupled import CoupledSolver

    d = np.load(SRC)
    src_meta = json.loads(str(d["meta"]))
    u_g = d["u"].astype(np.float32)
    p_g = d["p"].astype(np.float32)
    h_src = float(d["h"])
    print(f"# source grid {u_g.shape[:2]} h={h_src:.5f} "
          f"t={src_meta['time']:.2f} nu={src_meta['viscosity']}", flush=True)

    mesh = get_mesh(mesh_type, size, max_cell=max_cell)
    n = mesh.num_cells
    s = CoupledSolver(mesh)
    s.set_viscosity(src_meta["viscosity"])
    s.set_density(src_meta.get("density", 1.0))
    s.set_precond_type(1)   # AMG
    s.config = replace(s.config, fgmres_max_restarts=5, stop_count=10**9)
    dt = min(2e-4, 0.25 * size)
    s.set_dt(dt)

    u0 = bilerp(u_g, mesh.cell_cx, mesh.cell_cy, h_src)
    p0 = bilerp(p_g, mesh.cell_cx, mesh.cell_cy, h_src)
    s.set_u(u0)
    s.set_p(p0)
    s.initialize_history()

    # Wake probe cell (host order) for shedding verification.
    probe = int(np.argmin((mesh.cell_cx - PROBE_XY[0]) ** 2
                          + (mesh.cell_cy - PROBE_XY[1]) ** 2))
    series = []
    t0 = time.time()
    for i in range(heal_steps):
        s.step(mode="fused")
        if (i + 1) % 10 == 0 or i == 0:
            u = s.get_u()
            assert np.isfinite(u).all(), f"diverged at heal step {i}"
            series.append(float(u[probe, 1]))
            print(f"# heal {i+1}/{heal_steps}  max|u|={np.abs(u).max():.3f} "
                  f"probe_v={series[-1]:+.3f}  ({time.time()-t0:.0f}s)",
                  flush=True)
    u = s.get_u()
    p = s.get_p()
    amp = float(np.max(series) - np.min(series)) if series else 0.0
    meta = {"viscosity": src_meta["viscosity"], "density": 1.0,
            "mesh_type": mesh_type, "size": size, "max_cell": max_cell,
            "cells": n,
            "time": src_meta["time"] + heal_steps * dt, "dt": dt,
            "heal_steps": heal_steps, "probe_v_amplitude": amp,
            "probe_xy": list(PROBE_XY)}
    out = developed_path(mesh_type, size, max_cell)
    np.savez_compressed(out, u=u.astype(np.float16),
                        p=p.astype(np.float16), meta=json.dumps(meta))
    print(f"# wrote {out}: {n} cells, probe_v amplitude {amp:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
