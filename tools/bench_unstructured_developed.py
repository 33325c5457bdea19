"""Developed-state unstructured bench: the north-star measurement standard
(developed vortex-shedding state, strict reference tolerances) applied to
Delaunay/Voronoi meshes on the banded Pallas path.

Usage:
    python tools/bench_unstructured_developed.py delaunay 0.0019 [steps]

Loads .bench_cache/developed_{type}_{size}.npz (tools/
make_developed_unstructured.py), heals 3 untimed steps (f16 rounding), then
times ``steps`` fused steps.  Appends one JSON row to BENCH_SWEEP.jsonl with
``state: developed``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    mesh_type = sys.argv[1] if len(sys.argv) > 1 else "delaunay"
    size = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0019
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    max_cell = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

    from make_developed_unstructured import developed_path
    from mesh_cache import get_mesh

    import jax
    from cfd2_tpu.models.coupled import CoupledSolver

    ckpt = developed_path(mesh_type, size, max_cell)
    d = np.load(ckpt)
    meta = json.loads(str(d["meta"]))
    mesh = get_mesh(mesh_type, size, max_cell=max_cell)
    n = mesh.num_cells
    assert n == meta["cells"], (n, meta["cells"])

    s = CoupledSolver(mesh)
    s.set_viscosity(meta["viscosity"])
    s.set_density(meta["density"])
    s.set_precond_type(1)
    # Identical static config to tools/make_developed_unstructured.py so the
    # AOT executable cache (CFD2_AOT_CACHE=1) reuses the cascade's compile.
    from dataclasses import replace
    s.config = replace(s.config, fgmres_max_restarts=5, stop_count=10**9)
    s.set_dt(meta["dt"])
    s.set_u(d["u"].astype(np.float32))
    s.set_p(d["p"].astype(np.float32))
    s.initialize_history()
    print(f"# developed {mesh_type} {size}: {n} cells, t={meta['time']:.2f} "
          f"probe_v_amp={meta['probe_v_amplitude']:.3f}", flush=True)

    def timed(label):
        t0 = time.time()
        for _ in range(3):   # compile + heal f16 rounding (untimed)
            s.step(mode="fused")
        jax.block_until_ready(s.state.u)
        int(s.state.outer_iters)
        print(f"# [{label}] compile+heal: {time.time()-t0:.1f}s", flush=True)

        t0 = time.time()
        outers, lins, ltot = [], [], []
        for _ in range(steps):
            s.step(mode="fused")
            outers.append(int(s.state.outer_iters))  # value read: device sync
            lins.append(int(s.state.linear_iters))
            ltot.append(int(s.state.linear_iters_total))
        dt_step = (time.time() - t0) / steps
        print(f"# [{label}] outer_iters={outers} "
              f"linear_iters_total={ltot}", flush=True)
        assert np.isfinite(s.get_u()).all()
        return {"step_seconds": round(dt_step, 4),
                "cell_updates_per_sec": round(n / dt_step, 1),
                "outer_iters": outers, "last_linear_iters": lins,
                "linear_iters_total": ltot}

    m = s.mesh
    kc = "" if m.bd_k is None else f",k{m.bd_k}"
    layout = (f"banded-grouped(wgs={m.bd_wgs[0]}{kc})" if m.bd_wgs is not None
              else f"banded(W={m.bd_W}{kc})" if m.bd_W is not None
              else (f"banded-multi(W={m.bd2_W},"
                    f"NW={m.bd2_bases.shape[1]}{kc})")
              if m.bd2_W is not None
              else "other")

    def emit(policy, res):
        row = {
            "mesh": size if not max_cell else f"{size}/{max_cell}",
            "mesh_type": mesh_type, "cells": n,
            "layout": layout, "precond": "amg", "state": "developed",
            "policy": policy, **res,
        }
        print(json.dumps(row), flush=True)
        with open(os.path.join(ROOT, "BENCH_SWEEP.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    # Repo outer policy (alpha ramp + pressure-plateau patience).
    emit("accelerated", timed("accelerated"))

    # A/B under the reference outer policy (coupled_solver.rs:396-479: no
    # alpha ramp, no plateau exit) — exactly bench.py's reference_outer leg,
    # now on the unstructured rows too (VERDICT r4 #2).
    if os.environ.get("BENCH_SKIP_AB") != "1":
        s.config = replace(s.config, alpha_u_final=0.0,
                           outer_pressure_patience=0)
        emit("reference", timed("reference"))


if __name__ == "__main__":
    main()
