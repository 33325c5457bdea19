"""Paired-comparator developed-state bench (VERDICT r4 #4).

Any row whose meaning is "X x of config B" must measure B in the SAME
process, alternated (B, X, B, X, ...), reporting paired medians — the
round-4 refined-vs-uniform claim rode a comparator measured hours apart that
drifted 40% same-day ("tunnel drift"), which decided whether the <=2x bar
was met.

Usage:
    python tools/bench_paired.py SUBJECT COMPARATOR [rounds] [steps]

where each spec is  mesh_type:size[:max_cell]  and a developed checkpoint
.bench_cache/developed_{type}_{tag}.npz must exist (tools/
make_developed_unstructured.py — also used for cut-cell cascades).

Example:
    python tools/bench_paired.py cutcell:0.0015:0.006 cutcell:0.0048 5 5

Appends one JSON row {"protocol": "paired", ...} to BENCH_SWEEP.jsonl with
per-round rates for both configs and the paired-median ratio.
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


def parse_spec(spec: str):
    parts = spec.split(":")
    mesh_type = parts[0]
    size = float(parts[1])
    max_cell = float(parts[2]) if len(parts) > 2 else 0.0
    return mesh_type, size, max_cell


def load_solver(spec):
    """Build a CoupledSolver on the spec's developed checkpoint."""
    from dataclasses import replace

    from make_developed_unstructured import developed_path
    from mesh_cache import get_mesh

    from cfd2_tpu.models.coupled import CoupledSolver

    mesh_type, size, max_cell = parse_spec(spec)
    ckpt = developed_path(mesh_type, size, max_cell)
    d = np.load(ckpt)
    meta = json.loads(str(d["meta"]))
    mesh = get_mesh(mesh_type, size, max_cell=max_cell)
    assert mesh.num_cells == meta["cells"], (mesh.num_cells, meta["cells"])

    s = CoupledSolver(mesh)
    s.set_viscosity(meta["viscosity"])
    s.set_density(meta["density"])
    s.set_precond_type(1)
    s.config = replace(s.config, fgmres_max_restarts=5, stop_count=10**9)
    s.set_dt(meta["dt"])
    s.set_u(d["u"].astype(np.float32))
    s.set_p(d["p"].astype(np.float32))
    s.initialize_history()
    print(f"# {spec}: {mesh.num_cells} cells, t={meta['time']:.2f}",
          flush=True)
    return s, meta


def time_block(s, steps):
    t0 = time.time()
    outers = lins = 0
    for _ in range(steps):
        s.step(mode="fused")
        outers += int(s.state.outer_iters)     # value read: device sync
        lins += int(s.state.linear_iters_total)
    dt = (time.time() - t0) / steps
    return dt, outers, lins


def main():
    subj_spec = sys.argv[1]
    comp_spec = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    subj, _ = load_solver(subj_spec)
    comp, _ = load_solver(comp_spec)
    n_s = subj.mesh.num_cells
    n_c = comp.mesh.num_cells

    # Compile + heal both before any timing (f16 checkpoint rounding).
    for s, name in ((comp, "comparator"), (subj, "subject")):
        t0 = time.time()
        for _ in range(3):
            s.step(mode="fused")
        int(s.state.outer_iters)
        print(f"# {name} compile+heal: {time.time()-t0:.1f}s", flush=True)
        assert np.isfinite(s.get_u()).all()

    rate_s, rate_c, acct = [], [], []
    for r in range(rounds):
        # Comparator first, then subject, every round: any drift (tunnel
        # load, clocks) hits both inside the same window.
        dt_c, o_c, l_c = time_block(comp, steps)
        dt_s, o_s, l_s = time_block(subj, steps)
        rate_c.append(n_c / dt_c)
        rate_s.append(n_s / dt_s)
        acct.append({"subject": {"outer": o_s, "linear_total": l_s},
                     "comparator": {"outer": o_c, "linear_total": l_c}})
        print(f"# round {r}: subject {rate_s[-1]/1e6:.2f}M c-u/s, "
              f"comparator {rate_c[-1]/1e6:.2f}M c-u/s, "
              f"ratio {rate_c[-1]/rate_s[-1]:.2f}", flush=True)

    ratios = sorted(c / s for c, s in zip(rate_c, rate_s))
    row = {
        "protocol": "paired", "state": "developed", "precond": "amg",
        "subject": {"spec": subj_spec, "cells": n_s,
                    "rates": [round(x, 1) for x in rate_s],
                    "median_cell_updates_per_sec": round(
                        float(np.median(rate_s)), 1)},
        "comparator": {"spec": comp_spec, "cells": n_c,
                       "rates": [round(x, 1) for x in rate_c],
                       "median_cell_updates_per_sec": round(
                           float(np.median(rate_c)), 1)},
        "per_cell_ratio_comparator_over_subject": round(
            float(np.median(ratios)), 3),
        "rounds": rounds, "steps_per_block": steps,
        "iter_accounting": acct,
    }
    print(json.dumps(row), flush=True)
    with open(os.path.join(ROOT, "BENCH_SWEEP.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
