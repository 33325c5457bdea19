"""Stiff-case envelope on the ACCELERATOR (VERDICT r4 #9).

Water (rho=1000) on the backwards step — the reference's stiffest regression
(/root/reference/tests/reproduce_divergence.rs: 50 steps, residual finite
and < 1e10) — run on the real TPU chip on the default f32 path, exactly as
the reference's GPU runs it in f32 (all its WGSL is f32; SURVEY.md §7).
The x64 companion (tools/stiff_water_x64.py -> STIFF_X64.json) pins the
f64-norm machinery on CPU; this run pins the envelope on the production
device/dtype.

Writes STIFF_TPU.json with the platform recorded.

Usage:  python tools/stiff_water_tpu.py [h] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    h = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import jax

    platform = jax.devices()[0].platform
    device_kind = jax.devices()[0].device_kind

    from cfd2_tpu.mesh import BackwardsStep, generate_cut_cell_mesh
    from cfd2_tpu.models.coupled import CoupledSolver

    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    t0 = time.time()
    mesh = generate_cut_cell_mesh(geo, h, h, 1.2, (3.5, 1.0))
    mesh.smooth(geo, 0.3, 50)
    print(f"# mesh h={h}: {mesh.num_cells} cells ({time.time()-t0:.0f}s) "
          f"on {platform} ({device_kind})", flush=True)

    s = CoupledSolver(mesh)
    s.set_dt(0.001)
    s.set_density(1000.0)
    s.set_viscosity(0.001)
    s.set_alpha_u(0.7)
    s.set_alpha_p(0.3)
    s.set_precond_type(1)
    s.set_u(np.full((mesh.num_cells, 2), [0.1, 0.0]))

    t0 = time.time()
    resid_max = 0.0
    for i in range(steps):
        s.step()
        r = float(s.state.outer_residual_u)
        assert np.isfinite(r), f"NaN residual at step {i}"
        assert r < 1e10, f"residual blow-up at step {i}: {r}"
        resid_max = max(resid_max, r)
        if (i + 1) % 10 == 0:
            print(f"# step {i+1}/{steps}  resid_u={r:.3e}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
    u = s.get_u()
    p = s.get_p()
    finite = bool(np.isfinite(u).all() and np.isfinite(p).all())
    row = {
        "case": "water backwards-step (reproduce_divergence.rs config)",
        "platform": platform, "device_kind": device_kind,
        "h": h, "cells": int(mesh.num_cells), "steps": steps,
        "density": 1000.0, "viscosity": 0.001,
        "dtype": "float32",
        "finite": finite,
        "max_outer_residual_u": resid_max,
        "max_vel": float(np.linalg.norm(u, axis=1).max()),
        "wall_s": round(time.time() - t0, 1),
    }
    assert finite
    print(json.dumps(row), flush=True)
    with open(os.path.join(ROOT, "STIFF_TPU.json"), "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
