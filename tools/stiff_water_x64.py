"""Stiff-case envelope demo with REAL f64 norm accumulation (VERDICT r3 #8).

Water (rho=1000) on the backwards step — the reference's stiffest regression
(/root/reference/tests/reproduce_divergence.rs) — at h<=0.01 (4x finer than
the reference's 0.025), run on the x64-enabled CPU backend with
``fgmres_f64_norms`` active.  rho=1000 squares into the residual norms
(|b|^2 ~ (rho vol u / dt)^2 ~ 1e12 per cell at fine h), the regime the flag
exists for; on the default f32 path the flag is a documented no-op, so this
is the one run where the accumulation dtype is genuinely float64
(tests/test_f64_norms_x64.py pins the jaxpr dtype under both settings).

Writes STIFF_X64.json.

Usage:  python tools/stiff_water_x64.py [h] [steps]
"""

import json
import os
import sys
import time
from dataclasses import replace

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# sitecustomize preloads jax._src before this script runs, so the env var
# would be read too late — set the config directly (before any trace).
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    h = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import jax
    assert jax.config.jax_enable_x64

    from cfd2_tpu.mesh import BackwardsStep, generate_cut_cell_mesh
    from cfd2_tpu.models.coupled import CoupledSolver
    from cfd2_tpu.ops import fgmres as fg
    import jax.numpy as jnp

    # Hard proof the accumulation is f64 in this process.
    jpr = str(jax.make_jaxpr(fg.make_norm(True, jnp.float32))(
        jnp.zeros((8,), jnp.float32)))
    assert "f64" in jpr, jpr

    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    t0 = time.time()
    mesh = generate_cut_cell_mesh(geo, h, h, 1.2, (3.5, 1.0))
    mesh.smooth(geo, 0.3, 50)
    print(f"# mesh h={h}: {mesh.num_cells} cells ({time.time()-t0:.0f}s)",
          flush=True)

    s = CoupledSolver(mesh)
    s.config = replace(s.config, fgmres_f64_norms=True)
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
        "h": h, "cells": int(mesh.num_cells), "steps": steps,
        "density": 1000.0, "viscosity": 0.001,
        "x64": True, "f64_norms_active": True,
        "finite": finite,
        "max_outer_residual_u": resid_max,
        "max_vel": float(np.linalg.norm(u, axis=1).max()),
        "wall_s": round(time.time() - t0, 1),
    }
    assert finite
    print(json.dumps(row), flush=True)
    with open(os.path.join(ROOT, "STIFF_X64.json"), "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
