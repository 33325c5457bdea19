"""Schäfer–Turek 2D-2 benchmark: quantitative validation against published
intervals (VERDICT r3 #4).

Configuration (Schäfer & Turek 1996, "Benchmark computations of laminar
flow around a cylinder", case 2D-2 unsteady): channel 2.2 x 0.41 with a
D = 0.1 cylinder centered at (0.2, 0.2) (asymmetric: 0.05 gap below vs
0.06 above triggers shedding), parabolic inlet U(y) = 4 U_m y (H - y) / H^2
with U_m = 1.5 (mean velocity U_bar = 2 U_m / 3 = 1.0), nu = 0.001,
rho = 1  ->  Re = U_bar D / nu = 100.  Published reference intervals:

    Cd_max in [3.2200, 3.2400]
    Cl_max in [0.9900, 1.0100]
    St     in [0.2950, 0.3050]

Coefficients are normalized with U_bar = 1 and D = 0.1 (the benchmark's
convention).  The reference app supports only a uniform inlet
(/root/reference/src/solver/gpu/structs.rs:86-101) and cannot run this
benchmark; cfd2_tpu's set_inlet_profile makes it possible.

Forces are computed per step INSIDE the scanned device loop (utils/
forces.body_force is pure jnp) — the Cl(t) series costs no extra host
round-trips.

Usage:
    python tools/validate_turek.py [h] [t_end] [t_measure] [scheme] [h_from]

    h          uniform cell size (default 0.005 -> D/h = 20, ~36k cells)
    t_end      total simulated time (default 30.0 s; shedding period
               ~0.33 s, the startup transient takes ~15-20 s)
    t_measure  measurement window at the end (default 6.0 s, ~18 periods)
    scheme     0 upwind / 1 second-order upwind (default) / 2 QUICK
    h_from     warm-start: interpolate the saved developed field of a
               coarser run (its .bench_cache/turek_{h_from}.npz) onto this
               mesh, skipping most of the startup transient — the same
               cascade trick as the north-star bench (tools/make_developed).
               With a warm start t_end only needs a few periods of heal +
               the measurement window (e.g. t_end 6, t_measure 4).

Appends one JSON row to TUREK.jsonl; saves the final field to
.bench_cache/turek_{h}.npz for the next rung.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

H = 0.41          # channel height
L = 2.2           # channel length
D = 0.1           # cylinder diameter
CENTER = (0.2, 0.2)
U_BAR = 1.0       # benchmark mean inlet velocity (normalization velocity)
NU = 0.001
INTERVALS = {"cd_max": (3.22, 3.24), "cl_max": (0.98, 1.02),
             "st": (0.295, 0.305)}


def main():
    h = float(sys.argv[1]) if len(sys.argv) > 1 else 0.005
    t_end = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    t_meas = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
    scheme = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    h_from = float(sys.argv[5]) if len(sys.argv) > 5 else None

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models import coupled as cp
    from cfd2_tpu.runtime.state import TIME_BDF2
    from cfd2_tpu.utils.forces import body_force, obstacle_face_mask

    geo = ChannelWithObstacle(length=L, height=H, obstacle_center=CENTER,
                              obstacle_radius=D / 2.0)
    t0 = time.time()
    mesh = generate_cut_cell_mesh(geo, h, h, 1.2, (L, H))
    print(f"# turek mesh h={h}: {mesh.num_cells} cells, D/h={D/h:.0f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    s = cp.CoupledSolver(mesh)
    s.set_viscosity(NU)
    s.set_density(1.0)
    s.set_inlet_velocity(U_BAR)
    # Parabolic profile normalized to mean 1: 6 y (H - y) / H^2 (peak 1.5
    # = the benchmark's U_m).
    s.set_inlet_profile(lambda x, y: 6.0 * y * (H - y) / H ** 2)
    s.set_ramp_time(0.5)
    s.set_scheme(scheme)
    s.set_time_scheme(TIME_BDF2)
    s.set_precond_type(1)
    # Peak cell velocity ~2.1 (blockage + parabola peak 1.5); CFL ~0.35.
    dt = h / 6.0
    s.set_dt(dt)
    # Fixed dt throughout: pin the BDF2 history ratio at r = 1 (the tool's
    # own scan below bypasses CoupledSolver.step's dt_old rotation).
    from dataclasses import replace as _rp
    s.params = _rp(s.params, dt_old=s.params.dt)

    cache = os.path.join(ROOT, ".bench_cache")
    if h_from is not None:
        # Warm start from the coarser rung's developed field (linear
        # scattered-data interpolation over cell centers; the cut-cell mesh
        # is irregular near the cylinder).
        from scipy.interpolate import griddata
        src = np.load(os.path.join(cache, f"turek_{h_from}.npz"))
        pts = np.stack([src["cx"], src["cy"]], axis=1)
        tgt = np.stack([np.asarray(mesh.cell_cx),
                        np.asarray(mesh.cell_cy)], axis=1)
        def interp(vals):
            lin = griddata(pts, vals.astype(np.float32), tgt,
                           method="linear")
            near = griddata(pts, vals.astype(np.float32), tgt,
                            method="nearest")
            return np.where(np.isfinite(lin), lin, near)

        u0 = np.stack([interp(src["u"][:, 0]), interp(src["u"][:, 1])],
                      axis=1)
        p0 = interp(src["p"])
        s.set_u(u0)
        s.set_p(p0)
        s.initialize_history()
        s.set_ramp_time(1e-9)   # inlet already at full strength
        print(f"# warm start from turek_{h_from}.npz "
              f"(t={float(src['t']):.1f}s)", flush=True)

    mask = jnp.asarray(obstacle_face_mask(s.mesh))
    q = 0.5 * 1.0 * U_BAR ** 2 * D   # dynamic pressure * D

    @partial(jax.jit, static_argnames=("config", "n"))
    def run_chunk(mesh, state, params, config, amg, n):
        def body(st, _):
            st = lax.cond(st.should_stop, lambda x: x,
                          lambda x: cp.step(mesh, x, params, config, amg), st)
            return st, body_force(mesh, st, params, mask) / q
        return lax.scan(body, state, None, length=n)

    n_total = int(round(t_end / dt))
    chunk = 200
    cd, cl = [], []
    t0 = time.time()
    while n_total > 0:
        n = min(chunk, n_total)
        s.state, f = run_chunk(s.mesh, s.state, s.params, s.config,
                               s._get_amg(), n)
        f = np.asarray(f)
        assert np.isfinite(f).all(), "diverged"
        cd.extend(f[:, 0].tolist())
        cl.extend(f[:, 1].tolist())
        n_total -= n
        t_sim = float(s.state.time)
        print(f"# t={t_sim:6.2f}  Cd={f[-1, 0]:.4f}  Cl={f[-1, 1]:+.4f}  "
              f"({time.time()-t0:.0f}s wall)", flush=True)

    cd = np.array(cd)
    cl = np.array(cl)
    n_meas = int(round(t_meas / dt))
    cdm, clm = cd[-n_meas:], cl[-n_meas:]
    from cfd2_tpu.utils.forces import strouhal_number
    st_num = strouhal_number(clm, np.full(len(clm), dt), u_ref=U_BAR,
                             d_ref=D)
    row = {
        "benchmark": "schaefer-turek-2d2", "h": h, "cells": mesh.num_cells,
        "d_over_h": round(D / h, 1), "scheme": scheme, "dt": dt,
        "t_end": t_end, "t_measure": t_meas,
        "cd_max": round(float(cdm.max()), 4),
        "cd_mean": round(float(cdm.mean()), 4),
        "cl_max": round(float(clm.max()), 4),
        "cl_min": round(float(clm.min()), 4),
        "st": round(float(st_num), 4),
        "published": {k: list(v) for k, v in INTERVALS.items()},
        "in_interval": {
            "cd_max": bool(INTERVALS["cd_max"][0] <= cdm.max()
                           <= INTERVALS["cd_max"][1]),
            "cl_max": bool(INTERVALS["cl_max"][0] <= clm.max()
                           <= INTERVALS["cl_max"][1]),
            "st": bool(INTERVALS["st"][0] <= st_num
                       <= INTERVALS["st"][1]),
        },
    }
    if h_from is not None:
        row["warm_start_from_h"] = h_from
    print(json.dumps(row), flush=True)
    with open(os.path.join(ROOT, "TUREK.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")

    # Save the developed field for the next (finer) rung of the ladder.
    os.makedirs(cache, exist_ok=True)
    u_fin = np.asarray(s.mesh.to_host_order(s.state.u))
    p_fin = np.asarray(s.mesh.to_host_order(s.state.p))
    np.savez_compressed(
        os.path.join(cache, f"turek_{h}.npz"),
        u=u_fin.astype(np.float16), p=p_fin.astype(np.float16),
        cx=np.asarray(mesh.cell_cx), cy=np.asarray(mesh.cell_cy),
        t=np.float32(s.state.time))
    print(f"# saved turek_{h}.npz", flush=True)


if __name__ == "__main__":
    main()
