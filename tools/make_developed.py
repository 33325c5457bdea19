"""Produce a developed vortex-shedding state at the north-star size (1M cells).

The BASELINE.json north-star config is a *developed* "1M-cell vortex-shedding
channel", not 5 steps from rest (VERDICT r2 weak #2).  Developing a vortex
street directly at h=0.0017 would take O(10^4) steps; instead this tool runs a
grid cascade — develop the flow where steps are cheap, then bilinearly prolong
(u, p) to the next finer grid and heal:

    0.0136 (15k cells, adaptive steps to t~=12s, several shedding periods)
    -> 0.0068 (62k)  heal
    -> 0.0034 (250k) heal
    -> 0.0017 (1M)   heal

Re = U*D/nu = 1*0.4/0.005 = 80 (nu=0.005): above the cylinder shedding onset
(~47); nu=0.01 (the old from-rest bench) sits at Re=40 which does not shed.

Each level checkpoints into .bench_cache/ so a wedged remote compile only
costs the current level on rerun.  The final state is written to
``bench_developed_1m.npz`` (f16 fields + metadata); bench.py loads it, heals
3 untimed steps (washing out the f16 rounding), and times the developed
state.  A probe time series behind the obstacle is saved so shedding can be
verified (meta: probe oscillation amplitude).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dataclasses import replace

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".bench_cache")
OUT = os.path.join(ROOT, "bench_developed_1m.npz")

VISCOSITY = 0.0025        # Re = U*D/nu = 160: sheds robustly even with the
                          # channel confinement (Re=40-80 went steady on the
                          # coarse cascade levels)
DENSITY = 1.0
T_DEVELOP = 25.0          # physical seconds at the development level
DEVELOP_SIZE = 0.0068     # coarse enough for cheap steps, fine enough to shed
HEAL_STEPS = {0.0136: 2000, 0.0034: 300, 0.0017: 250}
SIZES = [0.0136, 0.0068, 0.0034, 0.0017]
PROBE_XY = (1.8, 0.6)     # wake probe, downstream of the obstacle


def make_solver(min_cell):
    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.coupled import CoupledSolver

    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    t0 = time.time()
    mesh = generate_cut_cell_mesh(geo, min_cell, min_cell, 1.2, (3.0, 1.0))
    print(f"# mesh {min_cell}: {mesh.num_cells} cells ({time.time()-t0:.0f}s)",
          flush=True)
    s = CoupledSolver(mesh)
    s.set_viscosity(VISCOSITY)
    s.set_density(DENSITY)
    s.set_precond_type(1)   # AMG
    # stop_count huge: the steady-state detector must NOT freeze the warmup
    # scan (the symmetric pre-shedding wake classifies as steady).
    s.config = replace(s.config, fgmres_max_restarts=5, stop_count=10**9)
    s.set_dt(min(2e-4, 0.3 * min_cell))
    return s


def perturb_wake(s):
    """Seed wake asymmetry so shedding onset does not wait on roundoff."""
    import jax.numpy as jnp

    cx = np.asarray(s.mesh.c_cx)
    cy = np.asarray(s.mesh.c_cy)
    bump = 0.15 * np.exp(-((cx - 1.35) ** 2 + (cy - 0.55) ** 2) / 0.12 ** 2)
    u = np.array(s.state.u)
    u[:, 1] += bump * (np.asarray(s.mesh.c_valid) > 0)
    uj = jnp.asarray(u, jnp.float32)
    s.state = replace(s.state, u=uj, u_old=uj, u_old_old=uj, prev_u=uj)


def grid_fields(s):
    """(ny, nx, 2) u and (ny, nx) p grids plus spacing h."""
    ny, nx = s.mesh.grid_shape
    u = np.asarray(s.state.u).reshape(ny, nx, 2)
    p = np.asarray(s.state.p).reshape(ny, nx)
    h = 3.0 / nx   # uniform grid over the 3x1 channel
    return u, p, h


def bilerp(field, x, y, h):
    """Sample an (ny, nx[, C]) grid-square field at continuous (x, y)."""
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


def prolong_into(s, u_c, p_c, h_c):
    """Set s's state from coarse grids (bilinear at fine cell centers)."""
    import jax.numpy as jnp

    cx = np.asarray(s.mesh.c_cx)
    cy = np.asarray(s.mesh.c_cy)
    valid = np.asarray(s.mesh.c_valid) > 0
    u = bilerp(u_c, cx, cy, h_c) * valid[:, None]
    p = bilerp(p_c, cx, cy, h_c) * valid
    uj = jnp.asarray(u, jnp.float32)
    s.state = replace(s.state, u=uj, u_old=uj, u_old_old=uj, prev_u=uj,
                      p=jnp.asarray(p, jnp.float32))


def probe_index(s):
    cx = np.asarray(s.mesh.c_cx)
    cy = np.asarray(s.mesh.c_cy)
    valid = np.asarray(s.mesh.c_valid) > 0
    d2 = (cx - PROBE_XY[0]) ** 2 + (cy - PROBE_XY[1]) ** 2
    d2[~valid] = np.inf
    return int(np.argmin(d2))


def run_steps(s, n, min_cell, batch=50, label=""):
    """Advance n adaptive-dt steps in scanned batches; returns the wake-probe
    v-velocity series (one sample per batch)."""
    from cfd2_tpu.models.coupled import multi_step_adaptive

    pi = probe_index(s)
    series = []
    done = 0
    t0 = time.time()
    while done < n:
        k = min(batch, n - done)
        s.state, s.params, m = multi_step_adaptive(
            s.mesh, s.state, s.params, s.config, k,
            target_cfl=0.4, min_cell_size=min_cell, amg=s._get_amg())
        done += k
        uy = float(s.state.u[pi, 1])
        series.append(uy)
        if not np.isfinite(uy):
            raise FloatingPointError(f"{label}: diverged at step {done}")
        print(f"#   {label} step {done}/{n} t={float(s.state.time):.2f} "
              f"dt={float(s.params.dt):.1e} probe_v={uy:+.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    return series


def main():
    os.makedirs(CACHE, exist_ok=True)
    u_c = p_c = h_c = None
    t_c = 0.0
    series_all = []

    for size in SIZES:
        ck = os.path.join(CACHE, f"developed_{size}.npz")
        if os.path.exists(ck):
            d = np.load(ck)
            u_c, p_c, h_c, t_c = (d["u"].astype(np.float32),
                                  d["p"].astype(np.float32),
                                  float(d["h"]), float(d["t"]))
            print(f"# level {size}: cached (t={t_c:.2f})", flush=True)
            continue
        s = make_solver(size)
        if u_c is not None:
            prolong_into(s, u_c, p_c, h_c)
        if size == DEVELOP_SIZE:
            # develop: march until several shedding periods have passed
            perturb_wake(s)
            stall = 0
            while float(s.state.time) < T_DEVELOP and stall < 3:
                t_before = float(s.state.time)
                series_all += run_steps(s, 600, size, label=f"L{size}")
                stall = stall + 1 if float(s.state.time) <= t_before else 0
        else:
            series_all += run_steps(s, HEAL_STEPS[size], size,
                                    label=f"L{size}")
        u_c, p_c, h_c = grid_fields(s)
        t_c = float(s.state.time)
        np.savez_compressed(ck, u=u_c.astype(np.float16),
                            p=p_c.astype(np.float16), h=h_c, t=t_c)
        print(f"# level {size} done: t={t_c:.2f}", flush=True)

    tail = np.array(series_all[-40:]) if len(series_all) >= 10 else np.array(series_all)
    amp = float(tail.max() - tail.min()) if len(tail) else 0.0
    meta = dict(viscosity=VISCOSITY, density=DENSITY, time=t_c,
                grid=[int(x) for x in (u_c.shape[0], u_c.shape[1])],
                probe_v_amplitude=amp, probe_xy=list(PROBE_XY))
    np.savez_compressed(OUT, u=u_c.astype(np.float16),
                        p=p_c.astype(np.float16), h=np.float32(h_c),
                        meta=json.dumps(meta))
    print(f"# wrote {OUT}: grid={meta['grid']} t={t_c:.2f} "
          f"probe_v_amplitude={amp:.3f}", flush=True)
    if amp < 0.05:
        print("# WARNING: wake probe amplitude small — "
              "state may not be shedding yet", flush=True)


if __name__ == "__main__":
    main()
