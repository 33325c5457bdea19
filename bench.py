"""Benchmark harness: cell-updates/sec on the channel-obstacle case.

Mirrors the reference's criterion benches (benches/gpu_dispatch_benchmark.rs:
59-130, Throughput::Elements(num_cells) => cell-updates/sec) on the
BASELINE.json north-star configuration (channel with circular obstacle).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The headline measures the BASELINE.json config verbatim: a *developed*
vortex-shedding state at ~1M cells (loaded from ``bench_developed_1m.npz``,
produced by tools/make_developed.py: Re=80 grid-cascade warmup, wake-probe
oscillation checked), timed at the reference's strict tolerances.  Three
lines are measured and embedded in the JSON:

* ``from_rest``  — 5 steps from an impulsive start (round-1/2 continuity);
* ``developed``  — 5 steps on the developed state (THE headline; 3 untimed
  heal steps first to wash out the checkpoint's f16 rounding);
* ``reference_outer`` — the developed state re-timed with the outer-loop
  acceleration disabled (alpha_u_final=0, outer_pressure_patience=0): the
  A/B defending those deviations (VERDICT r2 next #4).

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is computed
against ESTIMATED_WGPU_BASELINE, an estimate of the reference's throughput
derived from its only quantified in-tree perf statement: enabling debug reads
adds ~65 ms/step and is described as significant overhead relative to the
solve (coupled_solver.rs:22-25), placing its normal step at O(50-100 ms) on
its ~9k-cell bench mesh — about 1e5..2e5 cell-updates/sec.  We take the
upper end (2e5).  Re-measure with
`cargo bench --bench gpu_dispatch_benchmark` on comparison hardware for a
hard number.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
# Executable-level persistence (runtime/aot_cache.py): a second bench run
# skips Mosaic/XLA compiles entirely.  compile_first_step_s then reports the
# lower+load time; the JSON carries aot_cache_entries so the number is
# interpretable.  Set CFD2_AOT_CACHE= (empty) to disable.
os.environ.setdefault("CFD2_AOT_CACHE", "1")
os.environ.setdefault("CFD2_AOT_CACHE_DIR", "/root/repo/.aot_cache")
# A driver/cold run compiles once and exits: skip executable serialization
# (it costs seconds at 1M with zero chance of a later hit).  Repeat-run
# users export CFD2_AOT_STORE=1 to persist executables.
os.environ.setdefault("CFD2_AOT_STORE", "0")
os.environ.setdefault("CFD2_AOT_TIME", "1")   # phase decomposition lines

ESTIMATED_WGPU_BASELINE = 2.0e5  # cell-updates/sec (see module docstring)
# Developed-state checkpoint; override (e.g. bench_developed_2m.npz from
# tools/make_developed_2m.py) to measure the developed line at other sizes.
# A grid-shape mismatch with the benched mesh skips the developed line.
DEVELOPED_STATE = os.environ.get(
    "BENCH_DEV_STATE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_developed_1m.npz"))


def _time_steps(s, steps, mode):
    import jax

    outer_iters = []
    linear_iters = []
    linear_totals = []
    t0 = time.time()
    for _ in range(steps):
        s.step(mode=mode)
        jax.block_until_ready(s.state.u)
        outer_iters.append(int(s.state.outer_iters))
        linear_iters.append(int(s.state.linear_iters))
        linear_totals.append(int(s.state.linear_iters_total))
    elapsed = time.time() - t0
    assert np.isfinite(s.get_u()).all(), "bench produced non-finite fields"
    return elapsed, outer_iters, linear_iters, linear_totals


def _measure(s, steps, mode, n, label):
    elapsed, outers, lins, ltot = _time_steps(s, steps, mode)
    sps = steps / elapsed
    print(f"# {label}: {steps} steps in {elapsed:.2f}s -> {sps:.2f} steps/s, "
          f"outer_iters={outers} linear_iters_total={ltot}", file=sys.stderr)
    return {"cell_updates_per_sec": round(n * sps, 1),
            "steps_per_sec": round(sps, 3),
            "outer_iters": outers, "last_linear_iters": lins,
            "linear_iters_total": ltot}


def run_bench(min_cell=None):
    t_start = time.time()
    budget = float(os.environ.get("BENCH_TIMEOUT", "1500"))
    if min_cell is None:
        min_cell = float(os.environ.get("BENCH_MIN_CELL", "0.0017"))
    steps = int(os.environ.get("BENCH_STEPS", "5"))
    # CFL-safe default timestep (inlet velocity 1, target CFL ~0.4).
    dt = float(os.environ.get("BENCH_DT", str(min(0.002, 0.4 * min_cell))))
    precond = int(os.environ.get("BENCH_PRECOND", "1"))  # 1 = AMG (default)

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.coupled import CoupledSolver

    t0 = time.time()
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, min_cell, min_cell, 1.2, (3.0, 1.0))
    t_mesh = time.time() - t0
    n = mesh.num_cells
    print(f"# mesh: {n} cells, {mesh.num_faces} faces ({t_mesh:.1f}s)",
          file=sys.stderr)

    s = CoupledSolver(mesh,
                      pad_rows_to=int(os.environ.get("BENCH_PAD_ROWS", "1")),
                      pad_cols_to=int(os.environ.get("BENCH_PAD_COLS", "1")))
    s.set_dt(dt)
    s.set_viscosity(0.01)
    s.set_density(1.0)
    s.set_precond_type(precond)
    # Cap restarts for benching: steady-state solves use 1-2 restarts; the
    # cap only trims the cold-start worst case (the device tunnel kills
    # executions that run for minutes).
    from dataclasses import replace as _rep
    bf16 = os.environ.get("BENCH_BF16", "")   # "basis,pc" to enable
    s.config = _rep(s.config,
                    fgmres_max_restarts=int(os.environ.get(
                        "BENCH_MAX_RESTARTS", "5")),
                    precond_mom_sweeps=int(os.environ.get(
                        "BENCH_MOM_SWEEPS", "0")),   # 0 = size-auto
                    fgmres_basis_bf16="basis" in bf16,
                    precond_bf16="pc" in bf16,
                    precond_vcycles=int(os.environ.get("BENCH_VCYCLES", "0")),
                    precond_mom_adi=int(os.environ.get("BENCH_MOM_ADI", "0")),
                    fgmres_incycle_window=int(os.environ.get(
                        "BENCH_INCYCLE", "0")),
                    fgmres_mixed_phase=os.environ.get(
                        "BENCH_MIXED", "0") == "1",
                    extrapolate_guess=os.environ.get(
                        "BENCH_EXTRAP", "0") == "1",
                    adaptive_linear_tol=os.environ.get(
                        "BENCH_ADAPTIVE", "0") == "1",
                    presolve_pressure_iters=int(os.environ.get(
                        "BENCH_PRESOLVE", "0")),
                    fgmres_recycle=int(os.environ.get("BENCH_RECYCLE", "0")))
    u0 = np.zeros((n, 2))
    u0[mesh.cell_cx < min_cell * 2, 0] = 1.0
    s.set_u(u0)

    import jax
    # The fused zero-round-trip step is the flagship path (DESIGN.md §4/§9).
    # The ladder retries the same size in host mode (one device execution per
    # outer corrector — shorter programs) if fused times out.
    mode = os.environ.get("BENCH_MODE", "fused")
    print(f"# step mode: {mode}", file=sys.stderr)
    t0 = time.time()
    s._get_amg()
    print(f"# amg hierarchy build: {time.time() - t0:.1f}s", file=sys.stderr)
    s.step(mode=mode)
    jax.block_until_ready(s.state.u)
    t_compile = time.time() - t0
    print(f"# compile+first step: {t_compile:.1f}s", file=sys.stderr)
    s.step(mode=mode)
    jax.block_until_ready(s.state.u)

    from_rest = _measure(s, steps, mode, n, "from_rest")

    # ------------------------------------------------------------------
    # Developed vortex-shedding state (the BASELINE.json config verbatim).
    developed = reference_outer = None
    dev_meta = None
    if os.path.exists(DEVELOPED_STATE) and s.mesh.grid_shape is not None \
            and os.environ.get("BENCH_SKIP_DEVELOPED") != "1":
        d = np.load(DEVELOPED_STATE)
        meta = json.loads(str(d["meta"]))
        if tuple(meta["grid"]) == tuple(s.mesh.grid_shape):
            from dataclasses import replace as _rp
            import jax.numpy as jnp
            ny, nx = s.mesh.grid_shape
            u = jnp.asarray(d["u"].astype(np.float32).reshape(ny * nx, 2))
            p = jnp.asarray(d["p"].astype(np.float32).reshape(ny * nx))
            valid = s.mesh.c_valid
            u = u * valid[:, None]
            p = p * valid
            s.state = _rp(s.state, u=u, u_old=u, u_old_old=u, prev_u=u, p=p)
            s.set_viscosity(meta["viscosity"])
            dev_meta = {"time": meta["time"],
                        "probe_v_amplitude": meta["probe_v_amplitude"],
                        "viscosity": meta["viscosity"]}
            print(f"# developed state: t={meta['time']:.1f}s Re="
                  f"{0.4 / meta['viscosity']:.0f} probe_v_amp="
                  f"{meta['probe_v_amplitude']:.3f}", file=sys.stderr)
            for _ in range(3):   # heal f16 checkpoint rounding (untimed)
                s.step(mode=mode)
            jax.block_until_ready(s.state.u)
            developed = _measure(s, steps, mode, n, "developed")

            # The A/B line needs a full recompile (config is static); skip
            # it when the child is close to its watchdog budget — losing
            # the A/B beats losing the whole developed headline to a
            # timeout (the parent would fall back to a small mesh).
            ab_ok = time.time() - t_start < 0.55 * budget
            if not ab_ok:
                print("# skipping A/B recompile (near watchdog budget)",
                      file=sys.stderr)
            if ab_ok and os.environ.get("BENCH_SKIP_AB") != "1":
                # A/B: reference outer-loop policy (no alpha ramp, no
                # plateau patience) on the same developed state.
                s.config = _rep(s.config, alpha_u_final=0.0,
                                outer_pressure_patience=0)
                t0 = time.time()
                s.step(mode=mode)   # recompile (config is static)
                jax.block_until_ready(s.state.u)
                print(f"# A/B recompile: {time.time() - t0:.1f}s",
                      file=sys.stderr)
                reference_outer = _measure(s, steps, mode, n,
                                           "reference_outer")
        else:
            print(f"# developed checkpoint grid {meta['grid']} != mesh grid "
                  f"{s.mesh.grid_shape}; skipping", file=sys.stderr)

    head = developed if developed is not None else from_rest
    state_name = "developed" if developed is not None else "from_rest"
    out = {
        "metric": (f"cell-updates/sec, channel-obstacle {n} cells, "
                   f"coupled step, {state_name} state"),
        "value": head["cell_updates_per_sec"],
        "unit": "cell-updates/sec",
        "vs_baseline": round(head["cell_updates_per_sec"]
                             / ESTIMATED_WGPU_BASELINE, 3),
        "steps_per_sec": head["steps_per_sec"],
        "cells": n,
        "state": state_name,
        "compile_first_step_s": round(t_compile, 1),
        "aot_cache_entries": len([f for f in os.listdir(
            os.environ.get("CFD2_AOT_CACHE_DIR", ".aot_cache"))
            if f.endswith(".pjrt")]) if os.path.isdir(
            os.environ.get("CFD2_AOT_CACHE_DIR", ".aot_cache")) else 0,
        "from_rest": from_rest,
    }
    if developed is not None:
        out["developed"] = {**developed, **(dev_meta or {})}
    if reference_outer is not None:
        out["reference_outer"] = reference_outer
    print(json.dumps(out))


def main():
    """Run the bench in a child process with a hang watchdog: the tunnelled
    TPU compiler's time for 1M-shaped programs ranges from ~3 minutes to
    (occasionally) wedged-forever, so on timeout we fall back to smaller
    north-star-family sizes rather than report nothing."""
    if os.environ.get("BENCH_CHILD") == "1":
        run_bench()
        return

    import subprocess

    def wait_healthy(max_checks=20):
        """A crashed/wedged worker auto-restarts in a few minutes; gate the
        next attempt on a tiny device program succeeding."""
        probe = ("import jax, jax.numpy as jnp; "
                 "jnp.ones((64,64)).sum().block_until_ready()")
        for i in range(max_checks):
            try:
                r = subprocess.run([sys.executable, "-c", probe],
                                   timeout=90, capture_output=True)
                if r.returncode == 0:
                    return True
            except subprocess.TimeoutExpired:
                pass
            print(f"# device unhealthy (check {i + 1}); waiting",
                  file=sys.stderr)
            time.sleep(40)
        return False

    ladder = os.environ.get("BENCH_LADDER", "0.0017,0.004,0.008").split(",")
    budget = float(os.environ.get("BENCH_TIMEOUT", "1500"))
    modes = ([os.environ["BENCH_MODE"]] if os.environ.get("BENCH_MODE")
             else ["fused", "host"])
    first = True
    for size in ladder:
        for mode in modes:
            if not first and not wait_healthy():
                raise SystemExit("device never became healthy again")
            first = False
            env = dict(os.environ, BENCH_CHILD="1", BENCH_MIN_CELL=size,
                       BENCH_MODE=mode)
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, timeout=budget, capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                print(f"# size {size} mode {mode}: timed out after "
                      f"{budget:.0f}s; falling back", file=sys.stderr)
                continue
            sys.stderr.write(proc.stderr)
            lines = [ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")]
            if proc.returncode == 0 and lines:
                print(lines[-1])
                return
            print(f"# size {size} mode {mode}: failed "
                  f"(rc={proc.returncode}); falling back", file=sys.stderr)
    raise SystemExit("bench failed at every ladder size")


if __name__ == "__main__":
    main()
