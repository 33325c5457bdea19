"""Measure the Strouhal number and force coefficients of the developed
vortex street — the classical physics validation of the north-star config.

Restricts the 1M developed checkpoint (bench_developed_1m.npz, Re=160) onto
the 0.0068 mesh (~62k cells) where steps are cheap, heals, then integrates
several shedding periods recording Cd/Cl from cfd2_tpu.utils.forces.
Prints a JSON line: {"St": ..., "Cd_mean": ..., "Cl_amp": ..., ...}.

Literature anchors: an unconfined cylinder at Re=160 sheds at St ~= 0.19
with Cd ~= 1.3; this channel's 40% blockage (D=0.4 in H=1) raises both
(confinement accelerates the gap flow).  The point of the number is that a
coherent, periodic Cl(t) exists at all — a steady or degenerate state gives
amplitude ~0 and St = 0.

Usage: python tools/measure_strouhal.py [size] [t_span_seconds]
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
    size = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0068
    t_span = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    heal_steps = int(os.environ.get("HEAL_STEPS", "150"))
    batch = int(os.environ.get("BATCH", "10"))

    from make_developed import OUT as CKPT, make_solver, prolong_into
    from cfd2_tpu.models.coupled import multi_step_adaptive
    from cfd2_tpu.utils.forces import (force_coefficients,
                                       obstacle_face_mask, strouhal_number)

    d = np.load(CKPT)
    meta = json.loads(str(d["meta"]))
    u_c = d["u"].astype(np.float32)
    p_c = d["p"].astype(np.float32)
    h_c = float(d["h"])

    s = make_solver(size)
    s.set_viscosity(meta["viscosity"])
    prolong_into(s, u_c, p_c, h_c)
    w = obstacle_face_mask(s.mesh)

    def steps(n):
        s.state, s.params, _ = multi_step_adaptive(
            s.mesh, s.state, s.params, s.config, n,
            target_cfl=0.4, min_cell_size=size, amg=s._get_amg())

    t0 = time.time()
    steps(heal_steps)
    print(f"# healed {heal_steps} steps to t={float(s.state.time):.2f} "
          f"({time.time()-t0:.0f}s incl. compile)", flush=True)

    times, cds, cls = [], [], []
    t_start = float(s.state.time)
    t0 = time.time()
    k = 0
    while float(s.state.time) - t_start < t_span:
        steps(batch)
        cd, cl = force_coefficients(s.mesh, s.state, s.params, w,
                                    u_ref=1.0, d_ref=0.4)
        times.append(float(s.state.time))
        cds.append(float(cd))
        cls.append(float(cl))
        k += 1
        if k % 50 == 0:
            print(f"#  t={times[-1]:.2f} Cd={cds[-1]:.3f} Cl={cls[-1]:+.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if not np.isfinite(cds[-1]):
            raise FloatingPointError("diverged")

    times = np.array(times)
    cls_a = np.array(cls)
    dts = np.diff(times, prepend=times[0] - (times[1] - times[0]))
    st = strouhal_number(cls_a, dts, u_ref=1.0, d_ref=0.4)
    tail = cls_a[len(cls_a) // 3:]
    out = {
        "St": round(st, 4),
        "Cd_mean": round(float(np.mean(cds[len(cds) // 3:])), 4),
        "Cl_amp": round(float(tail.max() - tail.min()) / 2, 4),
        "Re": round(0.4 / meta["viscosity"]),
        "cells": s.mesh.num_host_cells,
        "t_span": round(float(times[-1] - times[0]), 2),
        "samples": len(times),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
