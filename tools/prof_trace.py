"""Kernel-level device trace of host-mode steps at the benchmark size.

Captures a jax.profiler trace of a few warmed steps and aggregates device
kernel durations by name — the ground truth for which kernels carry the
per-iteration cost (the piece-wise probes in prof_fgmres.py time whole
subprograms and can't see inside the FGMRES while_loop).

Usage: python tools/prof_trace.py [min_cell] [n_steps]
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np


def main():
    min_cell = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0017
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    logdir = "/tmp/cfd2_trace"

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.models.coupled import CoupledSolver

    t0 = time.time()
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    mesh = generate_cut_cell_mesh(geo, min_cell, min_cell, 1.2, (3.0, 1.0))
    s = CoupledSolver(mesh)
    s.set_dt(min(0.002, 0.4 * min_cell))
    s.set_viscosity(0.01)
    s.set_precond_type(1)
    from dataclasses import replace as _rep
    s.config = _rep(s.config, fgmres_max_restarts=5)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < min_cell * 2, 0] = 1.0
    s.set_u(u0)
    print(f"# mesh {s.mesh.num_cells} in {time.time()-t0:.0f}s", flush=True)

    for i in range(2):
        s.step(mode="host")
    jax.block_until_ready(s.state.u)
    print(f"# warm done ({time.time()-t0:.0f}s); tracing {n_steps} steps",
          flush=True)

    t0 = time.time()
    with jax.profiler.trace(logdir):
        for _ in range(n_steps):
            s.step(mode="host")
        jax.block_until_ready(s.state.u)
    wall = time.time() - t0
    print(f"# traced wall: {wall:.2f}s", flush=True)

    # Find the xplane file and aggregate device events.
    import glob
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, "no trace written"
    from jax.profiler import ProfileData
    pd = ProfileData.from_file(paths[-1])
    agg = defaultdict(lambda: [0.0, 0])
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                agg[ev.name][0] += dur
                agg[ev.name][1] += 1
    total = sum(v[0] for v in agg.values())
    print(f"# device total {total:.1f} ms over {wall*1e3:.0f} ms wall "
          f"({len(agg)} kernel names)")
    for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{ms:9.2f} ms  x{cnt:<6d} {ms/max(cnt,1):8.4f} ms/call  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
