"""Extend the developed vortex-shedding cascade one level finer: 2M cells.

Loads the 1M developed checkpoint (``bench_developed_1m.npz``, produced by
tools/make_developed.py), bilinearly prolongs (u, p) onto the h=0.0012 mesh
(~2M cells), heals a few hundred adaptive steps so the fine grid re-develops
its own wake, and writes ``bench_developed_2m.npz`` in the same format.

The reference's "scale the axis" evidence is mesh refinement on one GPU
(large_mesh_benchmark.rs:25-43, ~2M cells); this produces the honest
headline-metric state at that size so BENCH_SWEEP carries a developed 2M row
rather than only the from-rest transient.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

from make_developed import (  # noqa: E402
    OUT as OUT_1M,
    PROBE_XY,
    make_solver,
    grid_fields,
    prolong_into,
    run_steps,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "bench_developed_2m.npz")
SIZE = 0.0012
HEAL_STEPS = int(os.environ.get("HEAL_STEPS", "220"))


def main():
    d = np.load(OUT_1M)
    u_c = d["u"].astype(np.float32)
    p_c = d["p"].astype(np.float32)
    h_c = float(d["h"])
    meta_1m = json.loads(str(d["meta"]))
    print(f"# 1M checkpoint: grid={u_c.shape[:2]} h={h_c:.5f} "
          f"amp={meta_1m['probe_v_amplitude']:.3f}", flush=True)

    s = make_solver(SIZE)
    prolong_into(s, u_c, p_c, h_c)
    series = run_steps(s, HEAL_STEPS, SIZE, label=f"L{SIZE}")

    u_f, p_f, h_f = grid_fields(s)
    tail = np.array(series[-40:])
    amp = float(tail.max() - tail.min()) if len(tail) else 0.0
    meta = dict(viscosity=meta_1m["viscosity"], density=meta_1m["density"],
                time=float(s.state.time),
                grid=[int(x) for x in u_f.shape[:2]],
                probe_v_amplitude=amp, probe_xy=list(PROBE_XY))
    np.savez_compressed(OUT, u=u_f.astype(np.float16),
                        p=p_f.astype(np.float16), h=np.float32(h_f),
                        meta=json.dumps(meta))
    print(f"# wrote {OUT}: grid={meta['grid']} t={meta['time']:.3f} "
          f"probe_v_amplitude={amp:.3f}", flush=True)
    if amp < 0.05:
        print("# WARNING: wake probe amplitude small — "
              "state may not be shedding yet", flush=True)


if __name__ == "__main__":
    main()
