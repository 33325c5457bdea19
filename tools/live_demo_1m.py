"""VERDICT r2 #7 closer: drive the live viewer on the 1M-cell north-star
mesh — start the server, let the solver step, pull /status and a rendered
frame (O(pixels) grid path), exercise a mid-run control, save the frame."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

from cfd2_tpu.app.driver import Simulation
from cfd2_tpu.viz.live_server import LiveServer


def get(url, timeout=600):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.read()


def main():
    cell = float(os.environ.get("LIVE_CELL", "0.0017"))
    t0 = time.time()
    sim = Simulation(geometry="channel", mesh_type="cutcell", cell_size=cell,
                     precond=1, dt0=min(0.002, 0.4 * cell))
    print(f"# mesh {sim.mesh.num_cells} cells ({time.time()-t0:.0f}s); "
          f"structured={sim.solver.mesh.structured}", flush=True)
    server = LiveServer(sim, port=0).start()
    base = server.url
    try:
        deadline = time.time() + float(os.environ.get("LIVE_WAIT", "900"))
        while time.time() < deadline:
            s = json.loads(get(base + "status"))
            print(f"# step {s['step']} busy={s['busy']} "
                  f"t={s['time']:.5f}", flush=True)
            if s["step"] >= 3:
                break
            time.sleep(10)
        assert s["step"] >= 3, "solver did not advance 3 steps"
        t0 = time.time()
        png = get(base + "frame.png?field=mag")
        dt_frame = time.time() - t0
        assert png[:4] == b"\x89PNG"
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "live_1m_frame.png")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        open(out, "wb").write(png)
        print(f"# frame rendered in {dt_frame:.2f}s -> {out} "
              f"({len(png)} bytes)", flush=True)
        # mid-run control against the live 1M solver
        get(base + "control?inlet=1.2")
        assert abs(float(sim.solver.params.inlet_velocity) - 1.2) < 1e-6
        print("# mid-run inlet control OK", flush=True)
        print(json.dumps({"cells": sim.mesh.num_cells,
                          "steps": s["step"],
                          "frame_seconds": round(dt_frame, 2)}), flush=True)
    finally:
        server.stop()


if __name__ == "__main__":
    main()
