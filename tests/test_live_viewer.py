"""Live viewer: the simulation must advance while served, pause/resume must
steer it, and frames/status must reflect the running state (the interactive
contract of the reference GUI, ui/app.rs:567-948)."""

import json
import time
import urllib.request

from cfd2_tpu.app.driver import Simulation
from cfd2_tpu.viz.live_server import LiveServer


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_live_server_runs_pauses_and_renders():
    sim = Simulation(geometry="rect", mesh_type="cutcell", cell_size=0.1)
    server = LiveServer(sim, port=0).start()
    try:
        base = server.url
        # Page serves.
        assert b"cfd2_tpu" in _get(base)

        # Steps advance.
        deadline = time.time() + 120
        while time.time() < deadline:
            s = json.loads(_get(base + "status"))
            if s["step"] >= 2:
                break
            time.sleep(0.3)
        assert s["step"] >= 2, f"solver did not advance: {s}"

        # Pause freezes the step counter.
        _get(base + "control?pause")
        time.sleep(0.5)
        s1 = json.loads(_get(base + "status"))
        assert s1["paused"]
        time.sleep(1.0)
        s2 = json.loads(_get(base + "status"))
        assert s2["step"] == s1["step"]

        # Field switch + live frame render (PNG magic).
        _get(base + "control?field=p")
        png = _get(base + "frame.png")
        assert png[:4] == b"\x89PNG"
        png_u = _get(base + "frame.png?field=u")
        assert png_u[:4] == b"\x89PNG"

        # Mid-run setter (reference set_inlet_velocity).
        _get(base + "control?inlet=0.5")
        assert float(sim.solver.params.inlet_velocity) == 0.5

        # Resume advances again.
        _get(base + "control?resume")
        deadline = time.time() + 60
        while time.time() < deadline:
            s3 = json.loads(_get(base + "status"))
            if s3["step"] > s2["step"]:
                break
            time.sleep(0.3)
        assert s3["step"] > s2["step"]
    finally:
        server.stop()
