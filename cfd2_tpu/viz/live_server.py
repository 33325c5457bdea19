"""Live web viewer: watch and steer a running simulation.

The interactive half of the reference's egui application contract
(src/ui/app.rs:567-948): a background solver thread steps the simulation
continuously (adaptive dt, like the reference's Run loop at app.rs:867-948)
while an HTTP server serves a page that re-renders the current field and
accepts control commands — run/pause, field switching, inlet velocity and
under-relaxation changes mid-run — the reference's side-panel controls
(app.rs:573-836) minus the desktop toolkit.

Zero external dependencies: http.server + a long-poll JS page.  Field frames
are rendered on demand from the *live* solver state (the analogue of the
reference renderer binding the solver's state buffer zero-copy,
cfd_renderer.rs:60-324 — here the snapshot is pulled once per frame request).
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>cfd2_tpu live</title><style>
body { font-family: sans-serif; margin: 1em; background: #111; color: #eee; }
img { max-width: 100%%; border: 1px solid #444; }
button, select, input { margin: 0 .3em; padding: .3em .8em; }
#stats { font-family: monospace; white-space: pre; margin: .6em 0; }
</style></head><body>
<h3>cfd2_tpu — live simulation</h3>
<div>
<button onclick="ctl('pause')">Pause</button>
<button onclick="ctl('resume')">Run</button>
<select id="field" onchange="ctl('field='+this.value)">
<option>mag</option><option>u</option><option>v</option><option>p</option>
<option>d_p</option></select>
<label>inlet <input id="inlet" size="4" value="%(inlet)s"
 onchange="ctl('inlet='+this.value)"></label>
</div>
<div id="stats">connecting...</div>
<img id="frame" src="/frame.png">
<script>
function ctl(q) { fetch('/control?' + q); }
async function tick() {
  try {
    const r = await fetch('/status'); const s = await r.json();
    document.getElementById('stats').textContent =
      `step ${s.step}  t=${s.time.toFixed(4)}  dt=${s.dt.toExponential(2)}` +
      `  outer=${s.outer_iters}  max|u|=${s.max_vel.toFixed(3)}` +
      `  ${s.paused ? 'PAUSED' : (s.should_stop ? 'STOPPED' : 'running')}`;
    if (!s.paused && !s.should_stop)
      document.getElementById('frame').src = '/frame.png?ts=' + Date.now();
  } catch (e) {}
  setTimeout(tick, 700);
}
tick();
</script></body></html>"""


class LiveSolverThread(threading.Thread):
    """Steps the solver until stopped; pausable; publishes step stats."""

    def __init__(self, sim, max_steps: int = 0):
        super().__init__(daemon=True)
        self.sim = sim
        self.max_steps = max_steps
        self.lock = threading.Lock()
        self.running = threading.Event()
        self.running.set()
        self.shutdown = False
        self.step_i = 0
        self.stats = {"step": 0, "time": 0.0, "dt": 0.0, "outer_iters": 0,
                      "max_vel": 0.0, "should_stop": False}

    def run(self):
        s = self.sim.solver
        while not self.shutdown:
            if not self.running.is_set():
                time.sleep(0.05)
                continue
            if self.max_steps and self.step_i >= self.max_steps:
                break
            with self.lock:
                if self.sim.adaptive:
                    max_vel = float(np.linalg.norm(s.get_u(), axis=1).max())
                    s.set_dt(self.sim.controller.next_dt(
                        float(s.params.dt), max_vel))
                else:
                    max_vel = float(np.linalg.norm(s.get_u(), axis=1).max())
                s.step()
                self.step_i += 1
                self.stats = {
                    "step": self.step_i,
                    "time": float(s.state.time),
                    "dt": float(s.params.dt),
                    "outer_iters": int(s.state.outer_iters),
                    "max_vel": max_vel,
                    "should_stop": bool(s.should_stop),
                }
            if s.should_stop:
                break

    # --- control surface (reference setters, solver.rs:36-95) ---
    def pause(self):
        self.running.clear()

    def resume(self):
        self.running.set()

    def set_inlet(self, v: float):
        with self.lock:
            self.sim.solver.set_inlet_velocity(v)

    def set_alpha_u(self, a: float):
        with self.lock:
            self.sim.solver.set_alpha_u(a)

    def status(self):
        """Latest step stats — lock-free (must not block on a stepping or
        compiling solver; dict replacement is atomic under the GIL)."""
        return dict(self.stats, paused=not self.running.is_set())

    def snapshot(self):
        """Host copies of the live fields (consistent under the step lock)."""
        s = self.sim.solver
        with self.lock:
            return (type("S", (), {
                "u": s.get_u(), "p": s.get_p(), "d_p": s.get_d_p()})(),
                dict(self.stats, paused=not self.running.is_set()))


def make_handler(worker: LiveSolverThread, renderer, inlet: float):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):            # quiet
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            if url.path == "/":
                self._send(200, "text/html",
                           (_PAGE % {"inlet": inlet}).encode())
            elif url.path == "/status":
                self._send(200, "application/json",
                           json.dumps(worker.status()).encode())
            elif url.path == "/frame.png":
                field = q.get("field", [self.server.field])[0]
                state, _ = worker.snapshot()
                fig = renderer.render(state, mode=field)
                buf = io.BytesIO()
                fig.savefig(buf, format="png", bbox_inches="tight")
                import matplotlib.pyplot as plt
                plt.close(fig)
                self._send(200, "image/png", buf.getvalue())
            elif url.path == "/control":
                if "field" in q:
                    self.server.field = q["field"][0]
                if "inlet" in q:
                    worker.set_inlet(float(q["inlet"][0]))
                if "alpha_u" in q:
                    worker.set_alpha_u(float(q["alpha_u"][0]))
                cmd = (url.query or "").split("=")[0]
                if cmd == "pause" or "pause" in q:
                    worker.pause()
                elif cmd == "resume" or "resume" in q:
                    worker.resume()
                self._send(200, "application/json", b'{"ok": true}')
            else:
                self._send(404, "text/plain", b"not found")

    return Handler


class LiveServer:
    """Serve a live view of ``sim`` (an app.driver.Simulation)."""

    def __init__(self, sim, host: str = "127.0.0.1", port: int = 8787,
                 max_steps: int = 0):
        from .renderer import FieldRenderer
        self.worker = LiveSolverThread(sim, max_steps=max_steps)
        handler = make_handler(self.worker, FieldRenderer(sim.mesh),
                               sim.inlet_velocity)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.field = "mag"
        self.host, self.port = self.httpd.server_address

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/"

    def start(self):
        self.worker.start()
        self._srv = threading.Thread(target=self.httpd.serve_forever,
                                     daemon=True)
        self._srv.start()
        return self

    def stop(self):
        self.worker.shutdown = True
        self.worker.resume()
        self.httpd.shutdown()

    def serve_until_done(self):
        """Block until the solver thread finishes (max_steps/should_stop)."""
        try:
            while self.worker.is_alive():
                self.worker.join(timeout=0.5)
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()
