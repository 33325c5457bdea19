"""Pin the f64-norms accumulation dtype (VERDICT r3 #8).

`fgmres_f64_norms` promises float64 residual/norm accumulation for stiff
cases, but jnp silently downgrades `astype(float64)` to f32 unless
`jax_enable_x64` is set — so the only honest pin is to inspect the traced
jaxpr under BOTH settings.  x64 is a process-global flag, so the x64 case
runs in a subprocess (CPU backend).

The end-to-end stiff demo (water rho=1000 backwards-step at h=0.01 on
x64 CPU with the flag active — the reference's stiffest regression,
`/root/reference/tests/reproduce_divergence.rs`) is tools/stiff_water_x64.py;
its recorded run is STIFF_X64.json.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp

from cfd2_tpu.ops.fgmres import make_norm

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_X64_SNIPPET = r"""
import jax, jax.numpy as jnp
# sitecustomize preloads jax._src, so the JAX_ENABLE_X64 env var is read
# too late in this environment — set the config directly.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
from cfd2_tpu.ops.fgmres import make_norm
v = jnp.zeros((64,), jnp.float32)
jpr = str(jax.make_jaxpr(make_norm(True, jnp.float32))(v))
assert "f64" in jpr, jpr                      # accumulation really is f64
assert "f64[]" not in str(jax.eval_shape(make_norm(True, jnp.float32), v))
out = jax.eval_shape(make_norm(True, jnp.float32), v)
assert out.dtype == jnp.float32, out.dtype    # result cast back to f32
jpr32 = str(jax.make_jaxpr(make_norm(False, jnp.float32))(v))
assert "f64" not in jpr32, jpr32
print("OK")
"""


def test_f64_accumulation_dtype_with_x64():
    """Under jax_enable_x64 the f64_norms jaxpr accumulates in f64 and the
    result is cast back to the solve dtype."""
    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)   # no need for the 8-device mesh here
    r = subprocess.run([sys.executable, "-c", _X64_SNIPPET], env=env,
                       cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_f64_norms_noop_without_x64():
    """Without x64 the astype(float64) silently stays f32 — the documented
    no-op.  Assert it so a future jax version changing this gets noticed."""
    if jax.config.jax_enable_x64:
        import pytest
        pytest.skip("suite running with x64 enabled")
    v = jnp.zeros((64,), jnp.float32)
    jpr = str(jax.make_jaxpr(make_norm(True, jnp.float32))(v))
    assert "f64" not in jpr


def test_stiff_x64_demo_recorded():
    """The stiff-case demo (tools/stiff_water_x64.py) has been run with the
    flag active and stayed finite — the recorded evidence ships in-repo."""
    path = os.path.join(ROOT, "STIFF_X64.json")
    if not os.path.exists(path):
        import pytest
        pytest.skip("STIFF_X64.json not yet recorded")
    row = json.load(open(path))
    assert row["f64_norms_active"] is True
    assert row["x64"] is True
    assert row["density"] == 1000.0
    assert row["h"] <= 0.01
    assert row["finite"] is True
    assert row["steps"] >= 50
