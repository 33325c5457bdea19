"""Probe: does take_along_axis lower to tpu.dynamic_gather in Pallas, and how
fast is it vs the XLA gather (measured 6 GB/s effective in round 1)?

Timing per memory note: sync by fetching a value; chain iterations to defeat
CSE; subtract nothing (report per-iteration from a 100x loop inside one jit).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = int(os.environ.get("PROBE_R", "4096"))   # rows (sublanes)
L = 128

def kern(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

@jax.jit
def lane_gather(x, idx):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)
idx = jnp.asarray(rng.integers(0, R, (R, L)), jnp.int32)

# correctness
out = lane_gather(x, idx)
ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
err = np.abs(np.asarray(out) - ref).max()
print(f"correct: max_err={err}", flush=True)

@jax.jit
def loop_pallas(x, idx):
    def body(k, acc):
        return lane_gather(x + acc * 1e-30, idx)
    return lax.fori_loop(0, 100, body, x)[0, 0]

@jax.jit
def loop_xla(x, idx):
    def body(k, acc):
        return jnp.take_along_axis(x + acc * 1e-30, idx, axis=0)
    return lax.fori_loop(0, 100, body, x)[0, 0]

for name, fn in [("pallas", loop_pallas), ("xla", loop_xla)]:
    v = float(fn(x, idx))  # compile+run
    t0 = time.time(); v = float(fn(x, idx)); el = time.time() - t0
    per = (el - 0.030) / 100
    gbs = (R * L * 4 * 3) / per / 1e9
    print(f"{name}: {per*1e6:.1f} us/gather ({R*L} elems) ~ {gbs:.0f} GB/s eff",
          flush=True)
