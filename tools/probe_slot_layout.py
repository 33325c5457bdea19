"""Probe 3: are (N, K=8) f32 slot arrays tile-padded (16x traffic) on TPU?
Times sum(coeff * xg, axis=last) in (N, 8) vs (8, N) layouts at 1M cells,
plus the XLA (N,K) gather baseline for reference."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 1_000_000
K = 8
rng = np.random.default_rng(0)
coef_nk = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
coef_kn = jnp.asarray(np.asarray(coef_nk).T.copy())
x = jnp.asarray(rng.standard_normal((N,)), jnp.float32)
idx = jnp.asarray(rng.integers(0, N, (N, K)), jnp.int32)
idx_kn = jnp.asarray(np.asarray(idx).T.copy())

def timeit(fn, *args, reps=20, label=""):
    jfn = jax.jit(fn)
    v = float(jnp.sum(jfn(*args)))
    t0 = time.time(); v = float(jnp.sum(jfn(*args)))
    el = (time.time() - t0 - 0.030) / reps
    print(f"{label}: {el*1e3:.3f} ms/rep", flush=True)

def red_nk(c, xv):
    def body(i, acc):
        y = jnp.sum(c * (xv + acc * 1e-30)[:, None], axis=1)
        return y
    return lax.fori_loop(0, 20, body, xv)

def red_kn(c, xv):
    def body(i, acc):
        y = jnp.sum(c * (xv + acc * 1e-30)[None, :], axis=0)
        return y
    return lax.fori_loop(0, 20, body, xv)

timeit(red_nk, coef_nk, x, label="(N,8) slot reduce")
timeit(red_kn, coef_kn, x, label="(8,N) slot reduce")

def gath_nk(xv, ix):
    def body(i, acc):
        g = (xv + acc * 1e-30)[ix]          # (N, K) gather
        return jnp.sum(g, axis=1)
    return lax.fori_loop(0, 5, body, xv)

def gath_kn(xv, ix):
    def body(i, acc):
        g = (xv + acc * 1e-30)[ix]          # (K, N) gather
        return jnp.sum(g, axis=0)
    return lax.fori_loop(0, 5, body, xv)

timeit(gath_nk, x, idx, reps=5, label="XLA gather (N,8)")
timeit(gath_kn, x, idx_kn, reps=5, label="XLA gather (8,N)")
