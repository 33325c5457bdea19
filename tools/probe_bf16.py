"""Micro-profile the bf16 levers at 1M-cell planar shapes: momentum sweeps
and the CGS basis pass, f32 vs bf16, value-read synced (memory note: don't
trust block_until_ready through the tunnel)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

ny, nx = 589, 1765
rng = np.random.default_rng(0)
f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)

off = f(4, ny, nx) * 0.1
dinv = f(ny, nx) * 0.01 + 1.0
r_u = f(ny, nx); r_v = f(ny, nx)

def shifts2(xg):
    e = jnp.concatenate([xg[:, 1:], xg[:, -1:]], axis=1)
    w = jnp.concatenate([xg[:, :1], xg[:, :-1]], axis=1)
    n = jnp.concatenate([xg[1:], xg[-1:]], axis=0)
    s = jnp.concatenate([xg[:1], xg[:-1]], axis=0)
    return e, w, n, s

def dot4(o, sh):
    return o[0]*sh[0] + o[1]*sh[1] + o[2]*sh[2] + o[3]*sh[3]

def mom_solve(di, of, ru, rv, sweeps=8):
    z_u = di * ru; z_v = di * rv
    for _ in range(sweeps - 1):
        z_u = di * (ru - dot4(of, shifts2(z_u)))
        z_v = di * (rv - dot4(of, shifts2(z_v)))
    return z_u, z_v

def timeit(fn, *args, reps=20, label=""):
    jfn = jax.jit(fn)
    v = jfn(*args); v = float(jnp.sum(v[0]) if isinstance(v, tuple) else jnp.sum(v))
    t0 = time.time(); out = jfn(*args)
    v = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    el = (time.time() - t0 - 0.030) / reps
    print(f"{label}: {el*1e3:.3f} ms/rep", flush=True)

def mom_loop(di, of, ru, rv):
    def body(k, carry):
        zu, zv = mom_solve(di, of, ru + carry[0]*1e-30, rv)
        return (zu, zv)
    return lax.fori_loop(0, 20, body, (ru, rv))

timeit(mom_loop, dinv, off, r_u, r_v, label="momentum m8 f32")
timeit(mom_loop, dinv.astype(jnp.bfloat16), off.astype(jnp.bfloat16),
       r_u.astype(jnp.bfloat16), r_v.astype(jnp.bfloat16),
       label="momentum m8 bf16")

# CGS pass: 24 active rows of a (3, ny, nx) basis, dots + projection.
V = f(24, 3, ny, nx)
w = f(3, ny, nx)

def cgs(Vb, wv):
    def body(k, wc):
        d = jnp.sum(Vb * wc[None], axis=(1, 2, 3))
        proj = jnp.sum(d[:, None, None, None] * Vb, axis=0)
        return wc - proj * 1e-30
    return lax.fori_loop(0, 20, body, wv)

timeit(cgs, V, w, label="CGS 24-row f32")
timeit(cgs, V.astype(jnp.bfloat16), w, label="CGS 24-row bf16V")

# V-cycle-ish smoother plane pass in both dtypes (5-plane stencil op)
P = f(4, ny, nx) * 0.1
def smooth_loop(Po, di, rr):
    def body(k, x):
        return di * (rr - dot4(Po, shifts2(x)))
    return lax.fori_loop(0, 20, body, rr)
timeit(smooth_loop, P, dinv, r_u, label="pressure sweep f32")
timeit(smooth_loop, P.astype(jnp.bfloat16), dinv.astype(jnp.bfloat16),
       r_u.astype(jnp.bfloat16), label="pressure sweep bf16")
