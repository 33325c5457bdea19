"""Bare FGMRES loop overhead at 1M planar shapes: trivial matvec/precond so
everything measured is CGS + Givens/Hessenberg logic + basis writes +
while-loop plumbing.  Compares against the component roofline (CGS alone
measured 0.83 ms/iter at 24 live rows)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

from cfd2_tpu.ops.fgmres import fgmres_solve

ny, nx = 589, 1765
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal((3, ny, nx)), jnp.float32)

mv = lambda x: x * 1.0001 + 0.0001 * jnp.roll(x, 1, axis=-1)
pc = lambda r: r * 0.999

for m, tag in ((30, "30-iter cycle"), (50, "50-iter cycle")):
    @jax.jit
    def run(bb, m=m):
        return fgmres_solve(mv, pc, bb, jnp.zeros_like(bb), restart=m,
                            max_restarts=1, tol=1e-30, abstol=1e-30)
    r = run(b); it = int(r.iterations)
    t0 = time.time(); r = run(b); it = int(r.iterations)
    el = time.time() - t0 - 0.030
    print(f"{tag}: {el*1e3:.1f} ms, iters={it}, {el/max(it,1)*1e3:.2f} "
          f"ms/iter (loop+CGS only)", flush=True)
