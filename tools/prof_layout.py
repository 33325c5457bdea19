"""Layout/relayout micro-probe at the benchmark size.

Quantifies the cost of the T(1024) linear <-> T(8,128) tiled layout
transitions the flattened-FGMRES formulation forces on every iteration
(flat (D,) Krylov vectors vs (3, ny, nx) stencil operands), and compares
CGS formulations:

  reshape_f2p / reshape_p2f — flat <-> planar reshape alone
  cgs_flat   — (m+1, D) @ (D,) matmul (current formulation)
  cgs_tiled  — (m+1, 3, ny, nx) multiply-reduce, no layout change
  proj_flat / proj_tiled — the d @ V projection side

Usage: python tools/prof_layout.py [ny nx]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ny = int(sys.argv[1]) if len(sys.argv) > 1 else 589
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 1765
    D = 3 * ny * nx
    m = 50
    ch = 9   # chunk rows

    key = jax.random.PRNGKey(0)
    xp = jax.random.normal(key, (3, ny, nx), jnp.float32)
    xf = jax.random.normal(key, (D,), jnp.float32)
    Vf = jax.random.normal(key, (m + 1, D), jnp.float32)
    Vp = jax.random.normal(key, (m + 1, 3, ny, nx), jnp.float32)
    d = jax.random.normal(key, (ch,), jnp.float32)

    ms0 = timeit(jax.jit(lambda v: v[0, 0] + 1.0), xp)  # launch floor
    print(f"launch       {ms0:8.3f} ms", flush=True)

    ms = timeit(jax.jit(lambda a: (a.reshape(D) + 1.0)), xp)
    print(f"reshape_p2f  {ms:8.3f} ms  (planar->flat + add)", flush=True)
    ms = timeit(jax.jit(lambda a: (a.reshape(3, ny, nx) + 1.0)), xf)
    print(f"reshape_f2p  {ms:8.3f} ms  (flat->planar + add)", flush=True)
    ms = timeit(jax.jit(lambda a: a + 1.0), xf)
    print(f"add_flat     {ms:8.3f} ms  ({D*8/ (ms-ms0)*1e3/1e9:.0f} GB/s)",
          flush=True)
    ms = timeit(jax.jit(lambda a: a + 1.0), xp)
    print(f"add_planar   {ms:8.3f} ms", flush=True)

    # CGS chunk: dots for ch rows + projection, flat matmul form.
    f_flat = jax.jit(lambda V, w: V[:ch] @ w)
    ms = timeit(f_flat, Vf, xf)
    bytes_ = (ch * D + D) * 4
    print(f"cgs_flat     {ms:8.3f} ms  ({bytes_/(ms-ms0)*1e3/1e9:.0f} GB/s)",
          flush=True)

    f_tiled = jax.jit(lambda V, w: jnp.sum(V[:ch] * w[None], axis=(1, 2, 3)))
    ms = timeit(f_tiled, Vp, xp)
    print(f"cgs_tiled    {ms:8.3f} ms  ({bytes_/(ms-ms0)*1e3/1e9:.0f} GB/s)",
          flush=True)

    f_projf = jax.jit(lambda dd, V: dd @ V[:ch])
    ms = timeit(f_projf, d, Vf)
    print(f"proj_flat    {ms:8.3f} ms", flush=True)
    f_projt = jax.jit(lambda dd, V: jnp.sum(
        dd[:, None, None, None] * V[:ch], axis=0))
    ms = timeit(f_projt, d, Vp)
    print(f"proj_tiled   {ms:8.3f} ms", flush=True)

    # Dynamic row update (V written each iteration).
    f_updf = jax.jit(lambda V, w, j: jax.lax.dynamic_update_index_in_dim(
        V, w, j, 0))
    ms = timeit(f_updf, Vf, xf, jnp.int32(3))
    print(f"rowupd_flat  {ms:8.3f} ms", flush=True)
    f_updp = jax.jit(lambda V, w, j: jax.lax.dynamic_update_index_in_dim(
        V, w, j, 0))
    ms = timeit(f_updp, Vp, xp, jnp.int32(3))
    print(f"rowupd_tiled {ms:8.3f} ms", flush=True)

    # Stencil op on planar vs flat-roundtrip input.
    def stencil(a):
        e = jnp.concatenate([a[:, :, 1:], a[:, :, -1:]], axis=2)
        w = jnp.concatenate([a[:, :, :1], a[:, :, :-1]], axis=2)
        n = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        s = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        return a * 2.0 - 0.5 * (e + w + n + s)

    ms = timeit(jax.jit(stencil), xp)
    print(f"stencil_pl   {ms:8.3f} ms", flush=True)
    f_st_flat = jax.jit(lambda af: stencil(af.reshape(3, ny, nx)).reshape(D))
    ms = timeit(f_st_flat, xf)
    print(f"stencil_flat {ms:8.3f} ms  (incl both reshapes)", flush=True)


if __name__ == "__main__":
    main()
