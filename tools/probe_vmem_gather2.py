"""Probe 2: per-sublane (axis=1, within-128-lane-row) dynamic_gather in
Pallas — the single-vreg form v5e Mosaic supports — plus a multi-window
select-accumulate mesh-gather prototype."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512   # sublane rows
L = 128

def kern(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

@jax.jit
def row_gather(x, idx):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)
idx = jnp.asarray(rng.integers(0, L, (R, L)), jnp.int32)

out = row_gather(x, idx)
ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
print(f"axis1 correct: max_err={np.abs(np.asarray(out)-ref).max()}", flush=True)

@jax.jit
def loop_pallas(x, idx):
    def body(k, acc):
        return row_gather(acc * (1.0 + 1e-30) , idx)
    return lax.fori_loop(0, 100, body, x)[0, 0]

v = float(loop_pallas(x, idx))
t0 = time.time(); v = float(loop_pallas(x, idx)); el = time.time() - t0
per = (el - 0.030) / 100
print(f"axis1 pallas: {per*1e6:.1f} us per ({R},{L}) gather "
      f"-> {R*L/per/1e9:.2f} Gelem/s", flush=True)

# ----------------------------------------------------------------------
# Multi-window mesh-gather prototype: destination block of 128 cells pulls
# from W=9 source rows (its RCM neighborhood) via axis-1 gathers + masked
# accumulate.  K slots stacked on sublanes: idx/sel/out are (K, 128) per
# destination block; one kernel invocation handles C destination blocks.
K = 8
S = 4          # +/- window radius in 128-cell blocks
W = 2 * S + 1
C = 64         # destination blocks per call
NB = C         # total blocks this toy

xb = jnp.asarray(rng.standard_normal((NB, L)), jnp.float32)       # cell field
lane = rng.integers(0, L, (NB, K, L))
blk = rng.integers(-S, S + 1, (NB, K, L))
blk = np.clip(blk + np.arange(NB)[:, None, None], 0, NB - 1) - np.arange(NB)[:, None, None]
sel = jnp.asarray(blk + S, jnp.int32)                             # (NB,K,L) in [0,W)
lanej = jnp.asarray(lane, jnp.int32)

def mkern(x_ref, lane_ref, sel_ref, o_ref):
    b = pl.program_id(0)
    acc = jnp.zeros((K, L), jnp.float32)
    lanes = lane_ref[:]            # (K, L)
    selv = sel_ref[:]              # (K, L)
    for s in range(W):
        src = x_ref[pl.ds(b + s, 1), :]            # (1, L) window row (halo'd x)
        srcb = jnp.broadcast_to(src, (K, L))
        g = jnp.take_along_axis(srcb, lanes, axis=1)
        acc = acc + jnp.where(selv == s, g, 0.0)
    o_ref[:] = acc

@jax.jit
def mesh_gather(xpad, lanes, sels):
    return pl.pallas_call(
        mkern,
        grid=(NB,),
        out_shape=jax.ShapeDtypeStruct((NB, K, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),  # whole padded x
                  pl.BlockSpec((1, K, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, K, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xpad, lanes.reshape(NB, K, L), sels.reshape(NB, K, L))

xpad = jnp.concatenate([jnp.zeros((S, L)), xb, jnp.zeros((S, L))], axis=0)
out = mesh_gather(xpad, lanej, sel)
# reference
xn = np.asarray(xb); g_ref = np.zeros((NB, K, L), np.float32)
for b in range(NB):
    for k in range(K):
        for l in range(L):
            sb = b + int(blk[b, k, l])
            g_ref[b, k, l] = xn[sb, lane[b, k, l]]
err = np.abs(np.asarray(out) - g_ref).max()
print(f"mesh-gather correct: max_err={err}", flush=True)

@jax.jit
def loop_mesh(xpad, lanes, sels):
    def body(k, acc):
        o = mesh_gather(xpad + acc * 1e-30, lanes, sels)
        return o[0, 0, 0]
    return lax.fori_loop(0, 50, body, jnp.float32(0.0))

v = float(loop_mesh(xpad, lanej, sel))
t0 = time.time(); v = float(loop_mesh(xpad, lanej, sel)); el = time.time() - t0
per = (el - 0.030) / 50
n_elem = NB * K * L
print(f"mesh-gather: {per*1e6:.1f} us per {n_elem}-elem gather "
      f"({n_elem/per/1e9:.2f} Gelem/s)", flush=True)
