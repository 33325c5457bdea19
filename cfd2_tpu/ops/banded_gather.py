"""Banded neighbor gather for unstructured meshes — the TPU-native fix for
the generic gather path.

The reference solves any mesh at full speed through one CSR-generic kernel
(coupled_solver_fgmres.rs:1728; GPUs gather at HBM speed).  On TPU an XLA
gather over (N, K) neighbor indices runs ~100x below HBM speed (DESIGN.md
§3), which is why Delaunay/Voronoi meshes were slow.  This module replaces it
with a Pallas kernel built around what v5e Mosaic *can* do fast:
``tpu.dynamic_gather`` along lanes — out[i, l] = x[i, idx[i, l]] — with the
source row in a single vreg (128 lanes).

Design (encode-time, runtime/device_mesh.py):

* cells are **RCM-ordered** (scipy reverse_cuthill_mckee) so every cell's
  neighbors lie within a narrow index band (~sqrt(N) for 2D meshes), and the
  cell count is padded to a multiple of 128;
* a cell d = b*128 + l lives in block b, lane l.  Its k-th neighbor g lies in
  block b + (sel - S) with sel in [0, 2S+1), lane g % 128, where the window
  radius S = ceil(band/128) is a small static integer (~3-6 at 100k cells);
* the kernel walks the 2S+1 candidate source rows: broadcast row -> per-lane
  dynamic_gather with the (K, 128) lane indices -> masked accumulate where
  ``sel`` matches.  All VMEM-resident; HBM traffic is x (with halo), the
  int32 index planes, and the output — ~50 B/cell versus the XLA gather's
  effective ~6 GB/s.

Layout note: the kernel's natural output is slot-major (K, N) — K on
sublanes, cells on lanes — which tiles perfectly.  The (N, K) form used by
the existing slot kernels is produced by an in-kernel per-block transpose.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def build_banded_layout(ck_neighbor: np.ndarray, max_s: int = 12):
    """From a device-order (N, K) neighbor table (N a multiple of 128, RCM
    order), build (lane, sel, S) for the kernel — or None if the band is too
    wide (fall back to the XLA gather)."""
    N, K = ck_neighbor.shape
    assert N % LANES == 0
    d = np.arange(N, dtype=np.int64)
    g = ck_neighbor.astype(np.int64)
    db = (g // LANES) - (d[:, None] // LANES)
    S = int(np.abs(db).max())
    if S > max_s:
        return None
    lane = (g % LANES).astype(np.int32)
    sel = (db + S).astype(np.int32)
    NB = N // LANES
    # (N, K) -> (NB, K, LANES): entry [b, k, l] describes cell b*128+l slot k.
    lane = lane.reshape(NB, LANES, K).transpose(0, 2, 1).copy()
    sel = sel.reshape(NB, LANES, K).transpose(0, 2, 1).copy()
    return lane, sel, S


def _gather_kernel(W: int, K: int, x_ref, lane_ref, sel_ref, o_ref):
    """One destination block: pull K slot values for 128 cells from the
    2S+1 candidate source rows."""
    b = pl.program_id(0)
    lanes = lane_ref[0]                       # (K, LANES)
    selv = sel_ref[0]
    acc = jnp.zeros((K, LANES), jnp.float32)
    for s in range(W):
        src = x_ref[pl.ds(b + s, 1), :]       # (1, LANES); x is halo-padded
        srcb = jnp.broadcast_to(src, (K, LANES))
        g = jnp.take_along_axis(srcb, lanes, axis=1)
        acc = acc + jnp.where(selv == s, g, 0.0)
    o_ref[0] = acc


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@partial(jax.jit, static_argnames=("S",))
def banded_gather_kn(x: jnp.ndarray, lane: jnp.ndarray, sel: jnp.ndarray,
                     S: int) -> jnp.ndarray:
    """Slot-major gather: x (N,) -> (K, N) neighbor values."""
    NB, K, _ = lane.shape
    W = 2 * S + 1
    xpad = jnp.concatenate([
        jnp.zeros((S, LANES), x.dtype),
        x.reshape(NB, LANES),
        jnp.zeros((S, LANES), x.dtype)], axis=0)
    out = pl.pallas_call(
        partial(_gather_kernel, W, K),
        grid=(NB,),
        out_shape=jax.ShapeDtypeStruct((NB, K, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, K, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, K, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xpad.astype(jnp.float32), lane, sel)
    # (NB, K, LANES) -> (K, NB, LANES) -> (K, N)
    return jnp.moveaxis(out, 1, 0).reshape(K, -1).astype(x.dtype)


def banded_gather_nk(x: jnp.ndarray, lane: jnp.ndarray, sel: jnp.ndarray,
                     S: int) -> jnp.ndarray:
    """(N, K) neighbor values (API-compatible with DeviceMesh.gather).

    Tail dims (x of shape (N, C)) are handled per component.
    """
    if x.ndim == 2:
        cols = [banded_gather_nk(x[:, c], lane, sel, S)
                for c in range(x.shape[1])]
        return jnp.stack(cols, axis=2)
    kn = banded_gather_kn(x, lane, sel, S)     # (K, N)
    return kn.T
