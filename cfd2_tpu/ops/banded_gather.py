"""Banded gather for unstructured meshes — the TPU-native fix for the
generic gather path.

The reference solves any mesh at full speed through one CSR-generic kernel
(coupled_solver_fgmres.rs:1728; GPUs gather at HBM speed).  On TPU an XLA
gather over (N, K) neighbor indices runs ~100x below HBM speed (measured
0.57 GB/s at 1M x 8, tools/probe_slot_layout.py), which is why
Delaunay/Voronoi meshes were slow.  This module replaces it with a Pallas
kernel built around what v5e Mosaic *can* do fast: ``tpu.dynamic_gather``
along lanes — out[i, l] = x[i, idx[i, l]] with the source row in a single
vreg — measured at 12 Gelem/s (tools/probe_vmem_gather2.py), ~85x the XLA
gather.

Any index map whose sources are *banded* — each 128-output block reads from
a narrow window of source rows — lowers to W = (window rows) masked lane
gathers.  Three maps in the solver have that shape once cells are
**RCM-ordered** (scipy reverse_cuthill_mckee; band ~ sqrt(N) for 2D meshes):

* the mesh neighbor gather (N, K) — W ~ 7-11;
* AMG restriction (aggregate member lists) and prolongation (agg map) —
  aggregation preserves RCM locality, so coarse ids are near-monotone in
  fine order;
* coarse-level ELL adjacencies.

Encode-time (runtime/device_mesh.py): cells are RCM-ordered and the count
padded to a multiple of 128; ``build_banded_map`` converts any (M, K) index
array into (lane, sel, base, W) planes; the kernel walks the W candidate
source rows per destination block: broadcast row -> per-lane dynamic_gather
-> masked accumulate.  All VMEM-resident; HBM traffic is the operand, the
int32 index planes, and the output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def build_banded_map(idx: np.ndarray, n_src: int, w_max: int = 40):
    """Compile an (M, K) int index map into banded-gather planes.

    Returns ``(lane, sel, base, W)`` — lane/sel (NB, K, 128) int32, base
    (NB,) int32, W static — or None when some destination block's source
    spread exceeds ``w_max`` window rows (caller falls back to XLA gather).

    Padded output rows (M -> NB*128) gather source element 0; callers slice
    the output back to M.
    """
    idx = np.asarray(idx, dtype=np.int64)
    M, K = idx.shape
    NB = (M + LANES - 1) // LANES
    Mp = NB * LANES
    if Mp != M:
        # Pad with an index NEAR the last real rows' sources (not 0): the
        # window of the final block must not be stretched across the whole
        # operand by the padding.
        fill = idx[M - 1, 0]
        idx = np.concatenate(
            [idx, np.full((Mp - M, K), fill, np.int64)], axis=0)
    n_rows = (n_src + LANES - 1) // LANES

    sb = (idx // LANES).reshape(NB, LANES, K)
    lane = (idx % LANES).reshape(NB, LANES, K)
    lo = sb.min(axis=(1, 2))
    hi = sb.max(axis=(1, 2))
    W = int((hi - lo).max()) + 1
    if W > w_max or n_rows < 1:
        return None
    W = min(W, n_rows)
    base = np.minimum(lo, max(n_rows - W, 0)).astype(np.int32)
    sel = (sb - base[:, None, None]).astype(np.int32)
    assert (sel >= 0).all() and (sel < W).all()
    lane = np.ascontiguousarray(lane.transpose(0, 2, 1)).astype(np.int32)
    sel = np.ascontiguousarray(sel.transpose(0, 2, 1)).astype(np.int32)
    return lane, sel, base, W


def _gather_kernel(W: int, K: int, C: int, base_ref, lane_ref, sel_ref,
                   *refs):
    """One destination block: pull K slot values for 128 outputs from the
    W candidate source rows starting at base[b], for C vector components
    sharing one set of index planes (the dominant HBM traffic).
    ``base_ref`` is the whole (NB,) SMEM array (TPU Mosaic rejects rank-1
    size-1 SMEM blocks)."""
    x_refs = refs[:C]
    o_refs = refs[C:]
    b0 = base_ref[pl.program_id(0)]
    lanes = lane_ref[0]                       # (K, LANES)
    selv = sel_ref[0]
    for c in range(C):
        acc = jnp.zeros((K, LANES), jnp.float32)
        for s in range(W):
            src = x_refs[c][pl.ds(b0 + s, 1), :]      # (1, LANES)
            srcb = jnp.broadcast_to(src, (K, LANES))
            g = jnp.take_along_axis(srcb, lanes, axis=1)
            acc = acc + jnp.where(selv == s, g, 0.0)
        o_refs[c][0] = acc


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@partial(jax.jit, static_argnames=("W",))
def _banded_gather_raw(xs, lane: jnp.ndarray, sel: jnp.ndarray,
                       base: jnp.ndarray, W: int):
    """xs: tuple of (n_src,) components -> tuple of (NB, K, 128) slot values
    (padded rows gather x[0]); one kernel call, index planes read once."""
    NB, K, _ = lane.shape
    if K == 1:
        # Single-slot maps (prolongation): K=1 take_along_axis lowers to a
        # gather form Mosaic rejects; run with a duplicated slot and slice.
        lane = jnp.concatenate([lane, lane], axis=1)
        sel = jnp.concatenate([sel, sel], axis=1)
        return tuple(o[:, :1]
                     for o in _banded_gather_raw(xs, lane, sel, base, W))
    C = len(xs)
    n_src = xs[0].shape[0]
    n_rows = (n_src + LANES - 1) // LANES
    pad = n_rows * LANES - n_src
    xrs = [jnp.pad(x.astype(jnp.float32), (0, pad)).reshape(n_rows, LANES)
           for x in xs]
    blk = pl.BlockSpec((1, K, LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_gather_kernel, W, K, C),
        grid=(NB,),
        out_shape=[jax.ShapeDtypeStruct((NB, K, LANES), jnp.float32)] * C,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * C,
        out_specs=[blk] * C,
        interpret=_interpret(),
    )(base, lane, sel, *xrs)
    return tuple(out) if isinstance(out, (tuple, list)) else (out,)


def banded_gather_nk(x: jnp.ndarray, lane: jnp.ndarray, sel: jnp.ndarray,
                     base: jnp.ndarray, W: int,
                     m_out: int | None = None) -> jnp.ndarray:
    """(M, K) gathered values (API-compatible with DeviceMesh.gather).

    Tail dims (x of shape (n_src, C)) run as one multi-component kernel
    call sharing the index-plane reads.  ``m_out``: un-padded output row
    count (default NB*128).
    """
    NB, K, _ = lane.shape
    if x.ndim == 2:
        raws = _banded_gather_raw(tuple(x[:, c] for c in range(x.shape[1])),
                                  lane, sel, base, W)
        cols = [jnp.moveaxis(r, 1, 2).reshape(NB * LANES, K) for r in raws]
        out = jnp.stack(cols, axis=2).astype(x.dtype)
    else:
        (raw,) = _banded_gather_raw((x,), lane, sel, base, W)
        out = jnp.moveaxis(raw, 1, 2).reshape(NB * LANES, K).astype(x.dtype)
    if m_out is not None and m_out != NB * LANES:
        out = out[:m_out]
    return out


# ----------------------------------------------------------------------
# Two-window variant: multilevel (locally-refined) meshes concatenate
# per-level grids, so a cell's neighbors live in its own level's band plus
# (across refinement interfaces) a second band in the parent/child level.
# Each destination block therefore reads from up to TWO narrow source-row
# windows; sel encodes (window, offset) as s < W -> base1 + s,
# s >= W -> base2 + (s - W).


def build_banded_map2(idx: np.ndarray, n_src: int, w_max: int = 16,
                      n_windows: int = 3):
    """Compile an (M, K) index map into multi-window banded-gather planes.

    Per 128-output block, source rows are split at their ``n_windows - 1``
    largest gaps into clusters (a multilevel cell block touches its own
    level's band plus the finer and coarser levels' bands); returns
    (lane, sel, bases (NB, n_windows), W) or None when any cluster's span
    exceeds ``w_max`` rows.
    """
    idx = np.asarray(idx, dtype=np.int64)
    M, K = idx.shape
    NB = (M + LANES - 1) // LANES
    Mp = NB * LANES
    if Mp != M:
        fill = idx[M - 1, 0]
        idx = np.concatenate(
            [idx, np.full((Mp - M, K), fill, np.int64)], axis=0)
    n_rows = (n_src + LANES - 1) // LANES

    sb = (idx // LANES).reshape(NB, LANES, K)
    lane = (idx % LANES).reshape(NB, LANES, K).astype(np.int32)

    NW = n_windows
    bases = np.zeros((NB, NW), np.int32)
    # Per-block cluster boundaries: cluster w covers rows in
    # [edges[b, w], edges[b, w + 1]).
    edges = np.zeros((NB, NW + 1), np.int64)
    W = 1
    for b in range(NB):
        rows = np.unique(sb[b])
        cuts = []
        if len(rows) > 1:
            gaps = np.diff(rows)
            order = np.argsort(gaps)[::-1][:NW - 1]
            cuts = sorted(int(rows[g + 1]) for g in order if gaps[g] > 1)
        bounds = [int(rows[0])] + cuts + [int(rows[-1]) + 1]
        # Assign clusters; unused trailing windows mirror the last cluster.
        for w in range(NW):
            lo = bounds[min(w, len(bounds) - 2)]
            hi_excl = bounds[min(w + 1, len(bounds) - 1)]
            sub = rows[(rows >= lo) & (rows < hi_excl)]
            if len(sub) == 0:
                bases[b, w] = bases[b, max(w - 1, 0)]
                continue
            span = int(sub[-1] - sub[0]) + 1
            if span > w_max:
                return None
            W = max(W, span)
            bases[b, w] = sub[0]
        edges[b, :len(bounds)] = bounds
        edges[b, len(bounds):] = bounds[-1]
    bases = np.minimum(bases, max(n_rows - W, 0)).astype(np.int32)

    sel = np.zeros_like(sb, dtype=np.int32)
    for w in range(NW):
        lo = edges[:, w][:, None, None]
        hi = edges[:, w + 1][:, None, None]
        inw = (sb >= lo) & (sb < hi)
        sel = np.where(inw, sb - bases[:, w][:, None, None] + w * W, sel)
    assert (sel >= 0).all() and (sel < NW * W).all()
    lane = np.ascontiguousarray(lane.transpose(0, 2, 1))
    sel = np.ascontiguousarray(sel.transpose(0, 2, 1))
    return lane, sel, np.ascontiguousarray(bases), W


def _gather_kernel2(W: int, K: int, C: int, NW: int, bases_ref, lane_ref,
                    sel_ref, *refs):
    x_refs = refs[:C]
    o_refs = refs[C:]
    b = pl.program_id(0)
    lanes = lane_ref[0]
    selv = sel_ref[0]
    for c in range(C):
        acc = jnp.zeros((K, LANES), jnp.float32)
        for w in range(NW):
            bw = bases_ref[b, w]
            for s in range(W):
                src = x_refs[c][pl.ds(bw + s, 1), :]
                srcb = jnp.broadcast_to(src, (K, LANES))
                g = jnp.take_along_axis(srcb, lanes, axis=1)
                acc = acc + jnp.where(selv == w * W + s, g, 0.0)
        o_refs[c][0] = acc


@partial(jax.jit, static_argnames=("W",))
def _banded_gather2_raw(xs, lane, sel, bases, W: int):
    NB, K, _ = lane.shape
    NW = bases.shape[1]
    if K == 1:
        lane = jnp.concatenate([lane, lane], axis=1)
        sel = jnp.concatenate([sel, sel], axis=1)
        return tuple(o[:, :1] for o in
                     _banded_gather2_raw(xs, lane, sel, bases, W))
    C = len(xs)
    n_src = xs[0].shape[0]
    n_rows = (n_src + LANES - 1) // LANES
    pad = n_rows * LANES - n_src
    xrs = [jnp.pad(x.astype(jnp.float32), (0, pad)).reshape(n_rows, LANES)
           for x in xs]
    blk = pl.BlockSpec((1, K, LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_gather_kernel2, W, K, C, NW),
        grid=(NB,),
        out_shape=[jax.ShapeDtypeStruct((NB, K, LANES), jnp.float32)] * C,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * C,
        out_specs=[blk] * C,
        interpret=_interpret(),
    )(bases, lane, sel, *xrs)
    return tuple(out) if isinstance(out, (tuple, list)) else (out,)


def banded_gather2_nk(x: jnp.ndarray, lane, sel, bases, W: int,
                      m_out: int | None = None) -> jnp.ndarray:
    """(M, K) gathered values through the multi-window kernel."""
    NB, K, _ = lane.shape
    if x.ndim == 2:
        raws = _banded_gather2_raw(tuple(x[:, c] for c in range(x.shape[1])),
                                   lane, sel, bases, W)
        cols = [jnp.moveaxis(r, 1, 2).reshape(NB * LANES, K) for r in raws]
        out = jnp.stack(cols, axis=2).astype(x.dtype)
    else:
        (raw,) = _banded_gather2_raw((x,), lane, sel, bases, W)
        out = jnp.moveaxis(raw, 1, 2).reshape(NB * LANES, K).astype(x.dtype)
    if m_out is not None and m_out != NB * LANES:
        out = out[:m_out]
    return out
