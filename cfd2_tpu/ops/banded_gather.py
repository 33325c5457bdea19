"""Banded gather / SpMV for unstructured meshes — the TPU-native fix for
the generic gather path.

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

Multilevel (locally refined) meshes concatenate per-level grids, so a
block's neighbors span its own level's band plus far bands in the
parent/child levels; ``build_banded_map2`` splits each block's source rows
at the largest gaps into up to ``n_windows`` narrow windows and the kernel
walks window x offset.

Encode-time (runtime/device_mesh.py): cells are RCM-ordered and the count
padded to a multiple of 128; the build functions convert any (M, K) index
array into (lane, sel, bases, W) planes; the kernel walks the candidate
source rows per destination block: broadcast row -> per-lane dynamic_gather
-> masked accumulate.  The operand lives whole in VMEM; HBM traffic is the
operand, the int32 index planes, and the output.

Two performance-critical forms (one kernel):

* plain gather — (M, K) neighbor values out;
* **fused dot** (``banded_dot``) — out_j[i] = sum_k off[i,k] * x_c[idx[i,k]]
  computed in-kernel, so coefficient SpMV / smoother sweeps never
  materialize the (M, K) gathered array to HBM.

``BLOCK_ROWS_PER_PROGRAM`` destination blocks run per grid step so the
index/coefficient DMAs are tens of KB, not 1.5 KB (the single-block form
measured ~45x below roofline on launch/DMA latency).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS_PER_PROGRAM = 8


def build_banded_map(idx: np.ndarray, n_src: int, w_max: int = 40):
    """Compile an (M, K) int index map into banded-gather planes.

    Returns ``(lane, sel, base, W)`` — lane/sel (NB, K, 128) int32, base
    (NB,) int32, W static — or None when some destination block's source
    spread exceeds ``w_max`` window rows (caller falls back to XLA gather).

    Padded output rows (M -> NB*128) gather an index near the last real
    rows' sources (not 0: the final block's window must not stretch across
    the whole operand); callers slice the output back to M.
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


def build_banded_map_grouped(idx: np.ndarray, n_src: int, w_max: int = 40,
                             group: int = 2):
    """Compile an (M, K) index map whose rows are SORTED ascending into
    per-slot-group banded planes.

    A window map walks NW*W candidate rows per block, gathering all K slots
    each step; when each row's slots are sorted by source index, slot k
    holds the k-th order statistic, whose per-block span is far narrower
    than the whole band (voronoi at 294k: W=17 single-window vs ~4 per
    sorted slot).  Slots are walked in groups of ``group`` (single-slot
    (1, LANES) gathers lower to a form Mosaic rejects); group g walks its
    own static step count wgs[g].

    Returns ``(lane, sel, bases, wgs)`` — lane/sel (NB, K, 128) int32,
    bases (NB, G) int32, wgs a static tuple of per-group walk lengths —
    or None when some group's span exceeds ``w_max``.
    """
    idx = np.asarray(idx, dtype=np.int64)
    M, K = idx.shape
    if K < 2:
        return None
    NB = (M + LANES - 1) // LANES
    Mp = NB * LANES
    if Mp != M:
        fill = idx[M - 1, 0]
        idx = np.concatenate(
            [idx, np.full((Mp - M, K), fill, np.int64)], axis=0)
    n_rows = (n_src + LANES - 1) // LANES

    sb = (idx // LANES).reshape(NB, LANES, K)
    lane = (idx % LANES).reshape(NB, LANES, K).astype(np.int32)

    # Slot groups: pairs; an odd K folds the last slot into the final group.
    bounds = [(k0, min(k0 + group, K)) for k0 in range(0, K, group)]
    if len(bounds) > 1 and bounds[-1][1] - bounds[-1][0] == 1:
        bounds[-2] = (bounds[-2][0], K)
        bounds.pop()
    G = len(bounds)
    bases = np.zeros((NB, G), np.int32)
    wgs = []
    sel = np.zeros_like(sb, dtype=np.int32)
    for g, (k0, k1) in enumerate(bounds):
        sub = sb[:, :, k0:k1]
        lo = sub.min(axis=(1, 2))
        hi = sub.max(axis=(1, 2))
        wg = int((hi - lo).max()) + 1
        if wg > w_max:
            return None
        wg = min(wg, n_rows)
        base = np.minimum(lo, max(n_rows - wg, 0))
        bases[:, g] = base
        sel[:, :, k0:k1] = sub - base[:, None, None]
        wgs.append(wg)
        assert (sel[:, :, k0:k1] >= 0).all() and (sel[:, :, k0:k1] < wg).all()
    lane = np.ascontiguousarray(lane.transpose(0, 2, 1))
    sel = np.ascontiguousarray(sel.transpose(0, 2, 1))
    slot_bounds = tuple(bounds)
    return lane, sel, bases, (tuple(wgs), slot_bounds)


VREG_SUBLANES = 8


def window_cost(W: int, K: int, nw: int = 1) -> int:
    """Walk cost of a (multi-)window map in vreg-gather units.

    The kernel's per-step work is one masked lane-gather over a (K, LANES)
    tile; the VPU operates on (8, 128) vregs, so a step costs ceil(K/8)
    vregs regardless of how few slots it covers.  This is what the 294k
    voronoi measurements follow (probe_dyn_prod.py): single-window W=17,
    K=9 (34 vregs) ran 18.0 ms while the nominally-cheaper grouped map
    (wgs=(17,17,17,9) over 2/2/2/3-slot groups = 60 vregs) ran 22.6 ms —
    counting raw row-gathers (153 vs 129) picks the wrong map."""
    return nw * W * -(-K // VREG_SUBLANES)


def grouped_cost(wgs) -> int:
    """Walk cost of a sorted-slot grouped map in vreg-gather units (see
    window_cost): each group's step processes a (gsz, LANES) tile that
    still occupies ceil(gsz/8) full vregs."""
    lens, bounds = wgs
    return sum(w * -(-(k1 - k0) // VREG_SUBLANES)
               for w, (k0, k1) in zip(lens, bounds))


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


# ----------------------------------------------------------------------
# The unified kernel: NW windows, R destination blocks per program, and
# either plain gather outputs (prods=None) or fused coefficient dots.


def _plan_windows(K: int, NW: int, W: int):
    """The window-map walk: every step gathers all K slots from one source
    row; sel holds w * W + s."""
    steps = tuple((w, s, w * W + s) for w in range(NW) for s in range(W))
    return ((0, K, steps),)


def _plan_groups(wgs):
    """The sorted-slot grouped walk: group g covers slots [k0, k1) and
    walks its own wgs[g] rows; sel holds the in-group offset."""
    lens, bounds = wgs
    return tuple((k0, k1, tuple((g, s, s) for s in range(lens[g])))
                 for g, (k0, k1) in enumerate(bounds))


def _accum_groups(plan, C, read_base, lanes, selv, x_refs):
    """Walk ``plan`` for one destination block: returns per-component
    (K, LANES) gathered values.  ``read_base(col)`` reads one SMEM base
    scalar; ``lanes`` / ``selv`` (K, LANES) arrays already read from
    VMEM."""
    parts = [[] for _ in range(C)]
    for (k0, k1, steps) in plan:
        gsz = k1 - k0
        lg = lanes[k0:k1]
        sg = selv[k0:k1]
        accs = [jnp.zeros((gsz, LANES), jnp.float32) for _ in range(C)]
        for (bcol, s, sval) in steps:
            bw = read_base(bcol)
            mask = sg == sval
            for c in range(C):
                src = x_refs[c][pl.ds(bw + s, 1), :]           # (1, LANES)
                srcb = jnp.broadcast_to(src, (gsz, LANES))
                g = jnp.take_along_axis(srcb, lg, axis=1)
                accs[c] = accs[c] + jnp.where(mask, g, 0.0)
        for c in range(C):
            parts[c].append(accs[c])
    if len(plan) == 1:
        return [p[0] for p in parts]
    return [jnp.concatenate(p, axis=0) for p in parts]


def _kernel(plan, K: int, C: int, R: int, n_off: int,
            prods, bases_ref, lane_ref, sel_ref, *refs):
    x_refs = refs[:C]                     # full-operand VMEM (n_rows, 128)
    off_refs = refs[C:C + n_off]          # (R, K, LANES) coefficient blocks
    o_refs = refs[C + n_off:]
    for r in range(R):
        lanes = lane_ref[r]               # (K, LANES)
        selv = sel_ref[r]
        gs = _accum_groups(plan, C, lambda col, r=r: bases_ref[r, col],
                           lanes, selv, x_refs)
        if prods is None:
            for c in range(C):
                o_refs[c][r] = gs[c]
        else:
            for j, pairs in enumerate(prods):
                acc = jnp.zeros((K, LANES), jnp.float32)
                for (oi, ci) in pairs:
                    acc = acc + off_refs[oi][r] * gs[ci]
                o_refs[j][pl.ds(r, 1)] = jnp.sum(acc, axis=0, keepdims=True)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pad_blocks(a, NBp):
    """Pad leading (block) dim to NBp replicating the last block."""
    pad = NBp - a.shape[0]
    if pad == 0:
        return a
    return jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)


@partial(jax.jit, static_argnames=("W", "prods", "wgs"))
def _banded_raw(xs, offs, lane, sel, bases, W: int, prods=None, wgs=None):
    """xs: tuple of (n_src,) components; offs: tuple of (NB, K, LANES)
    coefficient blocks (empty for plain gather); lane/sel (NB, K, 128);
    bases (NB, NW) window-map or (NB, G) grouped-map rows.  ``wgs``
    (static, from build_banded_map_grouped) selects the sorted-slot
    grouped walk.  Returns tuple of (NB, K, 128) gathers (prods=None) or
    (NB, 128) dot outputs (prods = per-output tuples of (off, comp))."""
    NB, K, _ = lane.shape
    NW = bases.shape[1]
    if K == 1 and wgs is None:
        # Single-slot maps (prolongation): K=1 take_along_axis lowers to a
        # gather form Mosaic rejects; run with a duplicated slot (zero
        # coefficients on the duplicate so dots are unchanged) and slice.
        lane = jnp.concatenate([lane, lane], axis=1)
        sel = jnp.concatenate([sel, sel], axis=1)
        offs = tuple(jnp.concatenate([o, jnp.zeros_like(o)], axis=1)
                     for o in offs)
        out = _banded_raw(xs, offs, lane, sel, bases, W, prods)
        if prods is None:
            out = tuple(o[:, :1] for o in out)
        return out
    plan = _plan_groups(wgs) if wgs is not None else _plan_windows(K, NW, W)
    C = len(xs)
    n_off = len(offs)
    R = min(BLOCK_ROWS_PER_PROGRAM, NB)
    NBp = -(-NB // R) * R
    lane = _pad_blocks(lane, NBp)
    sel = _pad_blocks(sel, NBp)
    bases = _pad_blocks(bases, NBp)
    offs = tuple(_pad_blocks(o, NBp) for o in offs)
    n_src = xs[0].shape[0]
    n_rows = (n_src + LANES - 1) // LANES
    pad = n_rows * LANES - n_src
    xrs = [jnp.pad(x.astype(jnp.float32), (0, pad)).reshape(n_rows, LANES)
           for x in xs]
    blk = pl.BlockSpec((R, K, LANES), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    if prods is None:
        out_shape = [jax.ShapeDtypeStruct((NBp, K, LANES), jnp.float32)] * C
        out_specs = [blk] * C
    else:
        rblk = pl.BlockSpec((R, LANES), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((NBp, LANES), jnp.float32)] \
            * len(prods)
        out_specs = [rblk] * len(prods)
    out = pl.pallas_call(
        partial(_kernel, plan, K, C, R, n_off, prods),
        grid=(NBp // R,),
        out_shape=out_shape,
        # bases is blocked into SMEM per grid step: an unblocked (NBp, NW)
        # SMEM window pads each row to 512 B and overflows the 1 MB SMEM
        # at ~250k cells (NB>2048).
        in_specs=[pl.BlockSpec((R, NW), lambda b: (b, 0),
                               memory_space=pltpu.SMEM), blk, blk]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * C
        + [blk] * n_off,
        out_specs=out_specs,
        interpret=_interpret(),
    )(bases, lane, sel, *xrs, *offs)
    out = tuple(out) if isinstance(out, (tuple, list)) else (out,)
    return tuple(o[:NB] for o in out)


def _to_blocked(off: jnp.ndarray, NB: int, K: int) -> jnp.ndarray:
    """(M, K) coefficient plane -> (NB, K, LANES) blocks (zero-padded)."""
    M = off.shape[0]
    pad = NB * LANES - M
    o = jnp.pad(off.astype(jnp.float32), ((0, pad), (0, 0)))
    return o.reshape(NB, LANES, K).transpose(0, 2, 1)


def to_blocked(off: jnp.ndarray, num_cells: int) -> jnp.ndarray:
    """Public form of :func:`_to_blocked`: pre-block an (M, K) coefficient
    plane into the kernel's native (NB, K, LANES) layout ONCE (per assembly)
    so per-iteration ``banded_dot`` calls skip the relayout.  The (NB, K,
    LANES) -> (N, K) transpose is a minor-dims relayout that measured as a
    dominant per-FGMRES-iteration cost on unstructured meshes (round 4)."""
    NB = (num_cells + LANES - 1) // LANES
    return _to_blocked(off, NB, off.shape[1])


def banded_gather_nk(x: jnp.ndarray, lane: jnp.ndarray, sel: jnp.ndarray,
                     base: jnp.ndarray, W: int,
                     m_out: int | None = None, wgs=None) -> jnp.ndarray:
    """(M, K) gathered values (API-compatible with DeviceMesh.gather).

    Tail dims (x of shape (n_src, C)) run as one multi-component kernel
    call sharing the index-plane reads.  ``m_out``: un-padded output row
    count (default NB*128).  ``base`` may be (NB,) single-window,
    (NB, NW) multi-window, or (NB, G) grouped (with static ``wgs``).
    """
    NB, K, _ = lane.shape
    bases = base[:, None] if base.ndim == 1 else base
    if x.ndim == 2:
        raws = _banded_raw(tuple(x[:, c] for c in range(x.shape[1])), (),
                           lane, sel, bases, W, wgs=wgs)
        cols = [jnp.moveaxis(r, 1, 2).reshape(NB * LANES, K) for r in raws]
        out = jnp.stack(cols, axis=2).astype(x.dtype)
    else:
        (raw,) = _banded_raw((x,), (), lane, sel, bases, W, wgs=wgs)
        out = jnp.moveaxis(raw, 1, 2).reshape(NB * LANES, K).astype(x.dtype)
    if m_out is not None and m_out != NB * LANES:
        out = out[:m_out]
    return out


def banded_gather2_nk(x: jnp.ndarray, lane, sel, bases, W: int,
                      m_out: int | None = None) -> jnp.ndarray:
    """(M, K) gathered values through the multi-window map."""
    return banded_gather_nk(x, lane, sel, bases, W, m_out=m_out)


def _sweeps_kernel(plan, K: int, C: int, R: int, S: int,
                   bases_ref, lane_ref, sel_ref, off_ref, dinv_ref, *refs):
    """Grid (S+1, NBp/R): phase 0 seeds z0 = D^-1 r; phase s computes
    z_s = D^-1 (r - A_off z_{s-1}) reading the previous iterate from one
    VMEM scratch buffer and writing the other (sequential TPU grid order
    makes phase s-1 complete before phase s starts).  lane/sel/off stream
    per (phase, chunk); z / r / dinv stay VMEM-resident."""
    r_refs = refs[:C]
    o_refs = refs[C:2 * C]
    za_refs = refs[2 * C:3 * C]
    zb_refs = refs[3 * C:4 * C]
    s = pl.program_id(0)
    b = pl.program_id(1)

    def seed(dst_refs):
        for r_i in range(R):
            blk = b * R + r_i
            dinv = dinv_ref[pl.ds(blk, 1), :]
            for c in range(C):
                z0 = dinv * r_refs[c][pl.ds(blk, 1), :]
                dst_refs[c][pl.ds(blk, 1), :] = z0
                o_refs[c][pl.ds(r_i, 1)] = z0

    def sweep(src_refs, dst_refs):
        for r_i in range(R):
            blk = b * R + r_i
            lanes = lane_ref[r_i]             # (K, LANES)
            selv = sel_ref[r_i]
            gs = _accum_groups(plan, C,
                               lambda col, r_i=r_i: bases_ref[r_i, col],
                               lanes, selv, src_refs)
            dinv = dinv_ref[pl.ds(blk, 1), :]
            for c in range(C):
                sig = jnp.sum(off_ref[r_i] * gs[c], axis=0, keepdims=True)
                zn = dinv * (r_refs[c][pl.ds(blk, 1), :] - sig)
                dst_refs[c][pl.ds(blk, 1), :] = zn
                o_refs[c][pl.ds(r_i, 1)] = zn

    @pl.when(s == 0)
    def _():
        seed(za_refs)

    # z_{s} lives in za for even s, zb for odd s.
    @pl.when(jnp.logical_and(s > 0, s % 2 == 1))
    def _():
        sweep(za_refs, zb_refs)

    @pl.when(jnp.logical_and(s > 0, s % 2 == 0))
    def _():
        sweep(zb_refs, za_refs)


@partial(jax.jit, static_argnames=("W", "sweeps", "m_out", "wgs"))
def banded_jacobi_sweeps(rs, dinv, off, lane, sel, bases, W: int,
                         sweeps: int, m_out: int | None = None, wgs=None):
    """``sweeps`` Jacobi iterations z = D^-1 (r - A_off z) from the seed
    z0 = D^-1 r, all inside ONE pallas_call (the per-sweep ``banded_dot``
    chain costs a kernel launch + full coefficient re-DMA per sweep; at
    <=200k cells that launch overhead dominates the preconditioner).

    ``rs``: tuple of (n,) right-hand sides sharing the operator; ``dinv``:
    (n,) inverse diagonal; ``off``: (n, K) off-diagonal coefficients over
    the banded neighbor map (or pre-blocked (NB, K, LANES) from
    :func:`to_blocked`).  Semantics match ellsys._momentum_solve's
    loop of banded_dot calls exactly.  Returns a tuple of (m_out,) arrays.
    """
    NB, K, _ = lane.shape
    NW = bases.shape[1] if bases.ndim == 2 else 1
    basesv = bases[:, None] if bases.ndim == 1 else bases
    plan = _plan_groups(wgs) if wgs is not None else _plan_windows(K, NW, W)
    C = len(rs)
    S = sweeps - 1
    R = min(BLOCK_ROWS_PER_PROGRAM, NB)
    NBp = -(-NB // R) * R
    lane_p = _pad_blocks(lane, NBp)
    sel_p = _pad_blocks(sel, NBp)
    bases_p = _pad_blocks(basesv, NBp)
    off_b = _pad_blocks(off if off.ndim == 3 else _to_blocked(off, NB, K),
                        NBp)
    n = rs[0].shape[0]
    pad = NBp * LANES - n
    dinv_r = jnp.pad(dinv.astype(jnp.float32), (0, pad)).reshape(NBp, LANES)
    r_rs = [jnp.pad(r.astype(jnp.float32), (0, pad)).reshape(NBp, LANES)
            for r in rs]
    blk = pl.BlockSpec((R, K, LANES), lambda s, b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    rblk = pl.BlockSpec((R, LANES), lambda s, b: (b, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_sweeps_kernel, plan, K, C, R, S),
        grid=(S + 1, NBp // R),
        out_shape=[jax.ShapeDtypeStruct((NBp, LANES), jnp.float32)] * C,
        in_specs=[pl.BlockSpec((R, NW), lambda s, b: (b, 0),
                               memory_space=pltpu.SMEM),
                  blk, blk, blk, full] + [full] * C,
        out_specs=[rblk] * C,
        scratch_shapes=[pltpu.VMEM((NBp, LANES), jnp.float32)] * (2 * C),
        interpret=_interpret(),
    )(bases_p, lane_p, sel_p, off_b, dinv_r, *r_rs)
    out = tuple(out) if isinstance(out, (tuple, list)) else (out,)
    out = tuple(o.reshape(NBp * LANES) for o in out)
    if m_out is not None and m_out != NBp * LANES:
        out = tuple(o[:m_out] for o in out)
    return out


def banded_dot(xs, offs, lane, sel, bases, W: int, prods,
               m_out: int | None = None, wgs=None):
    """Fused banded SpMV: out_j[i] = sum over (oi, ci) in prods[j] of
    sum_k offs[oi][i, k] * xs[ci][idx[i, k]].

    ``xs``: tuple of (n_src,) operand components; ``offs``: tuple of (M, K)
    coefficient planes — or pre-blocked (NB, K, LANES) planes from
    :func:`to_blocked`, which skip the per-call relayout; ``prods``:
    per-output tuple of (off_index, comp_index) pairs.  Returns a tuple of
    (m_out,) arrays.  The gathered neighbor values never touch HBM.
    """
    NB, K, _ = lane.shape
    bases = bases[:, None] if bases.ndim == 1 else bases
    offb = tuple(o if o.ndim == 3 else _to_blocked(o, NB, K) for o in offs)
    raws = _banded_raw(tuple(xs), offb, lane, sel, bases, W,
                       prods=tuple(tuple(p) for p in prods), wgs=wgs)
    out = tuple(r.reshape(NB * LANES) for r in raws)
    if m_out is not None and m_out != NB * LANES:
        out = tuple(o[:m_out] for o in out)
    return out
