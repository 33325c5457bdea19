"""Algebraic multigrid for the scalar pressure (Schur) system.

TPU-native re-design of the reference AMG (src/solver/gpu/linear_solver/amg.rs):

* **Setup** (host, once per mesh): greedy aggregation over the pressure
  sparsity pattern (amg.rs:84-116), piecewise-constant prolongation
  (:118-139), and the *structure* of each Galerkin coarse operator — but not
  its values.  The hierarchy depth/sizes are static, so every level is
  compiled with fixed shapes.
* **Values** (device, per solve): because prolongation is piecewise-constant,
  every coarse matrix entry is a plain sum of fine entries; we precompute the
  fine-slot -> coarse-slot index map and rebuild all level values with one
  ``segment_sum`` per level.  This improves on the reference, which freezes
  the hierarchy values at first use (coupled_solver_fgmres.rs:174-209) and
  preconditions later steps with a stale matrix.
* **V-cycle** (jitted, unrolled over the static hierarchy, amg.rs:666-770):
  damped-Jacobi pre-smooth (omega=0.8) -> fused residual+restrict -> zero
  coarse guess; 10 smooths on the coarsest level; prolongate -> post-smooth
  on the way up.  Restriction gathers aggregate members (static padded map);
  prolongation is a gather by aggregate id.

Hierarchy terminates at <=100 rows or 20 levels (amg.rs:466-481).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .blockell import BlockSystem

_OMEGA = 0.8
_COARSE_SWEEPS = 10
_MIN_COARSE = 100
_MAX_LEVELS = 20


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class AmgLevel:
    """One coarse level (level 0 is the fine pressure system itself).

    ``bm_*``: optional banded-gather plane triples (lane, sel, base) for the
    level's ELL adjacency, the restriction member lists, and the
    prolongation agg map (ops/banded_gather.py) with their static window
    sizes — RCM ordering of the fine mesh makes aggregate ids near-monotone,
    so every AMG gather is banded.  None falls back to XLA gathers.
    """
    n: int                       # static size
    k: int                       # static max neighbors in ELL
    ell_neighbor: jnp.ndarray    # (n, k) int32, self-padded
    rap_target: jnp.ndarray      # flattened finer-values -> this level's slots
    agg: jnp.ndarray             # (n_fine,) int32 aggregate id (prolongation)
    members: jnp.ndarray         # (n, m) int32 fine members (restriction)
    members_mask: jnp.ndarray    # (n, m) f32
    bm_ell: tuple | None = None
    bm_members: tuple | None = None
    bm_agg: tuple | None = None
    w_ell: int | None = None
    w_members: int | None = None
    w_agg: int | None = None
    # Static sorted-slot grouped-walk plans (build_banded_map_grouped);
    # None when the level's map is a window map.
    g_ell: tuple | None = None
    g_members: tuple | None = None

    def tree_flatten(self):
        return ((self.ell_neighbor, self.rap_target, self.agg,
                 self.members, self.members_mask, self.bm_ell,
                 self.bm_members, self.bm_agg),
                (self.n, self.k, self.w_ell, self.w_members, self.w_agg,
                 self.g_ell, self.g_members))

    @classmethod
    def tree_unflatten(cls, aux, children):
        n, k, w_ell, w_members, w_agg, g_ell, g_members = aux
        (ell, rap, agg, mem, memm, bme, bmm, bma) = children
        return cls(n, k, ell, rap, agg, mem, memm, bme, bmm, bma,
                   w_ell, w_members, w_agg, g_ell, g_members)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class AmgHierarchy:
    levels: tuple  # of AmgLevel, coarsest last; empty if mesh too small

    def tree_flatten(self):
        return (tuple(self.levels),), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(levels=children[0])


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class StructuredAmgLevel:
    """Grid-structured coarse level: 2x2 block coarsening of a 5-point
    stencil stays 5-point, so smoothing keeps the shift (stencil) fast path,
    restriction is a pad+reshape-sum, and prolongation a repeat — no gathers
    anywhere.  This is the TPU-native multigrid for structured meshes."""
    fine_grid: tuple             # (nyf, nxf) of the finer level
    grid: tuple                  # (nyc, nxc) of this level
    rap_target: jnp.ndarray      # finer flattened values -> this level slots

    def tree_flatten(self):
        return ((self.rap_target,), (self.fine_grid, self.grid))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], children[0])

    @property
    def n(self):
        return self.grid[0] * self.grid[1]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class StructuredAmgHierarchy:
    levels: tuple  # of StructuredAmgLevel
    # Level-0 masks for the stencil-form Galerkin coarsening
    # (compute_structured_level_values2): fluid-cell diagonal validity
    # (ny, nx) and internal-face validity per directional slot (4, ny, nx).
    diag_valid2: jnp.ndarray | None = None
    internal2: jnp.ndarray | None = None

    def tree_flatten(self):
        return (tuple(self.levels), self.diag_valid2, self.internal2), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(levels=children[0], diag_valid2=children[1],
                   internal2=children[2])


# ----------------------------------------------------------------------
# Host-side setup


def _aggregate_ell(ngh: np.ndarray, mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Greedy aggregation over an ELL adjacency (reference amg.rs:84-116):
    each unaggregated cell seeds an aggregate and absorbs its unaggregated
    neighbors.  Uses the native C++ kernel when available (the scan is
    inherently sequential)."""
    from ..mesh import native
    res = native.amg_aggregate(ngh, mask)
    if res is not None:
        return res
    n, k = ngh.shape
    agg = np.full(n, -1, dtype=np.int64)
    num = 0
    for i in range(n):
        if agg[i] >= 0:
            continue
        agg[i] = num
        for s in range(k):
            j = ngh[i, s]
            if mask[i, s] and j != i and agg[j] < 0:
                agg[j] = num
        num += 1
    return agg, num


def _coarse_graph_from_agg(ngh: np.ndarray, mask: np.ndarray,
                           agg: np.ndarray, nc: int):
    """Aggregate-graph adjacency (ELL) induced by fine edges."""
    n, kf = ngh.shape
    fi = np.repeat(np.arange(n), kf)
    fj = ngh.ravel()
    fv = mask.ravel()
    a_i = agg[fi]
    a_j = agg[fj]
    cross = fv & (a_i != a_j)
    pair = np.unique(a_i[cross] * nc + a_j[cross])
    pci = pair // nc
    pcj = pair % nc
    counts = np.bincount(pci, minlength=nc)
    kc = max(int(counts.max()) if len(pair) else 0, 1)
    row_start = np.zeros(nc + 1, np.int64)
    np.cumsum(counts, out=row_start[1:])
    slot = np.arange(len(pair)) - row_start[pci]
    cn = np.tile(np.arange(nc, dtype=np.int64)[:, None], (1, kc))
    cm = np.zeros((nc, kc), bool)
    cn[pci, slot] = pcj
    cm[pci, slot] = True
    return cn, cm


def build_hierarchy(ck_neighbor: np.ndarray, ck_mask: np.ndarray,
                    c_valid: np.ndarray | None = None,
                    agg_passes: int = 1) -> AmgHierarchy:
    """Build the static AMG hierarchy from the fine pressure sparsity pattern
    (the mesh's cell adjacency).  Fully vectorized except the (native) greedy
    scan; scales to multi-million-cell meshes.

    Masked solid cells of the structured layout (``c_valid == 0``) are inert
    identity rows; they are pooled into one decoupled aggregate at the first
    coarsening so they do not pollute the hierarchy.
    """
    levels: list[AmgLevel] = []
    ngh = np.asarray(ck_neighbor, dtype=np.int64)
    n = ngh.shape[0]
    mask = (np.asarray(ck_mask) > 0) & (ngh != np.arange(n)[:, None])
    invalid = (np.asarray(c_valid) <= 0) if c_valid is not None else None

    for _level in range(_MAX_LEVELS):
        n, kf = ngh.shape
        if n <= _MIN_COARSE:
            break
        agg, nc = _aggregate_ell(ngh, mask)
        # Multi-pass aggregation (pairwise-squared, Notay-style): compose a
        # second greedy pass over the aggregate graph for ~3x fewer levels.
        # On TPU the V-cycle's cost at >=100k cells is kernel-launch count,
        # not bandwidth, so a shallower hierarchy with stronger (Chebyshev)
        # smoothing wins even though each cycle contracts a bit less.
        for _ in range(agg_passes - 1):
            if nc <= _MIN_COARSE:
                break
            cn, cm = _coarse_graph_from_agg(ngh, mask, agg, nc)
            agg2, nc2 = _aggregate_ell(cn, cm)
            agg = agg2[agg]
            nc = nc2
        trash = -1
        if invalid is not None and invalid.any():
            # Remap all solid cells into a single trash aggregate.  It gets
            # no restriction members (solid identity-row residuals are zero by
            # construction) so the padded members matrix stays small.
            keep = np.unique(agg[~invalid])
            remap = np.full(nc, len(keep), dtype=np.int64)
            remap[keep] = np.arange(len(keep))
            agg = remap[agg]
            trash = len(keep)
            agg[invalid] = trash
            nc = len(keep) + 1
        invalid = None  # only relevant at the first coarsening
        if nc >= n:
            break

        # Coarse adjacency from fine edges (vectorized).
        fi = np.repeat(np.arange(n), kf)
        fj = ngh.ravel()
        fv = mask.ravel()
        a_i = agg[fi]
        a_j = agg[fj]
        cross = fv & (a_i != a_j)
        pair = a_i[cross] * nc + a_j[cross]
        uniq_pairs = np.unique(pair)
        pci = uniq_pairs // nc
        pcj = uniq_pairs % nc
        counts_row = np.bincount(pci, minlength=nc)
        kc = max(int(counts_row.max()) if len(uniq_pairs) else 0, 1)
        row_start = np.zeros(nc + 1, dtype=np.int64)
        np.cumsum(counts_row, out=row_start[1:])
        slot = np.arange(len(uniq_pairs)) - row_start[pci]
        coarse_ngh = np.tile(np.arange(nc, dtype=np.int64)[:, None], (1, kc))
        coarse_mask = np.zeros((nc, kc), dtype=bool)
        coarse_ngh[pci, slot] = pcj
        coarse_mask[pci, slot] = True
        # Rows are ascending (uniq_pairs is sorted and slots fill 0..deg-1);
        # repeat the last real neighbor into pad slots (a mid-band self index
        # would break the order) so the sorted-slot grouped banded map
        # applies.  Pad coefficients are zero (RAP never writes them) and
        # the next level's aggregation reads coarse_mask, so values at pads
        # are free.
        ffil = np.maximum.accumulate(
            np.where(coarse_mask, np.arange(kc)[None, :], 0), axis=1)
        coarse_ngh = np.take_along_axis(coarse_ngh, ffil, axis=1)

        # RAP index map: flattened fine values [diag(n); off(n*kf)] -> coarse
        # flattened slots [c*(kc+1) + 0 (diag) | 1+slot]; dump slot at end.
        dump = nc * (kc + 1)
        targets = np.full(n + n * kf, dump, dtype=np.int64)
        targets[:n] = agg * (kc + 1)
        flat_idx = np.arange(n * kf) + n
        vsame = fv & (a_i == a_j)
        targets[flat_idx[vsame]] = a_i[vsame] * (kc + 1)
        pos = np.searchsorted(uniq_pairs, a_i[cross] * nc + a_j[cross])
        targets[flat_idx[cross]] = a_i[cross] * (kc + 1) + 1 + slot[pos]

        # Restriction member lists (piecewise-constant R = P^T), vectorized.
        # The trash aggregate (solid cells) is excluded: padding the matrix
        # to its size would be enormous and its residuals are identically 0.
        member_cells = (np.nonzero(agg != trash)[0] if trash >= 0
                        else np.arange(n))
        magg = agg[member_cells]
        order = member_cells[np.argsort(magg, kind="stable")]
        counts_m = np.bincount(agg[order], minlength=nc)
        m = max(int(counts_m.max()), 1)
        mem_start = np.zeros(nc + 1, dtype=np.int64)
        np.cumsum(counts_m, out=mem_start[1:])
        within = np.arange(len(order)) - mem_start[agg[order]]
        members = np.zeros((nc, m), dtype=np.int64)
        members_mask = np.zeros((nc, m), dtype=np.float64)
        members[agg[order], within] = order
        members_mask[agg[order], within] = 1.0

        # Banded-gather maps (None when a band is too wide; see class doc).
        from .banded_gather import (build_banded_map, build_banded_map2,
                                    build_banded_map_grouped, grouped_cost,
                                    window_cost)

        def _bm(idx, n_src, sorted_rows=False):
            idx = np.asarray(idx)
            r = build_banded_map(idx, n_src)
            if sorted_rows:
                # Rows ascending: the sorted-slot grouped map walks each
                # slot pair's own narrow window; take it when cheaper in
                # vreg-gather units (window_cost doc).
                rg = build_banded_map_grouped(idx, n_src)
                if rg is not None and (
                        r is None
                        or grouped_cost(rg[3])
                        < window_cost(r[3], idx.shape[1])):
                    lane, sel, bases, wgs = rg
                    return (jnp.asarray(lane), jnp.asarray(sel),
                            jnp.asarray(bases)), max(wgs[0]), wgs
            if r is None:
                # Multi-window fallback: multilevel meshes' aggregate /
                # adjacency maps cluster into one narrow band per
                # refinement level (the unified kernel takes (NB, NW)
                # bases transparently).
                r = build_banded_map2(idx, n_src)
            if r is None:
                return None, None, None
            lane, sel, base, w = r
            return (jnp.asarray(lane), jnp.asarray(sel),
                    jnp.asarray(base)), w, None

        bme, we, ge = _bm(coarse_ngh, nc, sorted_rows=True)
        # Masked member entries hold index 0; point them at the row's LAST
        # real member — forward-filled for empty aggregates — so they don't
        # stretch the banded window to row 0 AND rows stay ascending
        # (members fill 0..count-1 in fine-id order), enabling the
        # sorted-slot grouped map.
        last = np.where(counts_m > 0,
                        members[np.arange(nc),
                                np.maximum(counts_m - 1, 0)], -1)
        ffi = np.where(last >= 0, np.arange(nc), 0)
        np.maximum.accumulate(ffi, out=ffi)
        last = np.maximum(last[ffi], 0)
        members_safe = np.where(members_mask > 0, members, last[:, None])
        bmm, wm, gm = _bm(members_safe, n, sorted_rows=True)
        bma, wa, _ = _bm(agg[:, None], nc)

        levels.append(AmgLevel(
            n=nc, k=kc,
            # Host-side dtype conversion (see _structured_levels note): a
            # device convert_element_type is a tunnel compile per array.
            ell_neighbor=jnp.asarray(np.asarray(coarse_ngh, np.int32)),
            rap_target=jnp.asarray(np.asarray(targets, np.int32)),
            agg=jnp.asarray(np.asarray(agg, np.int32)),
            members=jnp.asarray(np.asarray(members, np.int32)),
            members_mask=jnp.asarray(np.asarray(members_mask, np.float32)),
            bm_ell=bme, bm_members=bmm, bm_agg=bma,
            w_ell=we, w_members=wm, w_agg=wa,
            g_ell=ge, g_members=gm,
        ))

        ngh = coarse_ngh
        mask = coarse_mask

    return AmgHierarchy(levels=tuple(levels))


def _host(mesh, name: str) -> np.ndarray:
    """Host copy of a DeviceMesh array for setup-time (build) consumers —
    encode_mesh's ``amg_host`` dict when present (zero device traffic),
    device readback otherwise (a reconstructed mesh inside a transform)."""
    host = getattr(mesh, "amg_host", None)
    if host is not None and name in host:
        return host[name]
    return np.asarray(getattr(mesh, name))


def _structured_rap_target(nyf, nxf, nyc, nxc, kf,
                           internal_mask=None, diag_valid=None):
    """Index map from a finer structured level's flattened values
    [diag (nf,); off (nf, kf) slots E,W,N,S,...] to the coarse flattened
    layout (nc, 5) = [diag, E, W, N, S] + dump slot."""
    nf = nyf * nxf
    nc = nyc * nxc
    dump = nc * 5
    j, i = np.divmod(np.arange(nf), nxf)
    J, I = j // 2, i // 2
    cidx = J * nxc + I

    targets = np.full(nf + nf * kf, dump, dtype=np.int64)
    # Diagonals.
    tdiag = cidx * 5
    if diag_valid is not None:
        tdiag = np.where(diag_valid, tdiag, dump)
    targets[:nf] = tdiag

    # Directional slots: (di, dj, coarse slot id 1..4)
    dirs = [(1, 0, 1), (-1, 0, 2), (0, 1, 3), (0, -1, 4)]
    for s, (di, dj, cslot) in enumerate(dirs):
        ii = i + di
        jj = j + dj
        valid = (ii >= 0) & (ii < nxf) & (jj >= 0) & (jj < nyf)
        if internal_mask is not None:
            valid &= internal_mask[:, s]
        In = np.where(valid, ii // 2, 0)
        Jn = np.where(valid, jj // 2, 0)
        same = (In == I) & (Jn == J)
        t = np.where(same, cidx * 5, cidx * 5 + cslot)
        t = np.where(valid, t, dump)
        targets[nf + s * nf:nf + (s + 1) * nf] = t
    # NOTE: the flattened off values are laid out slot-major below, so
    # compute_level_values must ravel with order="F" on the slot axis; we
    # instead store targets in (slot, cell) order and transpose at use site.
    return targets


def _structured_levels(ny, nx, internal0, diag_valid0,
                       min_coarse=_MIN_COARSE):
    """2x2 coarsening level chain over an (ny, nx) grid.  ``internal0``
    (nf, 4) bool and ``diag_valid0`` (nf,) bool mask level-0 couplings.
    ``min_coarse``: stop once a level has <= this many cells (the coarsest
    level gets the exact dense solve; raising it truncates the chain and
    trades tiny-kernel launches for a bigger LU)."""
    levels = []
    nyf, nxf = ny, nx
    first = True
    while nyf * nxf > min_coarse and len(levels) < _MAX_LEVELS \
            and (nyf > 1 or nxf > 1):
        nyc = (nyf + 1) // 2
        nxc = (nxf + 1) // 2
        # Only the 4 directional slots carry internal couplings (extras are
        # boundary faces with zero pressure entries), so every level's value
        # stream is [diag; 4 slots].
        targets = _structured_rap_target(
            nyf, nxf, nyc, nxc, 4,
            internal_mask=internal0 if first else None,
            diag_valid=diag_valid0 if first else None)
        levels.append(StructuredAmgLevel(
            fine_grid=(nyf, nxf), grid=(nyc, nxc),
            # dtype conversion on HOST: jnp.asarray(x, int32) on an int64
            # array lowers a device convert_element_type — one more tunnel
            # compile per level (pinned by
            # test_structured_hierarchy_build_is_host_only).
            rap_target=jnp.asarray(targets.astype(np.int32))))
        nyf, nxf = nyc, nxc
        first = False
    return levels


def build_structured_hierarchy(mesh,
                               min_coarse=_MIN_COARSE) -> StructuredAmgHierarchy | None:
    """Geometric-aggregation multigrid for structured meshes: repeated 2x2
    block coarsening.  Piecewise-constant transfer + Galerkin product, like
    the reference AMG, but every level keeps the 5-point grid structure."""
    if not mesh.structured:
        return None
    ny, nx = mesh.grid_shape
    # Level-0 validity from the device mesh.
    # HOST numpy math on encode-time host copies only: an eager jnp op on
    # the DeviceMesh arrays here compiles a tiny executable through the
    # remote-compile tunnel (measured 410 s of "amg hierarchy build" on a
    # slow-tunnel day), and even np.asarray readback of the 100 MB masks
    # costs ~140 s of tunnel transfer.  encode_mesh attaches `amg_host`
    # for exactly this consumer.
    internal0 = (_host(mesh, "ck_mask")
                 * (1.0 - _host(mesh, "ck_is_boundary"))) > 0
    internal0 = internal0[:, :4]
    diag_valid0 = _host(mesh, "c_valid") > 0

    levels = _structured_levels(ny, nx, internal0, diag_valid0,
                                min_coarse=min_coarse)
    if not levels:
        return None
    diag_valid2 = jnp.asarray(
        diag_valid0.reshape(ny, nx).astype(np.float32))
    internal2 = jnp.asarray(np.ascontiguousarray(
        np.moveaxis(internal0.reshape(ny, nx, 4), 2, 0)).astype(np.float32))
    return StructuredAmgHierarchy(levels=tuple(levels),
                                  diag_valid2=diag_valid2,
                                  internal2=internal2)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class MultilevelAmg:
    """Pressure multigrid for multilevel (locally-refined quadtree) meshes.

    The composite mesh is embedded in its finest uniform grid: every cell's
    value is replicated over its 2^l x 2^l fine squares, a structured
    V-cycle preconditions the fine-grid Laplacian (built per assembly from
    the spread rho*d_p field), and the correction is averaged back.  The
    fine operator is spectrally close to the composite Schur operator (the
    2D Poisson stencil is scale-invariant: area/dist = 1 at every level), so
    FGMRES converges at near-uniform-mesh iteration counts while the V-cycle
    itself runs at full stencil speed.  Assumes the outlet lies on the
    domain's east edge (true for all reference geometries)."""
    fine: StructuredAmgHierarchy
    ml_levels: tuple              # static composite level grids, finest first
    outlet_e2: jnp.ndarray        # (ny0, nx0) f32: fine squares with an
    #                               outlet east face

    def tree_flatten(self):
        return ((self.fine, self.outlet_e2), (self.ml_levels,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(fine=children[0], ml_levels=aux[0], outlet_e2=children[1])


def _ml_spread(ml_levels, x, extensive=False):
    """Composite (N,) -> fine (ny0, nx0): each cell's value replicated over
    its fine squares.  ``extensive`` divides level-l values by 4^l (for
    quantities that are integrals over the cell, e.g. the continuity RHS)."""
    grids = list(ml_levels)
    out = None
    off = 0
    for li, (ny, nx) in enumerate(grids):
        xg = x[off:off + ny * nx].reshape(ny, nx)
        off += ny * nx
        if extensive and li:
            xg = xg / (4.0 ** li)
        for k in range(li, 0, -1):
            xg = _GridOps(grids[k - 1]).prolong2(grids[k], xg)
        out = xg if out is None else out + xg
    return out


def _ml_restrict_avg(ml_levels, xf):
    """Fine (ny0, nx0) -> composite (N,): average over each cell's fine
    squares (intensive restriction, the adjoint of _ml_spread up to 4^l)."""
    grids = list(ml_levels)
    parts = [xf.reshape(-1)]
    cur = xf
    for li in range(1, len(grids)):
        cur = _GridOps(grids[li - 1]).restrict2(grids[li], cur)   # 2x2 sum
        parts.append((cur / (4.0 ** li)).reshape(-1))
    return jnp.concatenate(parts)


def build_multilevel_amg(mesh) -> MultilevelAmg | None:
    """Build the fine-grid hierarchy + masks for a multilevel DeviceMesh."""
    if not mesh.multilevel:
        return None
    grids = mesh.ml_levels
    ny0, nx0 = grids[0]

    def spread_np(v):
        out = np.zeros((ny0, nx0))
        off = 0
        for li, (ny, nx) in enumerate(grids):
            g = v[off:off + ny * nx].reshape(ny, nx)
            off += ny * nx
            up = np.kron(g, np.ones((1 << li, 1 << li)))
            out += up[:ny0, :nx0]
        return out

    valid = _host(mesh, "c_valid")
    fluid = spread_np(valid) > 0                       # (ny0, nx0)

    internal2 = np.zeros((4, ny0, nx0), dtype=bool)
    internal2[0, :, :-1] = fluid[:, :-1] & fluid[:, 1:]   # E
    internal2[1, :, 1:] = fluid[:, 1:] & fluid[:, :-1]    # W
    internal2[2, :-1, :] = fluid[:-1, :] & fluid[1:, :]   # N
    internal2[3, 1:, :] = fluid[1:, :] & fluid[:-1, :]    # S
    internal0 = np.moveaxis(internal2, 0, 2).reshape(-1, 4)

    levels = _structured_levels(ny0, nx0, internal0, fluid.reshape(-1))
    if not levels:
        return None
    fine = StructuredAmgHierarchy(
        levels=tuple(levels),
        diag_valid2=jnp.asarray(fluid, jnp.float32),
        internal2=jnp.asarray(internal2.astype(np.float32)))

    has_outlet = ((_host(mesh, "ck_boundary") == 2)
                  & (_host(mesh, "ck_mask") > 0)).any(axis=1)
    outlet = spread_np(has_outlet.astype(np.float64)) > 0
    outlet_e2 = np.zeros((ny0, nx0))
    outlet_e2[:, -1] = (outlet & fluid)[:, -1]
    return MultilevelAmg(fine=fine, ml_levels=tuple(grids),
                         outlet_e2=jnp.asarray(outlet_e2, jnp.float32))


def _dense_factor(diag, off, cols):
    """LU-factorize the coarsest-level matrix: scatter the ELL values into a
    dense (nc, nc) matrix (tiny) and factor once per assembly — the factors
    are then reused by every preconditioner application in the solve.
    ``cols`` is the static (nc, k) column-index map; zero-valued pad entries
    are harmless.  Rows with zero diagonal (masked solid aggregates) are
    regularized to identity.  Replaces the reference's 10 coarsest Jacobi
    sweeps (amg.rs:737-744), which cannot resolve the near-singular pressure
    constant mode."""
    nc = diag.shape[0]
    rows = jnp.repeat(jnp.arange(nc), cols.shape[1])
    # Tikhonov shift: the pressure operator's constant mode is near-null
    # (Dirichlet only at the outlet), and an unregularized f32 LU of the
    # near-singular coarse matrix produces garbage corrections.  The shift
    # caps the condition number; the slightly-damped constant mode is fine
    # for a preconditioner.
    eps = 1e-4 * jnp.mean(jnp.abs(diag))
    A = jnp.zeros((nc, nc), diag.dtype)
    A = A.at[jnp.arange(nc), jnp.arange(nc)].add(
        diag + eps + jnp.where(jnp.abs(diag) < 1e-30, 1.0, 0.0))
    A = A.at[rows, cols.reshape(-1)].add(off.reshape(-1))
    return jax.scipy.linalg.lu_factor(A)


def _dense_solve_factored(factors, b):
    return jax.scipy.linalg.lu_solve(factors, b)


class _GridOps:
    """Stencil ops on one structured level (E,W,N,S edge-clamped shifts)."""

    def __init__(self, grid):
        self.ny, self.nx = grid

    def color_mask(self):
        """Checkerboard color per cell (static constant, (n,) f32)."""
        j, i = np.divmod(np.arange(self.ny * self.nx), self.nx)
        return jnp.asarray(((j + i) % 2).astype(np.float32))

    def smooth_rbgs(self, diag, off, x, b, sweeps=1):
        """Red-black Gauss-Seidel: two colored half-sweeps per sweep.  On a
        5-point stencil each color's update uses only the other color's
        values, giving true Gauss-Seidel ordering with stencil-only ops —
        measured ~6x stronger V-cycle contraction than 4 damped-Jacobi
        sweeps at half the kernel count.

        With CFD2_PALLAS=1 each half-sweep runs as one fused Pallas kernel
        (DMA-staged halo slabs; see ops/pallas_stencil.py) instead of the
        XLA stencil chain."""
        from .pallas_stencil import pallas_enabled, smooth_rbgs_pallas
        if pallas_enabled():
            return smooth_rbgs_pallas((self.ny, self.nx), diag, off, x, b,
                                      sweeps=sweeps)
        color = self.color_mask()
        dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 0.0)
        for _ in range(sweeps):
            for c in (0.0, 1.0):
                sigma = jnp.sum(off * self.gather4(x), axis=1)
                xn = dinv * (b - sigma)
                x = jnp.where(color == c, xn, x)
        return x

    def neighbor_cols(self):
        """Static (n, 4) clamped neighbor column indices [E,W,N,S]."""
        ny, nx = self.ny, self.nx
        j, i = np.divmod(np.arange(ny * nx), nx)
        e = j * nx + np.minimum(i + 1, nx - 1)
        w = j * nx + np.maximum(i - 1, 0)
        n = np.minimum(j + 1, ny - 1) * nx + i
        s = np.maximum(j - 1, 0) * nx + i
        return jnp.asarray(np.stack([e, w, n, s], axis=1), jnp.int32)

    def gather4(self, x):
        ny, nx = self.ny, self.nx
        xg = x.reshape(ny, nx)
        e = jnp.concatenate([xg[:, 1:], xg[:, -1:]], axis=1)
        w = jnp.concatenate([xg[:, :1], xg[:, :-1]], axis=1)
        n = jnp.concatenate([xg[1:], xg[-1:]], axis=0)
        s = jnp.concatenate([xg[:1], xg[:-1]], axis=0)
        return jnp.stack([e, w, n, s], axis=2).reshape(ny * nx, 4)

    def spmv(self, diag, off, x):
        return diag * x + jnp.sum(off * self.gather4(x), axis=1)

    def smooth(self, diag, off, x, b, sweeps=1):
        dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 0.0)
        for _ in range(sweeps):
            x = x + _OMEGA * dinv * (b - self.spmv(diag, off, x))
        return x

    def restrict_to(self, coarse_grid, r):
        nyc, nxc = coarse_grid
        rg = r.reshape(self.ny, self.nx)
        rg = jnp.pad(rg, ((0, 2 * nyc - self.ny), (0, 2 * nxc - self.nx)))
        return rg.reshape(nyc, 2, nxc, 2).sum(axis=(1, 3)).reshape(-1)

    def prolong_from(self, coarse_grid, xc):
        nyc, nxc = coarse_grid
        xg = xc.reshape(nyc, nxc)
        xg = jnp.repeat(jnp.repeat(xg, 2, axis=0), 2, axis=1)
        return xg[:self.ny, :self.nx].reshape(-1)

    # ------------------------------------------------------------------
    # 2D-native variants: state stays (ny, nx), values (ny, nx) / (4, ny, nx).
    #
    # The flat methods above reshape (n,) <-> (ny, nx) around every stencil.
    # Profiling the FGMRES while_loop on TPU showed those reshapes lower to
    # standalone relayout kernels at ~1.3 ms each for 2-8 MB arrays when the
    # loop's live set is large (2M cells: 12 reshape kernels = ~15 ms of the
    # 51 ms/iteration).  Keeping every level's state and coefficients in 2D
    # grid form eliminates them: shifts, coloring, and residuals all fuse.

    def color2(self):
        """Checkerboard color, (ny, nx) f32 static constant."""
        j = np.arange(self.ny)[:, None]
        i = np.arange(self.nx)[None, :]
        return jnp.asarray(((j + i) % 2).astype(np.float32))

    def shifts2(self, xg):
        """Edge-clamped E,W,N,S neighbor grids of an (ny, nx) array."""
        e = jnp.concatenate([xg[:, 1:], xg[:, -1:]], axis=1)
        w = jnp.concatenate([xg[:, :1], xg[:, :-1]], axis=1)
        n = jnp.concatenate([xg[1:], xg[-1:]], axis=0)
        s = jnp.concatenate([xg[:1], xg[:-1]], axis=0)
        return e, w, n, s

    def _sigma2(self, off2, xg):
        e, w, n, s = self.shifts2(xg)
        return off2[0] * e + off2[1] * w + off2[2] * n + off2[3] * s

    def spmv2(self, diag2, off2, xg):
        return diag2 * xg + self._sigma2(off2, xg)

    def smooth_rbgs2(self, diag2, off2, xg, bg, sweeps=1):
        """Red-black Gauss-Seidel on 2D grids (see smooth_rbgs)."""
        color = self.color2()
        dinv = jnp.where(jnp.abs(diag2) > 1e-30, 1.0 / diag2, 0.0)
        for _ in range(sweeps):
            for c in (0.0, 1.0):
                xn = dinv * (bg - self._sigma2(off2, xg))
                xg = jnp.where(color == c, xn, xg)
        return xg

    def restrict2(self, coarse_grid, rg):
        # reduce_window, NOT reshape(nyc,2,nxc,2).sum: the 4D intermediate's
        # minor dims (2,2) tile-pad to (8,128) on TPU — a 64x memory
        # expansion (511 MB for an 8 MB level-0 buffer) that both OOMs and
        # serializes as mammoth relayout kernels.
        nyc, nxc = coarse_grid
        rg = jnp.pad(rg, ((0, 2 * nyc - self.ny), (0, 2 * nxc - self.nx)))
        return lax.reduce_window(rg, jnp.asarray(0.0, rg.dtype), lax.add,
                                 (2, 2), (2, 2), "VALID")

    def prolong2(self, coarse_grid, xcg):
        # Piecewise-constant 2x upsample without jnp.repeat (whose internal
        # (nyc,2,nxc,2) reshape hits the same tile-padding blowup as
        # restrict): interior-dilate to even positions, then accumulate the
        # one-step shifts to fill odd rows/columns.
        zero = jnp.asarray(0.0, xcg.dtype)
        d = lax.pad(xcg, zero, ((0, 1, 1), (0, 1, 1)))       # (2nyc, 2nxc)
        rows = d + jnp.concatenate([d[:1] * 0, d[:-1]], axis=0)
        full = rows + jnp.concatenate([rows[:, :1] * 0, rows[:, :-1]], axis=1)
        return full[:self.ny, :self.nx]


_NULL_SHIFT = 1e-3  # shifted-Laplacian regularization (see below)


def compute_structured_level_values(hier: StructuredAmgHierarchy,
                                    P_diag: jnp.ndarray, P_off: jnp.ndarray):
    """Galerkin-coarsen values down the structured hierarchy.  The fine off
    values are flattened slot-major to match _structured_rap_target.

    The fine diagonal is shifted by ``_NULL_SHIFT * |diag|`` before
    coarsening: the pressure operator's constant mode is near-null (Dirichlet
    only at the outlet) with a condition number beyond f32, so an unshifted
    multigrid cycle turns into noise amplification.  The shift caps the
    condition; the V-cycle then preconditions the shifted operator exactly,
    and FGMRES absorbs the rank-one discrepancy on the constant mode."""
    P_diag = P_diag + _NULL_SHIFT * jnp.abs(P_diag)
    vals = [(P_diag, P_off[:, :4])]
    for li, lvl in enumerate(hier.levels):
        fd, fo = vals[-1]
        kf = fo.shape[1]
        flat = jnp.concatenate([fd, fo.T.reshape(-1)])   # slot-major
        nc = lvl.n
        seg = jax.ops.segment_sum(flat, lvl.rap_target, num_segments=nc * 5 + 1)
        seg = seg[:-1].reshape(nc, 5)
        vals.append((seg[:, 0], seg[:, 1:]))
    return vals


def compute_structured_level_values2(hier: StructuredAmgHierarchy,
                                     P_diag2: jnp.ndarray,
                                     P_off2: jnp.ndarray):
    """Galerkin-coarsen values down the structured hierarchy as pure 2D
    stencils — no ``segment_sum``.

    Equivalent to :func:`compute_structured_level_values` (the parity is
    pinned by tests/test_stencil_system.py) but ~40x faster on TPU at 1M
    cells: the flat formulation's per-level scatter-add over 5N values cost
    ~74 ms per assembly, while this is a handful of masked ``reduce_window``
    sums.  For 2x2 piecewise-constant aggregation of a 5-point stencil:

    * a fine E entry at even x couples cells in the *same* block -> coarse
      diagonal; at odd x it crosses the block boundary -> coarse E slot
      (mirrored for W/N/S);
    * the coarse entry is the 2x2 block-sum of the masked fine grid.

    Takes/returns 2D grid form: ``P_diag2`` (ny, nx), ``P_off2`` (4+, ny, nx)
    slots E,W,N,S (extras ignored, as in the flat version).  Returns
    ``[(diag2, off2), ...]`` per level, coarsest last.
    """
    d0 = P_diag2 + _NULL_SHIFT * jnp.abs(P_diag2)
    vals = [(d0, P_off2[:4])]
    for li, lvl in enumerate(hier.levels):
        d, off = vals[-1]
        if li == 0:
            # The masks apply to the level-0 -> 1 transition only (matching
            # the flat version's rap_target dumps); level-0 values themselves
            # stay raw for the fine smoother.
            d = d * hier.diag_valid2
            off = off * hier.internal2
        nyf, nxf = lvl.fine_grid
        ops = _GridOps(lvl.fine_grid)
        evx = (jnp.arange(nxf) % 2 == 0).astype(d.dtype)[None, :]
        evy = (jnp.arange(nyf) % 2 == 0).astype(d.dtype)[:, None]
        odx = 1.0 - evx
        ody = 1.0 - evy
        # Within-block couplings fold into the coarse diagonal.
        within = off[0] * evx + off[1] * odx + off[2] * evy + off[3] * ody
        dc = ops.restrict2(lvl.grid, d + within)
        oc = jnp.stack([ops.restrict2(lvl.grid, off[0] * odx),
                        ops.restrict2(lvl.grid, off[1] * evx),
                        ops.restrict2(lvl.grid, off[2] * ody),
                        ops.restrict2(lvl.grid, off[3] * evy)])
        vals.append((dc, oc))
    return vals


def structured_level_values_2d(hier: StructuredAmgHierarchy, level_values):
    """Reshape flat per-level values [(n,), (n,4)] to 2D grid form
    [(ny,nx), (4,ny,nx)].  Done once per assembly (outside the Krylov loop)
    so the solve-path stencils never touch flat layouts."""
    grids = [hier.levels[0].fine_grid] + [lvl.grid for lvl in hier.levels]
    out = []
    for (ny, nx), (d, o) in zip(grids, level_values):
        if d.ndim == 2:
            out.append((d, o))
        else:
            out.append((d.reshape(ny, nx), o.T.reshape(4, ny, nx)))
    return out


def structured_v_cycle(hier: StructuredAmgHierarchy, level_values,
                       b0: jnp.ndarray, x0: jnp.ndarray,
                       coarse_factors=None, sweeps: int = 1) -> jnp.ndarray:
    """One V(1,1)-cycle with red-black Gauss-Seidel smoothing and an exact
    (dense, regularized) coarsest solve — all stencils/reshapes, no gathers.
    Plain-aggregation transfers need a strong smoother: damped Jacobi V(1,1)
    diverges; RB-GS V(1,1) contracts at ~0.5-0.7/cycle.
    ``coarse_factors``: precomputed LU of the coarsest matrix (hoisted out
    of the per-application path); computed on the fly when None.

    The cycle runs 2D-native (one reshape at entry and exit; see _GridOps
    2D methods): on TPU the per-op (n,) <-> (ny,nx) relayouts of the flat
    formulation dominated the preconditioner cost inside the FGMRES
    while_loop at >=2M cells.  ``level_values`` may be flat or already in
    2D form (structured_level_values_2d)."""
    L = len(hier.levels)
    grids = [hier.levels[0].fine_grid] + [lvl.grid for lvl in hier.levels]
    ops = [_GridOps(g) for g in grids]
    lv2 = structured_level_values_2d(hier, level_values)

    from .pallas_stencil import (fused_rbgs2, pallas_enabled, pallas_level,
                                 smooth_rbgs_pallas)
    fused = pallas_level() >= 2
    interp = jax.default_backend() != "tpu"

    def smooth(i, xg, bg):
        diag2, off2 = lv2[i]
        if fused:
            # One kernel per leg per level (CFD2_PALLAS=2).
            return fused_rbgs2(xg, diag2, off2, bg, grids[i], sweeps=sweeps,
                               interpret=interp)
        if pallas_enabled():
            # Per-half-sweep kernels, flat layouts (CFD2_PALLAS=1).
            ny, nx = grids[i]
            off_flat = jnp.moveaxis(off2.reshape(4, ny * nx), 0, 1)
            x = smooth_rbgs_pallas((ny, nx), diag2.reshape(-1), off_flat,
                                   xg.reshape(-1), bg.reshape(-1),
                                   sweeps=sweeps)
            return x.reshape(ny, nx)
        return ops[i].smooth_rbgs2(diag2, off2, xg, bg, sweeps=sweeps)

    xs = [x0.reshape(grids[0])]
    bs = [b0.reshape(grids[0])]
    for i in range(L):
        diag2, off2 = lv2[i]
        if fused:
            x, r = fused_rbgs2(xs[i], diag2, off2, bs[i], grids[i],
                               sweeps=sweeps, residual=True,
                               interpret=interp)
        else:
            x = smooth(i, xs[i], bs[i])
            r = bs[i] - ops[i].spmv2(diag2, off2, x)
        xs[i] = x
        bs.append(ops[i].restrict2(grids[i + 1], r))
        xs.append(jnp.zeros(grids[i + 1], x0.dtype))

    diag2, off2 = lv2[L]
    if coarse_factors is None:
        coarse_factors = _dense_factor(
            diag2.reshape(-1),
            jnp.moveaxis(off2.reshape(4, -1), 0, 1),
            ops[L].neighbor_cols())
    xs[L] = _dense_solve_factored(
        coarse_factors, bs[L].reshape(-1)).reshape(grids[L])

    for i in reversed(range(L)):
        x = xs[i] + ops[i].prolong2(grids[i + 1], xs[i + 1])
        xs[i] = smooth(i, x, bs[i])
    return xs[0].reshape(-1)


# ----------------------------------------------------------------------
# Device-side per-solve value computation + V-cycle


def compute_level_values(hier: AmgHierarchy, P_diag: jnp.ndarray,
                         P_off: jnp.ndarray):
    """Galerkin-coarsen the current pressure values down the hierarchy.

    Unlike the structured path, the fine diagonal is NOT ``_NULL_SHIFT``
    regularized here: measured on a 36k Delaunay coupled solve, the shift
    cost iterations (150 -> 250; tools/prof_amg_variants.py) — the generic
    hierarchy's regularized coarsest LU already bounds the near-null
    constant mode well enough for FGMRES."""
    vals = [(P_diag, P_off)]
    for lvl in hier.levels:
        fd, fo = vals[-1]
        flat = jnp.concatenate([fd, fo.reshape(-1)])
        seg = jax.ops.segment_sum(flat, lvl.rap_target,
                                  num_segments=lvl.n * (lvl.k + 1) + 1)
        seg = seg[:-1].reshape(lvl.n, lvl.k + 1)
        vals.append((seg[:, 0], seg[:, 1:]))
    return vals


def _ell_spmv(diag, off, dot, x):
    return diag * x + dot(off, x)


def _smooth(diag, off, dot, x, b, sweeps=1):
    dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 0.0)
    for _ in range(sweeps):
        x = x + _OMEGA * dinv * (b - _ell_spmv(diag, off, dot, x))
    return x


def _gershgorin_lmax(diag, off):
    """Per-level upper bound on lambda_max(D^-1 A) from row sums; exact and
    data-dependent (traced), so Chebyshev smoothing never runs with modes
    outside its interval (a fixed 1.9 bound measured NaN: the pressure
    M-matrix's interior rows reach exactly 2.0)."""
    ad = jnp.abs(diag)
    row_abs = jnp.sum(jnp.abs(off), axis=1)
    if off.ndim == 3:            # pre-blocked (NB, K, LANES) plane
        row_abs = row_abs.reshape(-1)[:ad.shape[0]]
    ratio = (ad + row_abs) / jnp.maximum(ad, 1e-30)
    return jnp.max(jnp.where(ad > 1e-30, ratio, 1.0))


def _smooth_cheb(diag, off, dot, x, b, degree=2, lmax=2.0):
    """Chebyshev polynomial smoother on the Jacobi-preconditioned operator
    D^-1 A, targeting [lmax/4, lmax] — the standard aggregation-AMG
    smoother (e.g. hypre/MueLu).  Each application costs ``degree`` operator
    dots, same as ``degree`` Jacobi sweeps, but damps the upper 3/4 of the
    spectrum uniformly instead of only the very top.  ``lmax`` may be a
    traced scalar (see :func:`_gershgorin_lmax`)."""
    dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 0.0)
    lmin = lmax / 4.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    r = b - _ell_spmv(diag, off, dot, x)
    d = dinv * r / theta
    x = x + d
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        r = b - _ell_spmv(diag, off, dot, x)
        d = rho_new * rho * d + 2.0 * rho_new / delta * (dinv * r)
        rho = rho_new
        x = x + d
    return x


def v_cycle(hier: AmgHierarchy, level_values, mesh,
            b0: jnp.ndarray, x0: jnp.ndarray,
            coarse_factors=None, smoother: str = "jacobi",
            smooth_arg: int = 1, overcorrect: float = 1.0) -> jnp.ndarray:
    """One V-cycle; level structure is static so the cycle fully unrolls.

    Per-level neighbor sums go through fused banded dots where a banded map
    exists (ops/banded_gather.banded_dot: the (n, k) gathered values never
    touch HBM); level 0 on structured meshes keeps ``mesh.gather`` stencil
    shifts (XLA fuses the dot into the shifts), and unbanded coarse levels
    use plain XLA gathers.

    ``smoother``: "jacobi" (damped, ``smooth_arg`` sweeps) or "cheb"
    (Chebyshev of degree ``smooth_arg``).  ``overcorrect``: scale on the
    prolongated coarse correction — piecewise-constant aggregation
    transfers underestimate the correction energy, and scaling by ~1.5-1.8
    is the classic plain-aggregation fix (Braess '95 / Notay's over-
    correction; smoothed aggregation without the wider RAP pattern).
    """
    from .banded_gather import banded_dot, banded_gather_nk

    def _bm_dot(bm, w, m_out, wgs=None):
        return lambda off, x: banded_dot(
            (x,), (off,), *bm, w, (((0, 0),),), m_out=m_out, wgs=wgs)[0]

    def _ell_dot(lvl):
        if lvl.bm_ell is not None:
            return _bm_dot(lvl.bm_ell, lvl.w_ell, lvl.n, wgs=lvl.g_ell)
        return lambda off, x: jnp.sum(off * x[lvl.ell_neighbor], axis=1)

    if mesh.banded:
        def _dot0(off, x):
            return mesh.banded_dot((x,), (off,), (((0, 0),),))[0]
    else:
        def _dot0(off, x):
            return jnp.sum(off * mesh.gather(x), axis=1)

    L = len(hier.levels)
    dots = [_dot0] + [_ell_dot(lvl) for lvl in hier.levels]

    if smoother == "cheb":
        def smooth(diag, off, dot, x, b):
            return _smooth_cheb(diag, off, dot, x, b, degree=smooth_arg,
                                lmax=_gershgorin_lmax(diag, off))
    else:
        def smooth(diag, off, dot, x, b):
            return _smooth(diag, off, dot, x, b, sweeps=smooth_arg)

    xs = [x0]
    bs = [b0]
    # Downward
    for i in range(L):
        diag, off = level_values[i]
        lvl = hier.levels[i]
        x = smooth(diag, off, dots[i], xs[i], bs[i])
        r = bs[i] - _ell_spmv(diag, off, dots[i], x)
        if lvl.bm_members is not None:
            b_c = _bm_dot(lvl.bm_members, lvl.w_members, lvl.n,
                          wgs=lvl.g_members)(lvl.members_mask, r)
        else:
            b_c = jnp.sum(r[lvl.members] * lvl.members_mask, axis=1)
        xs[i] = x
        bs.append(b_c)
        xs.append(jnp.zeros((lvl.n,), x.dtype))

    # Coarsest solve: exact dense solve (see _dense_factor).
    diag, off = level_values[L]
    if coarse_factors is None:
        coarsest_cols = (hier.levels[-1].ell_neighbor if L > 0
                         else jnp.zeros((diag.shape[0], 1), jnp.int32))
        coarse_factors = _dense_factor(diag, off, coarsest_cols)
    xs[L] = _dense_solve_factored(coarse_factors, bs[L])

    # Upward
    for i in reversed(range(L)):
        lvl = hier.levels[i]
        diag, off = level_values[i]
        if lvl.bm_agg is not None:
            prol = banded_gather_nk(xs[i + 1], *lvl.bm_agg, lvl.w_agg,
                                    m_out=lvl.agg.shape[0])[:, 0]
        else:
            prol = xs[i + 1][lvl.agg]
        x = xs[i] + overcorrect * prol
        xs[i] = smooth(diag, off, dots[i], x, bs[i])

    return xs[0]


def coarse_level_values(hier: "AmgHierarchy", P_diag, P_off):
    """Galerkin-coarsen once and return ``(coarse_vals, factors)`` suitable
    for :func:`make_pressure_solve`'s ``frozen=`` argument: the level-1+
    (diag, off) pairs plus the coarsest-level dense factorization.  Used by
    the fused step to re-coarsen once per TIMESTEP instead of once per outer
    corrector (SolverConfig.amg_freeze_coarse)."""
    level_values = compute_level_values(hier, P_diag, P_off)
    dc, oc = level_values[-1]
    cols = (hier.levels[-1].ell_neighbor if hier.levels
            else jnp.zeros((dc.shape[0], 1), jnp.int32))
    factors = _dense_factor(dc, oc, cols)
    return tuple(level_values[1:]), factors


def make_pressure_solve(hier, mesh, sys: BlockSystem, coeff=None,
                        cycle_opts=None, frozen=None):
    """pressure_solve(rhs_p) closure for the Schur preconditioner (the AMG
    path of coupled_solver_fgmres.rs:1942-1946).
    ``cycle_opts``: extra kwargs for the generic :func:`v_cycle` (smoother /
    overcorrection variants; used by the aggregation-AMG path only).

    ``hier`` must reach the jitted computation as an *argument* pytree, never
    a Python closure constant — its index arrays would otherwise be embedded
    in the HLO as literals (huge programs; breaks remote compilation).
    ``coeff`` (multilevel only): the composite rho*d_p field used to build
    the fine-grid operator.
    ``frozen`` (generic hierarchy only): ``(coarse_vals, factors)`` from
    :func:`coarse_level_values` — skip the per-call Galerkin re-coarsening
    and use these level-1+ operators instead (level 0 stays current).
    """
    if isinstance(hier, MultilevelAmg):
        grids = hier.ml_levels
        ny0, nx0 = grids[0]
        fh = hier.fine
        valid = mesh.c_valid
        # Mask composite holes before any spread: a level-l hole position
        # (region refined elsewhere / solid) would otherwise upsample its
        # junk into fine squares owned by OTHER cells.
        c2 = _ml_spread(grids, coeff * valid)            # intensive rho*d_p
        intl = fh.internal2
        ops0 = _GridOps((ny0, nx0))
        e, w, n, s = ops0.shifts2(c2)
        # Uniform fine-grid pressure Laplacian: area/dist = 1 per face,
        # lam = 1/2, Dirichlet p=0 at the outlet column.
        offE = -0.5 * (c2 + e) * intl[0]
        offW = -0.5 * (c2 + w) * intl[1]
        offN = -0.5 * (c2 + n) * intl[2]
        offS = -0.5 * (c2 + s) * intl[3]
        off2 = jnp.stack([offE, offW, offN, offS])
        diag2 = -(offE + offW + offN + offS) + hier.outlet_e2 * c2
        lv2 = compute_structured_level_values2(fh, diag2, off2)
        dc, oc = lv2[-1]
        factors = _dense_factor(
            dc.reshape(-1), jnp.moveaxis(oc.reshape(4, -1), 0, 1),
            _GridOps(fh.levels[-1].grid).neighbor_cols())
        dinv0 = jnp.where(jnp.abs(diag2) > 1e-30, 1.0 / diag2, 0.0)

        from .blockell import scalar_spmv
        Pd = sys.P_diag
        Po = sys.P_off
        dpi = sys.diag_p_inv
        omega_s = 0.8

        def fine_correct(r):
            """Approximate composite solve via the fine-grid V-cycle."""
            rf = _ml_spread(grids, r * valid, extensive=True)
            zf = structured_v_cycle(fh, lv2, rf.reshape(-1),
                                    (dinv0 * rf).reshape(-1),
                                    coarse_factors=factors)
            return _ml_restrict_avg(grids, zf.reshape(ny0, nx0))

        def pressure_solve(rhs_p):
            # FAC-style two-grid: damped-Jacobi smoothing on the TRUE
            # composite operator handles the rough/cross-level error the
            # fine-grid surrogate misrepresents; the fine V-cycle supplies
            # the smooth correction.  The surrogate alone stalls FGMRES
            # (cross-level rows differ at O(1); the smooth modes also see
            # the _NULL_SHIFT damping).
            z = omega_s * dpi * rhs_p
            z = z + fine_correct(rhs_p - scalar_spmv(Pd, Po, mesh, z))
            z = z + omega_s * dpi * (rhs_p - scalar_spmv(Pd, Po, mesh, z))
            # Identity on hole components, matching the composite P's
            # identity rows (keeps the preconditioned operator = I there).
            return jnp.where(valid > 0, z, rhs_p)

        return pressure_solve

    if isinstance(hier, StructuredAmgHierarchy):
        ny, nx = hier.levels[0].fine_grid
        lv2 = compute_structured_level_values2(
            hier, sys.P_diag.reshape(ny, nx),
            jnp.moveaxis(sys.P_off[:, :4], 0, 1).reshape(4, ny, nx))
        dc, oc = lv2[-1]
        factors = _dense_factor(
            dc.reshape(-1), jnp.moveaxis(oc.reshape(4, -1), 0, 1),
            _GridOps(hier.levels[-1].grid).neighbor_cols())

        def pressure_solve(rhs_p):
            x0 = sys.diag_p_inv * rhs_p
            return structured_v_cycle(hier, lv2, rhs_p, x0,
                                      coarse_factors=factors)

        return pressure_solve

    if frozen is not None:
        # Per-step frozen coarse operators (SolverConfig.amg_freeze_coarse):
        # the caller Galerkin-coarsened ONCE at the start of the timestep;
        # only level 0 (free — it's the current assembly) tracks the outer
        # iteration.  Preconditioner-only staleness: FGMRES is flexible, so
        # the rtol/atol contract is untouched.  Measured on the developed
        # 130k refined-cutcell state: the per-outer segment-sum RAP was
        # 7.5 ms of a 25 ms outer.
        coarse_vals, factors = frozen
        level_values = [(sys.P_diag, sys.P_off)] + list(coarse_vals)
    else:
        level_values = compute_level_values(hier, sys.P_diag, sys.P_off)
        dc, oc = level_values[-1]
        cols = (hier.levels[-1].ell_neighbor if hier.levels
                else jnp.zeros((dc.shape[0], 1), jnp.int32))
        factors = _dense_factor(dc, oc, cols)
    # Level 0 dots ride the banded kernel: use the pre-blocked plane when
    # the system carries one (EllSystem on banded meshes) so the V-cycle's
    # ~4 level-0 operator applications per cycle skip the (N, K) ->
    # (NB, K, LANES) relayout.  Coarsening above used the flat (N, K) form.
    p_off_b = getattr(sys, "P_offB", None)
    if mesh.banded and p_off_b is not None:
        level_values = [(sys.P_diag, p_off_b)] + list(level_values[1:])
    opts = dict(cycle_opts or {})

    def pressure_solve(rhs_p):
        x0 = sys.diag_p_inv * rhs_p          # Jacobi seed, like p_sol init
        return v_cycle(hier, level_values, mesh, rhs_p, x0,
                       coarse_factors=factors, **opts)

    return pressure_solve


def build_hierarchy_for_mesh(mesh, agg_passes: int = 0):
    """Build the hierarchy for a DeviceMesh: geometric 2x2 multigrid on
    structured meshes (stencil-only), fine-grid-embedded multigrid on
    multilevel meshes, generic greedy AMG otherwise.  None if the mesh is
    too small.

    ``agg_passes=0`` (auto) resolves to 2 on the generic path: the
    unstructured V-cycle at >=100k cells is kernel-launch-bound, so the
    shallower double-pass hierarchy (7 -> 4 levels at 145k delaunay) wins
    end-to-end (steps 1.57/1.73 -> 1.36/1.41 s) despite slightly weaker
    per-cycle contraction."""
    if mesh.structured:
        hier = build_structured_hierarchy(mesh)
        if hier is not None:
            return hier
    if mesh.multilevel:
        hier = build_multilevel_amg(mesh)
        if hier is not None:
            return hier
    hier = build_hierarchy(_host(mesh, "ck_neighbor"),
                           _host(mesh, "ck_mask"),
                           _host(mesh, "c_valid"),
                           agg_passes=agg_passes or 2)
    return hier if hier.levels else None
