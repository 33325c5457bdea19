"""Device mesh encoding: host ``Mesh`` -> padded JAX arrays.

The TPU-native replacement for the reference's GPU mesh upload + CSR build
(reference: src/solver/gpu/init/mesh.rs:24-285).  Layouts:

* **cell-major padded (N, K)** arrays drive assembly and all matrix products —
  each cell reads its K face slots and reduces, so faces->cells accumulation
  is a reduction over a static axis instead of a scatter.
* **structured fast path**: uniform cut-cell meshes (the flagship benchmark
  configurations) are laid out on their generating (ny, nx) grid with solid
  cells masked out, and slots 0..3 fixed to the E/W/N/S neighbors.  Every
  neighbor access then lowers to an array *shift* — a fused stencil on the
  VPU — instead of an XLA gather (which runs near scalar speed on TPU and was
  measured ~100x slower).  This is the central TPU-first design decision.
* **generic path**: Delaunay/Voronoi/locally-refined meshes keep arbitrary
  (N, K) neighbor indices and use gathers.

The linear system lives in **block-ELL** layout keyed by the same (N, K)
structure: (N, K, 3, 3) off-diagonal blocks + (N, 3, 3) diagonal blocks
(reference equivalent: the interleaved 3Nx3N block CSR of
init/linear_solver/mod.rs:180-216).

All geometric factors (distance weights, projected distances, per-slot
outward normals) are precomputed here in float64 and stored as float32 device
arrays; the solver kernels are pure elementwise/stencil code over them.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.structs import Mesh

# Structured slot convention.
SLOT_E, SLOT_W, SLOT_N, SLOT_S = 0, 1, 2, 3


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceMesh:
    """Frozen pytree of device arrays describing one mesh."""

    # --- static metadata ---
    num_cells: int                # device cell count (incl. masked solids)
    num_faces: int
    max_faces: int                # K
    num_host_cells: int           # fluid cells in the host mesh
    grid_shape: tuple | None      # (ny, nx) for the structured fast path
    # Multilevel (locally-refined quadtree) fast path: per-level (ny, nx)
    # grids, finest first; device cells are the levels' grids concatenated.
    ml_levels: tuple | None
    # Banded generic fast path (ops/banded_gather.py): static window-row
    # count; None when the mesh is structured/multilevel or the band is too
    # wide.
    bd_W: int | None
    # Two-window banded gather for the multilevel layout (same-level band +
    # cross-level band per block); None when unavailable.
    bd2_W: int | None
    # Sorted-slot grouped banded map (generic path; slots sorted by neighbor
    # id at encode so slot k is the k-th order statistic): static
    # (per-group walk lengths, slot-group bounds) consumed with
    # bd_lane/bd_sel/bd_base; None when a window map is cheaper.
    bd_wgs: tuple | None
    # Slot-capped banded map: the kernel walks only the first bd_k slots (a
    # (K<=8, LANES) tile is ONE vreg per step — see banded_gather
    # .window_cost) and the rare occupied slots >= bd_k are handled as a
    # tiny COO overflow (bd_of_*): exact gather/scatter-add corrections for
    # gather() and banded_dot(); dropped from the Jacobi-sweep smoother
    # (preconditioner-only).  None when K already <= 8 or overflow is dense.
    bd_k: int | None

    # --- face-major (F,) — generic flux path ---
    f_owner: jnp.ndarray          # int32 (device ids)
    f_neighbor: jnp.ndarray       # int32, -1 = boundary
    f_neighbor_safe: jnp.ndarray
    f_internal: jnp.ndarray       # bool
    f_boundary: jnp.ndarray       # int32 code (0/1/2/3)
    f_area: jnp.ndarray
    f_nx: jnp.ndarray             # canonical: points OUT of owner
    f_ny: jnp.ndarray
    f_cx: jnp.ndarray
    f_cy: jnp.ndarray
    f_lambda: jnp.ndarray         # owner-side dist weight d_n/(d_o+d_n)
    f_dist_cc: jnp.ndarray        # max(|(c_n - c_o) . n|, 1e-6)

    # --- cell-major (N,) ---
    c_cx: jnp.ndarray
    c_cy: jnp.ndarray
    c_vol: jnp.ndarray
    c_valid: jnp.ndarray          # f32: 1 fluid, 0 masked solid
    grid_of_cell: jnp.ndarray     # (num_host_cells,) device index of host cell

    # --- cell-major padded (N, K) ---
    ck_face: jnp.ndarray          # int32 face index (pad: 0)
    ck_mask: jnp.ndarray          # f32 1.0 valid / 0.0 pad
    ck_sign: jnp.ndarray          # f32 +1 owner / -1 neighbor (pad: 0)
    ck_neighbor: jnp.ndarray      # int32 adjacent device cell (pad/bdry: self)
    ck_is_boundary: jnp.ndarray   # f32 1.0 if boundary face
    ck_boundary: jnp.ndarray      # int32 boundary code
    ck_nx: jnp.ndarray            # outward normal from THIS cell
    ck_ny: jnp.ndarray
    ck_area: jnp.ndarray
    ck_lam: jnp.ndarray           # own-side weight: d_other/(d_own+d_other)
    # The partner entry's own lam (d_own/(d_own+d_other)), bitwise equal to
    # what the other side of the face computes.  Interpolating with
    # (lam, lam_other) instead of (lam, 1-lam) makes the symmetric face
    # interpolation BITWISE identical from both sides, so per-side flux
    # evaluation on the generic banded path is exactly antisymmetric (the
    # other flux terms are exact f32 negations across the pair).
    ck_lam_other: jnp.ndarray
    ck_dist_proj: jnp.ndarray     # max(|d . n|, 1e-6)
    ck_dist: jnp.ndarray          # plain |other - this center|
    ck_rx: jnp.ndarray            # f_center - this center
    ck_ry: jnp.ndarray
    ck_dcdx: jnp.ndarray          # other_center - this center
    ck_dcdy: jnp.ndarray

    # --- multilevel fast path (None elsewhere) ---
    # Exception entries: internal (cell, slot) pairs whose neighbor is NOT
    # the same-level grid shift (cross-level/hanging faces) — resolved by a
    # tiny gather+scatter on top of the per-level shifts.
    ml_exc_cell: jnp.ndarray | None = None   # (E,) int32 device cell
    ml_exc_slot: jnp.ndarray | None = None   # (E,) int32 slot
    ml_exc_src: jnp.ndarray | None = None    # (E,) int32 neighbor device cell
    # (N, 4) f32: 1 where the W/S slot's flux may mirror the same-level
    # partner's E/N slot value by shift (exact antisymmetry).
    ck_mirror: jnp.ndarray | None = None

    # Banded generic fast path index planes (NB, K, 128) int32 + per-block
    # base source rows (NB,) int32.
    bd_lane: jnp.ndarray | None = None
    bd_sel: jnp.ndarray | None = None
    bd_base: jnp.ndarray | None = None
    bd2_lane: jnp.ndarray | None = None
    bd2_sel: jnp.ndarray | None = None
    bd2_bases: jnp.ndarray | None = None

    # Multilevel: (cell, slot) entry pairs of internal faces NOT resolved by
    # the W/S mirror shift (cross-level/hanging + extra-slot faces).  The
    # flux kernel computes side a once and scatters -value to side b, so
    # per-face mass-flux antisymmetry is exact on refined meshes too
    # (advisor r2: per-side re-evaluation only matched to f32 rounding).
    ml_pair_cell_a: jnp.ndarray | None = None
    ml_pair_slot_a: jnp.ndarray | None = None
    ml_pair_cell_b: jnp.ndarray | None = None
    ml_pair_slot_b: jnp.ndarray | None = None

    # Slot-cap COO overflow (see bd_k): occupied (cell, slot >= bd_k)
    # entries and their neighbor cells.  (E,) int32 each; None when unused.
    bd_of_rows: jnp.ndarray | None = None
    bd_of_slots: jnp.ndarray | None = None
    bd_of_src: jnp.ndarray | None = None

    # Optional per-face inlet velocity profile scale (u_inlet(face) =
    # params.inlet_velocity * scale); None = uniform inlet (the reference's
    # only mode, structs.rs:86-101).  Standard benchmarks (Schäfer–Turek)
    # need a parabolic profile.  f_: (F,) face-major; ck_: (N, K) slots.
    f_inlet_scale: jnp.ndarray | None = None
    ck_inlet_scale: jnp.ndarray | None = None

    _dyn_fields = (
        "f_owner", "f_neighbor", "f_neighbor_safe", "f_internal", "f_boundary",
        "f_area", "f_nx", "f_ny", "f_cx", "f_cy", "f_lambda", "f_dist_cc",
        "c_cx", "c_cy", "c_vol", "c_valid", "grid_of_cell",
        "ck_face", "ck_mask", "ck_sign", "ck_neighbor", "ck_is_boundary",
        "ck_boundary", "ck_nx", "ck_ny", "ck_area", "ck_lam", "ck_lam_other",
        "ck_dist_proj",
        "ck_dist", "ck_rx", "ck_ry", "ck_dcdx", "ck_dcdy",
        "ml_exc_cell", "ml_exc_slot", "ml_exc_src", "ck_mirror",
        "bd_lane", "bd_sel", "bd_base",
        "bd2_lane", "bd2_sel", "bd2_bases",
        "ml_pair_cell_a", "ml_pair_slot_a", "ml_pair_cell_b",
        "ml_pair_slot_b",
        "bd_of_rows", "bd_of_slots", "bd_of_src",
        "f_inlet_scale", "ck_inlet_scale",
    )

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._dyn_fields)
        aux = (self.num_cells, self.num_faces, self.max_faces,
               self.num_host_cells, self.grid_shape, self.ml_levels,
               self.bd_W, self.bd2_W, self.bd_wgs, self.bd_k)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    # ------------------------------------------------------------------
    @property
    def structured(self) -> bool:
        return self.grid_shape is not None

    @property
    def multilevel(self) -> bool:
        return self.ml_levels is not None

    @property
    def ml_offsets(self) -> tuple:
        offs = []
        off = 0
        for ny, nx in self.ml_levels:
            offs.append(off)
            off += ny * nx
        return tuple(offs)

    def _shift_slots(self, xg):
        """Edge-clamped E, W, N, S shifts of an (ny, nx, ...) grid."""
        e = jnp.concatenate([xg[:, 1:], xg[:, -1:]], axis=1)
        w = jnp.concatenate([xg[:, :1], xg[:, :-1]], axis=1)
        n = jnp.concatenate([xg[1:], xg[-1:]], axis=0)
        s = jnp.concatenate([xg[:1], xg[:-1]], axis=0)
        return e, w, n, s

    def gather(self, x: jnp.ndarray) -> jnp.ndarray:
        """Neighbor values per slot: (N, ...) -> (N, K, ...).

        Structured: four edge-clamped shifts of the (ny, nx) grid (clamped
        values are always masked by zero coefficients) + self for extra
        slots.  Multilevel: per-level shifts + one tiny gather/scatter for
        the cross-level exception entries.  Generic: one gather via
        ck_neighbor.
        """
        tail = x.shape[1:]
        K = self.max_faces
        if self.structured:
            ny, nx = self.grid_shape
            xg = x.reshape((ny, nx) + tail)
            e, w, n, s = self._shift_slots(xg)
            slots = [e, w, n, s] + [xg] * (K - 4)
            out = jnp.stack(slots, axis=2)              # (ny, nx, K, ...)
            return out.reshape((ny * nx, K) + tail)
        if self.multilevel:
            if self.bd2_W is not None:
                # Two-window banded kernel: one pass covers same-level AND
                # cross-level neighbors (the gather+scatter exception
                # override measured ~6x the whole step cost at 80k cells).
                from ..ops.banded_gather import banded_gather2_nk
                return banded_gather2_nk(
                    x, self.bd2_lane, self.bd2_sel, self.bd2_bases,
                    self.bd2_W, m_out=self.num_cells)
            parts = []
            for (ny, nx), off in zip(self.ml_levels, self.ml_offsets):
                xg = x[off:off + ny * nx].reshape((ny, nx) + tail)
                e, w, n, s = self._shift_slots(xg)
                slots = [e, w, n, s] + [xg] * (K - 4)
                parts.append(jnp.stack(slots, axis=2).reshape(
                    (ny * nx, K) + tail))
            base = jnp.concatenate(parts, axis=0)
            # Cross-level/hanging entries: tiny gather then scatter-override.
            vals = x[self.ml_exc_src]
            return base.at[self.ml_exc_cell, self.ml_exc_slot].set(vals)
        if self.bd_W is not None:
            from ..ops.banded_gather import banded_gather_nk
            out = banded_gather_nk(x, self.bd_lane, self.bd_sel,
                                   self.bd_base, self.bd_W,
                                   wgs=self.bd_wgs)
            return self._widen_k(out, x)
        if self.bd2_W is not None:     # generic mesh with a multi-window map
            from ..ops.banded_gather import banded_gather2_nk
            out = banded_gather2_nk(x, self.bd2_lane, self.bd2_sel,
                                    self.bd2_bases, self.bd2_W,
                                    m_out=self.num_cells)
            return self._widen_k(out, x)
        return x[self.ck_neighbor]

    def _widen_k(self, out: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Rebuild the full-K gather from a slot-capped kernel output.

        Slot occupancy is a contiguous prefix and pad slots forward-fill
        the last real neighbor, so every column >= bd_k of the full map
        equals column bd_k - 1 except at the (rare) occupied overflow
        entries, which are patched exactly from the COO list."""
        if self.bd_k is None:
            return out
        reps = jnp.broadcast_to(
            out[:, self.bd_k - 1:self.bd_k],
            out.shape[:1] + (self.max_faces - self.bd_k,) + out.shape[2:])
        out = jnp.concatenate([out, reps], axis=1)
        vals = x[self.bd_of_src]
        return out.at[self.bd_of_rows, self.bd_of_slots].set(vals)

    @property
    def banded(self) -> bool:
        """True when a banded Pallas index map is available (the fused
        ``banded_dot`` path)."""
        return self.bd_W is not None or self.bd2_W is not None

    def banded_dot(self, xs, offs, prods):
        """Fused banded SpMV over the mesh neighbor map (ops/banded_gather
        .banded_dot): out_j = sum over (oi, ci) in prods[j] of
        sum_k offs[oi][:, k] * xs[ci][neighbor[:, k]].  The gathered
        neighbor values never materialize to HBM.

        Coefficients on unoccupied (pad) slots MUST be zero — the assembly
        invariant (pads scatter to 0) — because on a slot-capped map
        (bd_k) the kernel walks only the first bd_k slots and the COO
        correction covers only *occupied* overflow entries."""
        from ..ops.banded_gather import banded_dot
        if self.bd_W is not None:
            lane, sel, bases, W, wgs = (self.bd_lane, self.bd_sel,
                                        self.bd_base, self.bd_W, self.bd_wgs)
        else:
            lane, sel, bases, W, wgs = (self.bd2_lane, self.bd2_sel,
                                        self.bd2_bases, self.bd2_W, None)
        offs_k = (offs if self.bd_k is None
                  else tuple(o[:, :self.bd_k] for o in offs))
        out = banded_dot(xs, offs_k, lane, sel, bases, W, prods,
                         m_out=self.num_cells, wgs=wgs)
        if self.bd_k is None:
            return out

        def entry(o):
            # One coefficient per overflow entry, from either layout:
            # (N, K) flat or (NB, K, LANES) pre-blocked.
            if o.ndim == 3:
                return o[self.bd_of_rows // 128, self.bd_of_slots,
                         self.bd_of_rows % 128]
            return o[self.bd_of_rows, self.bd_of_slots]

        # Exact COO correction for the occupied slots >= bd_k.
        out = list(out)
        for j, pairs in enumerate(prods):
            corr = 0.0
            for (oi, ci) in pairs:
                corr = corr + entry(offs[oi]) * xs[ci][self.bd_of_src]
            out[j] = out[j].at[self.bd_of_rows].add(corr)
        return tuple(out)

    def banded_sweeps_fit(self, n_comps: int) -> bool:
        """True when the one-kernel multi-sweep Jacobi (banded_jacobi_sweeps)
        fits VMEM: the iterate ping-pong + rhs + inverse diagonal stay
        resident (3*C+1 row planes); lane/sel/off stream per phase."""
        nb = -(-self.num_cells // 128)
        resident = (3 * n_comps + 1) * nb * 128 * 4
        return resident <= 12 * 2**20

    def banded_jacobi_sweeps(self, rs, dinv, off, sweeps: int):
        """``sweeps`` Jacobi iterations z = dinv*(r - A_off z) from the seed
        dinv*r for each rhs in ``rs``, fused into one Pallas kernel (the
        launch-bound fix for <=200k-cell unstructured meshes).

        On a slot-capped map (bd_k) the smoother's A_off drops the COO
        overflow entries (occupied slots >= bd_k; 0.1-3% of cells on
        polygonal meshes): the sweeps run inside ONE kernel so a per-sweep
        correction is impossible, and the sweep is a preconditioner — the
        outer FGMRES is flexible, so any fixed approximation is legal."""
        from ..ops.banded_gather import banded_jacobi_sweeps
        if self.bd_W is not None:
            lane, sel, bases, W, wgs = (self.bd_lane, self.bd_sel,
                                        self.bd_base, self.bd_W, self.bd_wgs)
        else:
            lane, sel, bases, W, wgs = (self.bd2_lane, self.bd2_sel,
                                        self.bd2_bases, self.bd2_W, None)
        off_k = off if self.bd_k is None else off[:, :self.bd_k]
        return banded_jacobi_sweeps(tuple(rs), dinv, off_k, lane, sel, bases,
                                    W, sweeps, m_out=self.num_cells, wgs=wgs)

    def _per_level(self, v: jnp.ndarray, fn) -> jnp.ndarray:
        out = []
        for (ny, nx), off in zip(self.ml_levels, self.ml_offsets):
            vg = v[off:off + ny * nx].reshape(ny, nx)
            out.append(fn(vg).reshape(-1))
        return jnp.concatenate(out)

    def shift_from_west(self, v: jnp.ndarray) -> jnp.ndarray:
        """(N,) value of the west neighbor (edge-clamped)."""
        if self.multilevel:
            return self._per_level(
                v, lambda vg: jnp.concatenate([vg[:, :1], vg[:, :-1]], axis=1))
        ny, nx = self.grid_shape
        vg = v.reshape(ny, nx)
        return jnp.concatenate([vg[:, :1], vg[:, :-1]], axis=1).reshape(-1)

    def shift_from_south(self, v: jnp.ndarray) -> jnp.ndarray:
        if self.multilevel:
            return self._per_level(
                v, lambda vg: jnp.concatenate([vg[:1], vg[:-1]], axis=0))
        ny, nx = self.grid_shape
        vg = v.reshape(ny, nx)
        return jnp.concatenate([vg[:1], vg[:-1]], axis=0).reshape(-1)

    def slot_fluxes(self, fluxes: jnp.ndarray) -> jnp.ndarray:
        """Per-slot *outward* mass fluxes (N, K).

        Structured/multilevel modes store fluxes directly in slot layout;
        generic mode stores one value per face (owner-outward) and signs it
        per side.
        """
        if self.structured or self.multilevel or fluxes.ndim == 2:
            return fluxes                # already in slot layout
        return fluxes[self.ck_face] * self.ck_sign

    def to_host_order(self, x: jnp.ndarray) -> jnp.ndarray:
        """Device cell field -> host mesh cell order."""
        return x[self.grid_of_cell]

    def from_host_order(self, x: jnp.ndarray) -> jnp.ndarray:
        """Host mesh cell field -> device layout (solids get zeros)."""
        x = jnp.asarray(x)
        out = jnp.zeros((self.num_cells,) + x.shape[1:], x.dtype)
        return out.at[self.grid_of_cell].set(x)


# ----------------------------------------------------------------------


def _detect_uniform_grid(mesh: Mesh):
    """Return (h, nx, ny, ix, jy) if the mesh is a uniform cut-cell grid
    (all internal faces connect 4-adjacent grid squares), else None.

    Prefers the cut-cell generator's quadtree provenance (cell_gi/cell_gj)
    when the mesh is single-level: it survives boundary smoothing, which
    moves cut-cell centroids enough to break the position-based
    reconstruction (the app driver smooths every cut-cell mesh, and without
    this the smoothed flagship configuration fell off the stencil fast
    path)."""
    if mesh.num_cells == 0:
        return None
    h = float(np.median(mesh.face_area))
    if h <= 0:
        return None
    if mesh.cell_level is not None and \
            mesh.cell_level.max() == mesh.cell_level.min():
        ix = mesh.cell_gi.astype(np.int64)
        jy = mesh.cell_gj.astype(np.int64)
    else:
        ix = np.floor(mesh.cell_cx / h + 1e-9).astype(np.int64)
        jy = np.floor(mesh.cell_cy / h + 1e-9).astype(np.int64)
    if ix.min() < 0 or jy.min() < 0:
        return None
    nx = int(ix.max()) + 1
    ny = int(jy.max()) + 1
    if nx * ny > 4 * mesh.num_cells + 64:
        return None                      # too sparse: not a uniform grid
    key = jy * nx + ix
    if len(np.unique(key)) != mesh.num_cells:
        return None
    internal = mesh.face_neighbor >= 0
    do = mesh.face_owner[internal]
    dn = mesh.face_neighbor[internal]
    dx = ix[dn] - ix[do]
    dy = jy[dn] - jy[do]
    if not ((np.abs(dx) + np.abs(dy)) == 1).all():
        return None
    return h, nx, ny, ix, jy


def _multilevel_layout(mesh: Mesh):
    """Device layout for a locally-refined quadtree mesh: each refinement
    level is its own (ny, nx) uniform grid (holes masked), concatenated
    finest-first.  Returns (shapes, offsets, N_dev, dev_of_host) or None."""
    lev = mesh.cell_level
    if lev is None or lev.max() == lev.min():
        return None
    lev = lev - lev.min()           # finest present = 0
    gi = mesh.cell_gi
    gj = mesh.cell_gj
    nlev = int(lev.max()) + 1
    ext_x = int(((gi + 1) << lev).max())    # extent in finest units
    ext_y = int(((gj + 1) << lev).max())
    shapes = []
    offsets = []
    off = 0
    for li in range(nlev):
        nxl = (ext_x + (1 << li) - 1) >> li
        nyl = (ext_y + (1 << li) - 1) >> li
        shapes.append((nyl, nxl))
        offsets.append(off)
        off += nyl * nxl
    offs = np.asarray(offsets, np.int64)
    nxs = np.asarray([s[1] for s in shapes], np.int64)
    dev_of_host = offs[lev] + gj * nxs[lev] + gi
    if len(np.unique(dev_of_host)) != len(dev_of_host):
        return None                 # inconsistent metadata
    if off > 6 * mesh.num_cells:
        # The embedded layout allocates every level as a FULL grid; with
        # refinement localized to a small region the slot waste dominates
        # (0.002/0.008 channel-obstacle: 984k slots for 80k cells — the
        # generic RCM-banded path is ~10x faster there).  Keep the
        # embedding only while slots stay within ~6x the real cells
        # (0.01/0.04: 4.5x waste, multilevel 140k vs generic <100k c-u/s).
        return None
    return tuple(shapes), offsets, off, dev_of_host


def _band_order_cost(rank, owner_i, neigh_i, N_host):
    """Best achievable banded-map walk cost (vreg-gather units, see
    ops/banded_gather.window_cost) for a candidate cell ordering, computed
    on a sorted-slot proxy ELL of the internal adjacency.  The real encode
    adds boundary/self slots, but those sit on the diagonal and never
    widen a block's source window, so the proxy ranks orderings
    faithfully.  Returns None when no banded map builds."""
    from ..ops.banded_gather import (build_banded_map, build_banded_map2,
                                     build_banded_map_grouped, grouped_cost,
                                     window_cost)
    N_dev = ((N_host + 127) // 128) * 128
    ii = np.concatenate([rank[owner_i], rank[neigh_i]])
    jj = np.concatenate([rank[neigh_i], rank[owner_i]])
    order = np.lexsort((jj, ii))
    ii, jj = ii[order], jj[order]
    counts = np.bincount(ii, minlength=N_dev)
    K = int(counts.max())
    if K == 0:
        return None
    start = np.zeros(N_dev + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    slot = np.arange(len(ii)) - start[ii]
    ck = np.tile(np.arange(N_dev, dtype=np.int64)[:, None], (1, K))
    ck[ii, slot] = jj
    occ = np.zeros((N_dev, K), bool)
    occ[ii, slot] = True
    ffi = np.maximum.accumulate(
        np.where(occ, np.arange(K)[None, :], 0), axis=1)
    ck = np.take_along_axis(ck, ffi, axis=1)

    costs = []
    bl = build_banded_map(ck, N_dev)
    if bl is not None:
        costs.append(window_cost(bl[3], K))
    for nw in (2, 3, 4):
        bl2 = build_banded_map2(ck, N_dev, n_windows=nw)
        if bl2 is not None:
            costs.append(window_cost(bl2[3], K, nw))
    blg = build_banded_map_grouped(ck, N_dev)
    if blg is not None:
        costs.append(grouped_cost(blg[3]))
    return min(costs) if costs else None


def _generic_rank(mesh: Mesh, owner, neigh, internal, N_host):
    """Cell ordering for the generic (unstructured) layout.

    Candidates — RCM plus geometric column sweeps — are scored by the best
    banded-map walk cost they admit on the real adjacency; cheapest wins.
    RCM minimizes graph bandwidth, but on polygonal (voronoi) meshes its
    single band runs 2-3x the geometric cross-section, while a column
    sweep bucketed at ~1-2 mean spacings concentrates each block's sources
    into a few narrow windows (tools/probe_ordering.py at 294k voronoi:
    RCM single-window W=17/K=9 = 34 vregs vs colsweep multi-window 18).
    Triangle (delaunay) meshes keep RCM (its single W=9 band beats every
    sweep tried)."""
    owner_i = owner[internal]
    neigh_i = neigh[internal]
    candidates = []
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        adj = sp.csr_matrix(
            (np.ones(2 * len(owner_i)),
             (np.concatenate([owner_i, neigh_i]),
              np.concatenate([neigh_i, owner_i]))),
            shape=(N_host, N_host))
        perm = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True),
                          dtype=np.int64)
        rank = np.empty(N_host, dtype=np.int64)
        rank[perm] = np.arange(N_host)
        candidates.append(("rcm", rank))
    except Exception:
        pass

    cx, cy = mesh.cell_cx, mesh.cell_cy
    ex = float(cx.max() - cx.min()) if N_host else 0.0
    ey = float(cy.max() - cy.min()) if N_host else 0.0
    if N_host and max(ex, ey) > 0:
        spacing = np.sqrt(max(ex * ey, 1e-300) / N_host)
        along, across = (cx, cy) if ex >= ey else (cy, cx)
        for mult in (1.0, 2.0):
            bx = np.floor((along - along.min())
                          / max(mult * spacing, 1e-300)).astype(np.int64)
            order = np.lexsort((across, bx))
            rank = np.empty(N_host, dtype=np.int64)
            rank[order] = np.arange(N_host)
            candidates.append((f"colsweep-x{mult:g}", rank))

        # Level-aware sweep for locally-refined quadtree meshes (VERDICT r3
        # #7): segregate refinement levels, column-sweep each level at ITS
        # OWN spacing (sqrt of the per-cell volume).  Same-level neighbors
        # then sit in a narrow per-level band and cross-level neighbors in
        # one other compact region — exactly the shape the multi-window
        # banded maps (build_banded_map2) capture, instead of one global
        # band as wide as the worst cross-section mix.
        lev = mesh.cell_level
        if lev is not None and int(lev.max()) != int(lev.min()):
            own = np.sqrt(np.maximum(np.asarray(mesh.cell_vol), 1e-300))
            for mult in (1.0, 2.0):
                bx = np.floor((along - along.min())
                              / np.maximum(mult * own, 1e-300)).astype(np.int64)
                order = np.lexsort((across, bx, lev))
                rank = np.empty(N_host, dtype=np.int64)
                rank[order] = np.arange(N_host)
                candidates.append((f"lev-colsweep-x{mult:g}", rank))

    if not candidates:
        return np.arange(N_host, dtype=np.int64)
    if len(candidates) == 1 or len(owner_i) == 0:
        return candidates[0][1]
    best = None
    for name, rank in candidates:
        c = _band_order_cost(rank, owner_i, neigh_i, N_host)
        if c is not None and (best is None or c < best[0]):
            best = (c, name, rank)
    return best[2] if best is not None else candidates[0][1]


def encode_mesh(mesh: Mesh, dtype=jnp.float32, structured: str = "auto",
                pad_rows_to: int = 1, pad_cols_to: int = 1) -> DeviceMesh:
    """Encode a host mesh (one-time upload).

    ``structured``: "auto" picks the stencil fast path when the mesh is a
    uniform cut-cell grid (or the multilevel fast path when the mesh carries
    quadtree provenance); "never" forces the generic gather path.
    ``pad_rows_to``: round ny up to a multiple (extra rows are masked solid
    cells) so the grid can be row-sharded over that many devices.
    ``pad_cols_to``: round nx up to a multiple (e.g. 128 to lane-align every
    grid row; extra columns are masked solid cells).
    """
    N_host = mesh.num_cells
    F = mesh.num_faces

    owner = mesh.face_owner.astype(np.int64)
    neigh = mesh.face_neighbor.astype(np.int64)
    internal = neigh >= 0
    neigh_safe = np.where(internal, neigh, owner)

    # Canonicalize normals out of the owner cell.
    dxn = mesh.face_cx - mesh.cell_cx[owner]
    dyn = mesh.face_cy - mesh.cell_cy[owner]
    flip = dxn * mesh.face_nx + dyn * mesh.face_ny < 0.0
    f_nx = np.where(flip, -mesh.face_nx, mesh.face_nx)
    f_ny = np.where(flip, -mesh.face_ny, mesh.face_ny)

    grid = _detect_uniform_grid(mesh) if structured == "auto" else None
    ml = None
    if grid is None and structured == "auto":
        ml = _multilevel_layout(mesh)

    # ------------------------------------------------------------------
    # Device cell layout.
    if grid is not None:
        h, nx, ny, ixs, jys = grid
        if pad_rows_to > 1:
            ny = ((ny + pad_rows_to - 1) // pad_rows_to) * pad_rows_to
        if pad_cols_to > 1:
            nx = ((nx + pad_cols_to - 1) // pad_cols_to) * pad_cols_to
        N_dev = nx * ny
        dev_of_host = (jys * nx + ixs).astype(np.int64)
        grid_shape = (ny, nx)
        ml_levels = None
    elif ml is not None:
        ml_levels, ml_offsets, N_dev, dev_of_host = ml
        grid_shape = None
    else:
        # Generic (unstructured) layout: order cells so neighbors fall in
        # narrow index bands, and pad the count to a multiple of 128 lanes —
        # both for the banded Pallas gather (ops/banded_gather.py).  The
        # ordering (RCM vs geometric column sweep) is chosen per mesh by
        # the banded walk cost it admits (_generic_rank).  Padded cells are
        # masked identity rows like structured solids.
        rank = _generic_rank(mesh, owner, neigh, internal, N_host)
        N_dev = ((N_host + 127) // 128) * 128
        dev_of_host = rank
        grid_shape = None
        ml_levels = None

    host_of_dev = np.full(N_dev, -1, dtype=np.int64)
    host_of_dev[dev_of_host] = np.arange(N_host)
    c_valid = (host_of_dev >= 0).astype(np.float64)
    hsafe = np.maximum(host_of_dev, 0)

    c_cx = np.where(c_valid > 0, mesh.cell_cx[hsafe], 0.0)
    c_cy = np.where(c_valid > 0, mesh.cell_cy[hsafe], 0.0)
    c_vol = np.where(c_valid > 0, mesh.cell_vol[hsafe], 1.0)
    if grid is not None:
        # Masked solid cells get their grid-square center (placeholder only).
        gi = np.arange(N_dev) % nx
        gj = np.arange(N_dev) // nx
        c_cx = np.where(c_valid > 0, c_cx, (gi + 0.5) * h)
        c_cy = np.where(c_valid > 0, c_cy, (gj + 0.5) * h)

    # ------------------------------------------------------------------
    # Entry list: one (face, side) pair per slot occupancy.
    # side 0 = owner, side 1 = neighbor.
    faces_idx = np.arange(F)
    e_face = np.concatenate([faces_idx, faces_idx[internal]])
    e_sign = np.concatenate([np.ones(F), -np.ones(int(internal.sum()))])
    e_host = np.concatenate([owner, neigh[internal]])
    e_dev = dev_of_host[e_host]

    # Slot assignment.
    if grid is not None:
        this_ix = ixs[e_host]
        this_jy = jys[e_host]
        oth_host = np.where(e_sign > 0, neigh_safe[e_face], owner[e_face])
        e_internal = internal[e_face]
        # Internal: slot by grid offset; boundary: slot by outward normal.
        dix = np.where(e_internal, ixs[oth_host] - this_ix, 0)
        djy = np.where(e_internal, jys[oth_host] - this_jy, 0)
        onx = f_nx[e_face] * e_sign
        ony = f_ny[e_face] * e_sign
        dir_slot = np.where(
            e_internal,
            np.select([dix == 1, dix == -1, djy == 1, djy == -1],
                      [SLOT_E, SLOT_W, SLOT_N, SLOT_S], default=-1),
            np.select([onx > 0.999, onx < -0.999, ony > 0.999, ony < -0.999],
                      [SLOT_E, SLOT_W, SLOT_N, SLOT_S], default=-1))
        # Resolve conflicts / unassigned into extra slots (vectorized).
        n_e = len(e_face)
        e_slot = np.full(n_e, -1, dtype=np.int64)
        has_dir = dir_slot >= 0
        e_bnd = ~e_internal
        keyd = e_dev * 4 + np.where(has_dir, dir_slot, 0)
        # Within each (cell, direction), prefer the internal face.
        ordk = np.lexsort((e_bnd, keyd))
        sk = keyd[ordk]
        first = np.ones(n_e, dtype=bool)
        first[1:] = sk[1:] != sk[:-1]
        keep = np.zeros(n_e, dtype=bool)
        keep[ordk] = first
        keep &= has_dir
        if (e_internal & has_dir & ~keep).any() or (e_internal & ~has_dir).any():
            # Two internal faces share a direction slot / unassigned internal
            # face: not a uniform grid.  Fall back to the generic path,
            # forwarding the caller's sharding-padding request (harmless
            # there, but shard_state will reject non-structured meshes with a
            # clear error instead of a stale-padding one).
            return encode_mesh(mesh, dtype=dtype, structured="never",
                               pad_rows_to=pad_rows_to, pad_cols_to=pad_cols_to)
        e_slot[keep] = dir_slot[keep]
        # Extras: rank within cell.
        idxe = np.nonzero(~keep)[0]
        K_extra = 0
        if len(idxe):
            orde = np.argsort(e_dev[idxe], kind="stable")
            sc = e_dev[idxe][orde]
            change = np.ones(len(idxe), dtype=bool)
            change[1:] = sc[1:] != sc[:-1]
            grp_start = np.maximum.accumulate(
                np.where(change, np.arange(len(idxe)), 0))
            rank = np.arange(len(idxe)) - grp_start
            e_slot[idxe[orde]] = 4 + rank
            K_extra = int(rank.max()) + 1
        K = 4 + K_extra
    elif ml is not None:
        # Multilevel slot assignment.  Direction slots (E/W/N/S) are claimed
        # preferentially by same-level grid-adjacent internal faces (these
        # resolve by per-level shifts); everything else that has an
        # axis-aligned direction competes next; remaining/conflicting entries
        # overflow into extra slots.  Internal entries that did not win a
        # shift-resolvable assignment become gather/scatter exceptions.
        lev_h = (mesh.cell_level - mesh.cell_level.min()).astype(np.int64)
        gi_h = mesh.cell_gi.astype(np.int64)
        gj_h = mesh.cell_gj.astype(np.int64)

        oth_host = np.where(e_sign > 0, neigh_safe[e_face], owner[e_face])
        e_internal = internal[e_face]
        same_lev = e_internal & (lev_h[oth_host] == lev_h[e_host])
        dix = np.where(same_lev, gi_h[oth_host] - gi_h[e_host], 0)
        djy = np.where(same_lev, gj_h[oth_host] - gj_h[e_host], 0)
        same_adj = same_lev & (np.abs(dix) + np.abs(djy) == 1)
        onx = f_nx[e_face] * e_sign
        ony = f_ny[e_face] * e_sign
        dir_slot = np.where(
            same_adj,
            np.select([dix == 1, dix == -1, djy == 1, djy == -1],
                      [SLOT_E, SLOT_W, SLOT_N, SLOT_S], default=-1),
            np.select([onx > 0.999, onx < -0.999, ony > 0.999, ony < -0.999],
                      [SLOT_E, SLOT_W, SLOT_N, SLOT_S], default=-1))
        n_e = len(e_face)
        e_slot = np.full(n_e, -1, dtype=np.int64)
        has_dir = dir_slot >= 0
        keyd = e_dev * 4 + np.where(has_dir, dir_slot, 0)
        # Priority within each (cell, direction): shift-resolvable first,
        # then other internal, then boundary.
        prio = np.where(same_adj, 0, np.where(e_internal, 1, 2))
        ordk = np.lexsort((prio, keyd))
        sk = keyd[ordk]
        first = np.ones(n_e, dtype=bool)
        first[1:] = sk[1:] != sk[:-1]
        keep = np.zeros(n_e, dtype=bool)
        keep[ordk] = first
        keep &= has_dir
        e_slot[keep] = dir_slot[keep]
        idxe = np.nonzero(~keep)[0]
        K_extra = 0
        if len(idxe):
            orde = np.argsort(e_dev[idxe], kind="stable")
            sc = e_dev[idxe][orde]
            change = np.ones(len(idxe), dtype=bool)
            change[1:] = sc[1:] != sc[:-1]
            grp_start = np.maximum.accumulate(
                np.where(change, np.arange(len(idxe)), 0))
            rank = np.arange(len(idxe)) - grp_start
            e_slot[idxe[orde]] = 4 + rank
            K_extra = int(rank.max()) + 1
        K = 4 + K_extra
        # Shift-resolvable = same-level adjacent AND won its direction slot.
        ml_shiftable = same_adj & keep
    else:
        # Generic: slots in the host CSR order.
        counts = np.diff(mesh.cell_face_offsets)
        K = int(counts.max())
        csr_cells = np.repeat(np.arange(N_host), counts)
        within = np.arange(len(mesh.cell_faces)) - np.repeat(
            mesh.cell_face_offsets[:-1], counts)
        csr_faces = mesh.cell_faces
        csr_sign = np.where(owner[csr_faces] == csr_cells, 1.0, -1.0)
        e_face = csr_faces
        e_sign = csr_sign
        e_host = csr_cells
        e_dev = dev_of_host[csr_cells]
        e_slot = within

    # ------------------------------------------------------------------
    # Per-entry geometry (float64), scattered into (N_dev, K).
    fc_x = mesh.face_cx[e_face]
    fc_y = mesh.face_cy[e_face]
    this_cx = mesh.cell_cx[e_host]
    this_cy = mesh.cell_cy[e_host]
    oth_host = np.where(e_sign > 0, neigh_safe[e_face], owner[e_face])
    e_is_b = ~internal[e_face]
    oc_x = np.where(e_is_b, fc_x, mesh.cell_cx[oth_host])
    oc_y = np.where(e_is_b, fc_y, mesh.cell_cy[oth_host])

    nrm_x = f_nx[e_face] * e_sign
    nrm_y = f_ny[e_face] * e_sign
    area = mesh.face_area[e_face]

    d_this = np.hypot(this_cx - fc_x, this_cy - fc_y)
    d_other = np.hypot(oc_x - fc_x, oc_y - fc_y)
    tot = d_this + d_other
    lam = np.where(tot > 1e-6, d_other / np.maximum(tot, 1e-300), 0.5)
    # The partner's own lam: its d_other is our d_this and its tot is the
    # same f64 sum, so this expression is bitwise equal to the lam the other
    # side's entry stores (see ck_lam_other in DeviceMesh).
    lam_other = np.where(tot > 1e-6, d_this / np.maximum(tot, 1e-300), 0.5)

    dvx = oc_x - this_cx
    dvy = oc_y - this_cy
    dist_proj = np.maximum(np.abs(dvx * nrm_x + dvy * nrm_y), 1e-6)
    dist = np.maximum(np.hypot(dvx, dvy), 1e-12)
    bdry = np.where(e_is_b, mesh.face_boundary[e_face], 0)
    ngh_dev = np.where(e_is_b, e_dev, dev_of_host[oth_host])

    if grid_shape is None and ml is None:
        # Generic path: slot order is arbitrary (host CSR order), so sort
        # each cell's slots by neighbor device id.  Slot k then holds the
        # k-th order statistic of the cell's RCM-sorted neighbors, whose
        # per-block source span is far narrower than the whole band — the
        # banded kernel walks per-slot-group windows instead of NW*W full
        # candidate rows (build_banded_map_grouped; voronoi at 294k:
        # 9 slots x 9 window rows vs ~a few rows per sorted slot pair).
        ords = np.lexsort((ngh_dev, e_dev))
        sd = e_dev[ords]
        change = np.ones(len(ords), dtype=bool)
        change[1:] = sd[1:] != sd[:-1]
        grp_start = np.maximum.accumulate(
            np.where(change, np.arange(len(ords)), 0))
        e_slot[ords] = np.arange(len(ords)) - grp_start

    # ------------------------------------------------------------------
    # Multilevel: exception entries + flux mirror mask.
    ml_exc_cell = ml_exc_slot = ml_exc_src = ck_mirror_arr = None
    ml_pair = None
    if ml is not None:
        exc = internal[e_face] & ~ml_shiftable
        ml_exc_cell = e_dev[exc]
        ml_exc_slot = e_slot[exc]
        ml_exc_src = ngh_dev[exc]
        # Mirror mask: internal faces whose two entries both won their E/W
        # (or N/S) direction slots — the W/S side mirrors the partner's
        # E/N-slot flux by shift, keeping exact per-face antisymmetry.
        n_int = int(internal.sum())
        ngh_entry = np.full(F, -1, dtype=np.int64)
        ngh_entry[faces_idx[internal]] = F + np.arange(n_int)
        fint = np.nonzero(internal)[0]
        a = fint                        # owner-side entry index == face id
        b = ngh_entry[fint]
        sa = e_slot[a]
        sb = e_slot[b]
        both = ml_shiftable[a] & ml_shiftable[b]
        ew = both & (((sa == SLOT_E) & (sb == SLOT_W))
                     | ((sa == SLOT_W) & (sb == SLOT_E)))
        ns = both & (((sa == SLOT_N) & (sb == SLOT_S))
                     | ((sa == SLOT_S) & (sb == SLOT_N)))
        w_ent = np.where(sa == SLOT_W, a, b)[ew]
        s_ent = np.where(sa == SLOT_S, a, b)[ns]
        ck_mirror_arr = np.zeros((N_dev, K))
        ck_mirror_arr[e_dev[w_ent], SLOT_W] = 1.0
        ck_mirror_arr[e_dev[s_ent], SLOT_S] = 1.0
        # Entry pairs not covered by the mirror shift: side a's flux is
        # scattered negated to side b (exact antisymmetry on hanging faces).
        unm = ~(ew | ns)
        pa, pb = a[unm], b[unm]
        ml_pair = (e_dev[pa], e_slot[pa], e_dev[pb], e_slot[pb])

    def scat(vals, fill=0.0, idtype=np.float64):
        out = np.full((N_dev, K), fill, dtype=idtype)
        out[e_dev, e_slot] = vals
        return out

    self_col = np.tile(np.arange(N_dev, dtype=np.int64)[:, None], (1, K))
    ck_neighbor = self_col.copy()
    ck_neighbor[e_dev, e_slot] = ngh_dev

    if grid_shape is None and ml is None:
        # Padded trailing slots repeat the cell's last real neighbor (a
        # self index sits mid-band and would stretch the sorted slots'
        # windows); sorted ranks are contiguous from slot 0, so occupancy
        # is a prefix and fully masked padding cells keep self.
        occ = np.zeros((N_dev, K), dtype=bool)
        occ[e_dev, e_slot] = True
        ffi = np.maximum.accumulate(
            np.where(occ, np.arange(K)[None, :], 0), axis=1)
        ck_neighbor = np.take_along_axis(ck_neighbor, ffi, axis=1)

    # Banded gather metadata (generic banded layout only).
    bd_lane = bd_sel = bd_base = None
    bd_W = None
    bd_wgs = None
    bd2 = (None,) * 3
    bd2_W = None
    bd_kcap = None
    bd_of = None
    if grid_shape is None and ml is None and N_dev % 128 == 0:
        from ..ops.banded_gather import (build_banded_map, build_banded_map2,
                                         build_banded_map_grouped,
                                         grouped_cost, window_cost)
        # Slot cap: a (K, LANES) walk tile costs ceil(K/8) vregs per step
        # (window_cost doc), so K=9 maps pay 2x K=8 maps.  When the slots
        # beyond 8 are sparsely occupied (polygonal meshes: deg>=9 cells
        # are ~0.1%), build the kernel map on the first 8 sorted slots and
        # carry the occupied remainder as a COO overflow list — exact
        # corrections in gather()/banded_dot(), dropped by the sweep
        # smoother (see the DeviceMesh methods).
        ck_map = ck_neighbor
        if K > 8:
            ovr, ovs = np.nonzero(occ[:, 8:])
            if len(ovr) <= 0.05 * N_dev:
                ovs = ovs + 8
                bd_of = (ovr.astype(np.int64), ovs,
                         ck_neighbor[ovr, ovs])
                ck_map = ck_neighbor[:, :8]
                bd_kcap = 8
        Km = ck_map.shape[1]
        # Kernel cost per gather in vreg-gather units (window_cost doc):
        # a window map walks NW * W rows gathering all K slots each step
        # on ceil(K/8)-vreg tiles; the sorted-slot grouped map walks each
        # slot group's own narrow window but small groups still burn whole
        # vregs.  Pick the cheapest map that builds.
        bl = build_banded_map(ck_map, N_dev)
        cost1 = window_cost(bl[3], Km) if bl is not None else None
        best2 = None
        for nw in (2, 3, 4):
            bl2 = build_banded_map2(ck_map, N_dev, n_windows=nw)
            if bl2 is not None and (best2 is None
                                    or nw * bl2[3] < best2[0] * best2[1][3]):
                best2 = (nw, bl2)
        cost2 = (window_cost(best2[1][3], Km, best2[0])
                 if best2 is not None else None)
        blg = build_banded_map_grouped(ck_map, N_dev)
        costg = grouped_cost(blg[3]) if blg is not None else None
        costs = [c for c in (cost1, cost2, costg) if c is not None]
        cmin = min(costs) if costs else None
        if costg is not None and costg == cmin:
            lane_a, sel_a, bases_a, bd_wgs = blg
            bd_W = max(bd_wgs[0])
            bd_lane = jnp.asarray(lane_a, jnp.int32)
            bd_sel = jnp.asarray(sel_a, jnp.int32)
            bd_base = jnp.asarray(bases_a, jnp.int32)
        elif cost2 is not None and cost2 == cmin:
            lane_a, sel_a, bases_a, bd2_W = best2[1]
            bd2 = (jnp.asarray(lane_a, jnp.int32),
                   jnp.asarray(sel_a, jnp.int32),
                   jnp.asarray(bases_a, jnp.int32))
        elif bl is not None:
            lane_a, sel_a, base_a, bd_W = bl
            bd_lane = jnp.asarray(lane_a, jnp.int32)
            bd_sel = jnp.asarray(sel_a, jnp.int32)
            bd_base = jnp.asarray(base_a, jnp.int32)
        if cmin is None:
            # No banded map built: gather falls back to the full-K
            # ck_neighbor XLA gather, so the slot cap must not apply.
            bd_kcap = None
            bd_of = None
    elif ml is not None:
        from ..ops.banded_gather import build_banded_map2
        # Kernel cost per gather is ~ NW * W candidate rows; search a small
        # ladder and keep the cheapest map that builds (deeply refined
        # meshes need more windows than the 3-window default — at
        # 0.002/0.008 the 3-window map does not exist under w_max=16 and
        # the mesh silently fell back to the ~100x-slow XLA gather path).
        best = None
        for nw in (2, 3, 4, 5, 6):
            bl2 = build_banded_map2(ck_neighbor, N_dev, n_windows=nw)
            if bl2 is not None and (best is None
                                    or nw * bl2[3] < best[0] * best[1][3]):
                best = (nw, bl2)
        if best is not None:
            lane_a, sel_a, bases_a, bd2_W = best[1]
            bd2 = (jnp.asarray(lane_a, jnp.int32),
                   jnp.asarray(sel_a, jnp.int32),
                   jnp.asarray(bases_a, jnp.int32))

    mask = np.zeros((N_dev, K))
    mask[e_dev, e_slot] = 1.0

    # Face-level arrays with device ids.
    d_own_f = np.hypot(mesh.cell_cx[owner] - mesh.face_cx,
                       mesh.cell_cy[owner] - mesh.face_cy)
    d_ngh_f = np.hypot(mesh.cell_cx[neigh_safe] - mesh.face_cx,
                       mesh.cell_cy[neigh_safe] - mesh.face_cy)
    tot_f = d_own_f + d_ngh_f
    lam_f = np.where(tot_f > 1e-6, d_ngh_f / np.maximum(tot_f, 1e-300), 0.5)
    ccx = mesh.cell_cx[neigh_safe] - mesh.cell_cx[owner]
    ccy = mesh.cell_cy[neigh_safe] - mesh.cell_cy[owner]
    dist_cc = np.maximum(np.abs(ccx * f_nx + ccy * f_ny), 1e-6)

    as_f = partial(jnp.asarray, dtype=dtype)
    as_i = partial(jnp.asarray, dtype=jnp.int32)

    dm = DeviceMesh(
        num_cells=N_dev, num_faces=F, max_faces=K, num_host_cells=N_host,
        grid_shape=grid_shape, ml_levels=ml_levels, bd_W=bd_W, bd2_W=bd2_W,
        bd_wgs=bd_wgs, bd_k=bd_kcap,
        bd_lane=bd_lane, bd_sel=bd_sel, bd_base=bd_base,
        bd2_lane=bd2[0], bd2_sel=bd2[1], bd2_bases=bd2[2],
        bd_of_rows=None if bd_of is None else as_i(bd_of[0]),
        bd_of_slots=None if bd_of is None else as_i(bd_of[1]),
        bd_of_src=None if bd_of is None else as_i(bd_of[2]),
        ml_exc_cell=None if ml_exc_cell is None else as_i(ml_exc_cell),
        ml_exc_slot=None if ml_exc_slot is None else as_i(ml_exc_slot),
        ml_exc_src=None if ml_exc_src is None else as_i(ml_exc_src),
        ck_mirror=None if ck_mirror_arr is None else as_f(ck_mirror_arr),
        ml_pair_cell_a=None if ml_pair is None else as_i(ml_pair[0]),
        ml_pair_slot_a=None if ml_pair is None else as_i(ml_pair[1]),
        ml_pair_cell_b=None if ml_pair is None else as_i(ml_pair[2]),
        ml_pair_slot_b=None if ml_pair is None else as_i(ml_pair[3]),
        f_owner=as_i(dev_of_host[owner]),
        f_neighbor=as_i(np.where(internal, dev_of_host[neigh_safe], -1)),
        f_neighbor_safe=as_i(dev_of_host[neigh_safe]),
        f_internal=jnp.asarray(internal),
        f_boundary=as_i(mesh.face_boundary),
        f_area=as_f(mesh.face_area), f_nx=as_f(f_nx), f_ny=as_f(f_ny),
        f_cx=as_f(mesh.face_cx), f_cy=as_f(mesh.face_cy),
        f_lambda=as_f(lam_f), f_dist_cc=as_f(dist_cc),
        c_cx=as_f(c_cx), c_cy=as_f(c_cy), c_vol=as_f(c_vol),
        c_valid=as_f(c_valid), grid_of_cell=as_i(dev_of_host),
        ck_face=jnp.asarray(scat(e_face, 0, np.int64).astype(np.int32)),
        ck_mask=as_f(mask),
        ck_sign=as_f(scat(e_sign)),
        ck_neighbor=as_i(ck_neighbor),
        ck_is_boundary=as_f(scat(e_is_b.astype(np.float64))),
        ck_boundary=jnp.asarray(scat(bdry, 0, np.int64).astype(np.int32)),
        ck_nx=as_f(scat(nrm_x)), ck_ny=as_f(scat(nrm_y)),
        ck_area=as_f(scat(area)),
        ck_lam=as_f(scat(lam, 0.5)),
        ck_lam_other=as_f(scat(lam_other, 0.5)),
        ck_dist_proj=as_f(scat(dist_proj, 1.0)),
        ck_dist=as_f(scat(dist, 1.0)),
        ck_rx=as_f(scat(fc_x - this_cx)), ck_ry=as_f(scat(fc_y - this_cy)),
        ck_dcdx=as_f(scat(dvx)), ck_dcdy=as_f(scat(dvy)),
    )
    # Host copies for setup-time consumers (AMG hierarchy build): reading
    # these back from the device costs ~100 MB of tunnel readback (measured
    # 140 s of "amg hierarchy build" at 1M), and eager device math on them
    # compiles tiny executables remotely.  A non-pytree attribute: invisible
    # to jit/flatten; ops/amg falls back to device readback when absent
    # (e.g. a DeviceMesh reconstructed inside a transform).
    object.__setattr__(dm, "amg_host", {
        "ck_mask": np.asarray(mask, np.float32),
        "ck_is_boundary": np.asarray(scat(e_is_b.astype(np.float64)),
                                     np.float32),
        "c_valid": np.asarray(c_valid, np.float32),
        "ck_neighbor": np.asarray(ck_neighbor, np.int32),
        "ck_boundary": np.asarray(scat(bdry, 0, np.int64), np.int32),
    })
    return dm
