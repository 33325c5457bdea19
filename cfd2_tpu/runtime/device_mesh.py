"""Device mesh encoding: host ``Mesh`` -> padded JAX arrays.

The TPU-native replacement for the reference's GPU mesh upload + CSR build
(reference: src/solver/gpu/init/mesh.rs:24-285).  Two complementary layouts:

* **face-major** arrays (size F) drive the flux kernel — one lane per face,
  gathers owner/neighbor cell values;
* **cell-major padded** arrays (N, K) drive assembly and all matrix products —
  each cell gathers its K face slots and reduces, so faces->cells accumulation
  is a *gather + sum over a static axis* instead of a scatter.  This is the
  key TPU design decision (SURVEY.md §7 "hard parts"): scatters serialize on
  TPU, padded gathers vectorize.

The linear system lives in **block-ELL** layout keyed by the same (N, K)
structure: a (N, K, 3, 3) off-diagonal block tensor plus a (N, 3, 3) diagonal
block tensor (reference equivalent: the interleaved 3Nx3N block CSR built in
init/linear_solver/mod.rs:180-216).  SpMV becomes batched einsums on the MXU.

All geometric factors (distance weights, projected distances, per-slot
outward normals) are precomputed here in float64 and stored as float32 device
arrays; the solver kernels are pure elementwise/gather code over them.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.structs import Mesh


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceMesh:
    """Frozen pytree of device arrays describing one mesh."""

    # --- sizes (static, not traced) ---
    num_cells: int
    num_faces: int
    max_faces: int

    # --- face-major (F,) ---
    f_owner: jnp.ndarray          # int32
    f_neighbor: jnp.ndarray       # int32, -1 = boundary
    f_neighbor_safe: jnp.ndarray  # int32, boundary -> owner (safe gather)
    f_internal: jnp.ndarray       # bool
    f_boundary: jnp.ndarray       # int32 code (0/1/2/3)
    f_area: jnp.ndarray           # f32
    f_nx: jnp.ndarray             # f32, canonical: points OUT of owner
    f_ny: jnp.ndarray
    f_cx: jnp.ndarray
    f_cy: jnp.ndarray
    f_lambda: jnp.ndarray         # owner-side dist weight d_n/(d_o+d_n)
    f_dist_cc: jnp.ndarray        # max(|(c_n - c_o) . n|, 1e-6)

    # --- cell-major (N,) ---
    c_cx: jnp.ndarray
    c_cy: jnp.ndarray
    c_vol: jnp.ndarray

    # --- cell-major padded (N, K) ---
    ck_face: jnp.ndarray          # int32 face index (pad: 0)
    ck_mask: jnp.ndarray          # f32 1.0 valid / 0.0 pad
    ck_sign: jnp.ndarray          # f32 +1 owner / -1 neighbor (pad: 0)
    ck_neighbor: jnp.ndarray      # int32 adjacent cell (pad/boundary: self)
    ck_is_boundary: jnp.ndarray   # f32 1.0 if boundary face
    ck_boundary: jnp.ndarray      # int32 boundary code
    ck_nx: jnp.ndarray            # f32 outward normal from THIS cell
    ck_ny: jnp.ndarray
    ck_area: jnp.ndarray
    ck_lam: jnp.ndarray           # own-side weight: d_other/(d_own+d_other)
    ck_dist_proj: jnp.ndarray     # max(|d . n|, 1e-6), d = other - this center
    ck_dist: jnp.ndarray          # plain |other - this center|
    ck_rx: jnp.ndarray            # f_center - this center (SOU reconstruction)
    ck_ry: jnp.ndarray
    ck_dcdx: jnp.ndarray          # other_center - this center (QUICK)
    ck_dcdy: jnp.ndarray

    _dyn_fields = (
        "f_owner", "f_neighbor", "f_neighbor_safe", "f_internal", "f_boundary",
        "f_area", "f_nx", "f_ny", "f_cx", "f_cy", "f_lambda", "f_dist_cc",
        "c_cx", "c_cy", "c_vol",
        "ck_face", "ck_mask", "ck_sign", "ck_neighbor", "ck_is_boundary",
        "ck_boundary", "ck_nx", "ck_ny", "ck_area", "ck_lam", "ck_dist_proj",
        "ck_dist", "ck_rx", "ck_ry", "ck_dcdx", "ck_dcdy",
    )

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._dyn_fields)
        aux = (self.num_cells, self.num_faces, self.max_faces)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)


def encode_mesh(mesh: Mesh, dtype=jnp.float32) -> DeviceMesh:
    """Encode a host mesh into the padded device layout (one-time upload)."""
    N = mesh.num_cells
    F = mesh.num_faces

    owner = mesh.face_owner.astype(np.int64)
    neigh = mesh.face_neighbor.astype(np.int64)
    internal = neigh >= 0
    neigh_safe = np.where(internal, neigh, owner)

    # Canonicalize normals to point out of the owner cell.  Polygon winding is
    # CCW so first-writer normals already satisfy this; assert + fix anyway.
    dx = mesh.face_cx - mesh.cell_cx[owner]
    dy = mesh.face_cy - mesh.cell_cy[owner]
    flip = dx * mesh.face_nx + dy * mesh.face_ny < 0.0
    f_nx = np.where(flip, -mesh.face_nx, mesh.face_nx)
    f_ny = np.where(flip, -mesh.face_ny, mesh.face_ny)

    # Face-level distance weights (prepare_coupled.wgsl:147-155).
    d_own = np.hypot(mesh.cell_cx[owner] - mesh.face_cx,
                     mesh.cell_cy[owner] - mesh.face_cy)
    d_ngh = np.hypot(mesh.cell_cx[neigh_safe] - mesh.face_cx,
                     mesh.cell_cy[neigh_safe] - mesh.face_cy)
    total = d_own + d_ngh
    lam = np.where(total > 1e-6, d_ngh / np.maximum(total, 1e-300), 0.5)

    # Projected center-to-center distance along the face normal
    # (prepare_coupled.wgsl:168-171).
    ccx = mesh.cell_cx[neigh_safe] - mesh.cell_cx[owner]
    ccy = mesh.cell_cy[neigh_safe] - mesh.cell_cy[owner]
    dist_cc = np.maximum(np.abs(ccx * f_nx + ccy * f_ny), 1e-6)

    # ------------------------------------------------------------------
    # Cell-major padded slots.
    counts = np.diff(mesh.cell_face_offsets)
    K = int(counts.max())
    slot = np.zeros((N, K), dtype=np.int64)
    mask = np.zeros((N, K), dtype=bool)
    cell_ids = np.repeat(np.arange(N), counts)
    within = np.arange(len(mesh.cell_faces)) - np.repeat(
        mesh.cell_face_offsets[:-1], counts)
    slot[cell_ids, within] = mesh.cell_faces
    mask[cell_ids, within] = True

    ck_face = slot
    own_k = owner[ck_face]
    ngh_k = neigh[ck_face]
    this = np.arange(N)[:, None]
    is_owner = own_k == this
    sign = np.where(mask, np.where(is_owner, 1.0, -1.0), 0.0)
    other = np.where(is_owner, ngh_k, own_k)          # -1 at boundary slots
    is_bdry = mask & (other < 0)
    other_safe = np.where(other >= 0, other, this)
    other_safe = np.where(mask, other_safe, this)

    ck_nx = f_nx[ck_face] * sign
    ck_ny = f_ny[ck_face] * sign
    ck_area = np.where(mask, mesh.face_area[ck_face], 0.0)
    fcx_k = mesh.face_cx[ck_face]
    fcy_k = mesh.face_cy[ck_face]

    this_cx = mesh.cell_cx[:, None]
    this_cy = mesh.cell_cy[:, None]
    # "other center": neighbor centroid, or the face center at boundaries
    # (coupled_assembly_merged.wgsl:160-171).
    oc_x = np.where(is_bdry, fcx_k, mesh.cell_cx[other_safe])
    oc_y = np.where(is_bdry, fcy_k, mesh.cell_cy[other_safe])

    d_this = np.hypot(this_cx - fcx_k, this_cy - fcy_k)
    d_other = np.hypot(oc_x - fcx_k, oc_y - fcy_k)
    tot = d_this + d_other
    ck_lam = np.where(tot > 1e-6, d_other / np.maximum(tot, 1e-300), 0.5)

    dvx = oc_x - this_cx
    dvy = oc_y - this_cy
    ck_dist_proj = np.maximum(np.abs(dvx * ck_nx + dvy * ck_ny), 1e-6)
    ck_dist = np.maximum(np.hypot(dvx, dvy), 1e-12)

    bdry_k = np.where(mask, mesh.face_boundary[ck_face], 0)

    as_f = partial(jnp.asarray, dtype=dtype)
    as_i = partial(jnp.asarray, dtype=jnp.int32)

    return DeviceMesh(
        num_cells=N, num_faces=F, max_faces=K,
        f_owner=as_i(owner), f_neighbor=as_i(neigh),
        f_neighbor_safe=as_i(neigh_safe),
        f_internal=jnp.asarray(internal),
        f_boundary=as_i(mesh.face_boundary),
        f_area=as_f(mesh.face_area), f_nx=as_f(f_nx), f_ny=as_f(f_ny),
        f_cx=as_f(mesh.face_cx), f_cy=as_f(mesh.face_cy),
        f_lambda=as_f(lam), f_dist_cc=as_f(dist_cc),
        c_cx=as_f(mesh.cell_cx), c_cy=as_f(mesh.cell_cy),
        c_vol=as_f(mesh.cell_vol),
        ck_face=as_i(ck_face), ck_mask=as_f(mask.astype(np.float64)),
        ck_sign=as_f(sign), ck_neighbor=as_i(other_safe),
        ck_is_boundary=as_f(is_bdry.astype(np.float64)),
        ck_boundary=as_i(bdry_k),
        ck_nx=as_f(np.where(mask, ck_nx, 0.0)),
        ck_ny=as_f(np.where(mask, ck_ny, 0.0)),
        ck_area=as_f(ck_area), ck_lam=as_f(ck_lam),
        ck_dist_proj=as_f(ck_dist_proj), ck_dist=as_f(ck_dist),
        ck_rx=as_f(np.where(mask, fcx_k - this_cx, 0.0)),
        ck_ry=as_f(np.where(mask, fcy_k - this_cy, 0.0)),
        ck_dcdx=as_f(np.where(mask, dvx, 0.0)),
        ck_dcdy=as_f(np.where(mask, dvy, 0.0)),
    )
