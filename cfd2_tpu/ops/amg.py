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

from .blockell import BlockSystem

_OMEGA = 0.8
_COARSE_SWEEPS = 10
_MIN_COARSE = 100
_MAX_LEVELS = 20


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class AmgLevel:
    """One coarse level (level 0 is the fine pressure system itself)."""
    n: int                       # static size
    k: int                       # static max neighbors in ELL
    ell_neighbor: jnp.ndarray    # (n, k) int32, self-padded
    rap_target: jnp.ndarray      # flattened finer-values -> this level's slots
    agg: jnp.ndarray             # (n_fine,) int32 aggregate id (prolongation)
    members: jnp.ndarray         # (n, m) int32 fine members (restriction)
    members_mask: jnp.ndarray    # (n, m) f32

    def tree_flatten(self):
        return ((self.ell_neighbor, self.rap_target, self.agg,
                 self.members, self.members_mask), (self.n, self.k))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], *children)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class AmgHierarchy:
    levels: tuple  # of AmgLevel, coarsest last; empty if mesh too small

    def tree_flatten(self):
        return (tuple(self.levels),), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(levels=children[0])


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


def build_hierarchy(ck_neighbor: np.ndarray, ck_mask: np.ndarray,
                    c_valid: np.ndarray | None = None) -> AmgHierarchy:
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

        levels.append(AmgLevel(
            n=nc, k=kc,
            ell_neighbor=jnp.asarray(coarse_ngh, jnp.int32),
            rap_target=jnp.asarray(targets, jnp.int32),
            agg=jnp.asarray(agg, jnp.int32),
            members=jnp.asarray(members, jnp.int32),
            members_mask=jnp.asarray(members_mask, jnp.float32),
        ))

        ngh = coarse_ngh
        mask = coarse_mask

    return AmgHierarchy(levels=tuple(levels))


# ----------------------------------------------------------------------
# Device-side per-solve value computation + V-cycle


def compute_level_values(hier: AmgHierarchy, P_diag: jnp.ndarray,
                         P_off: jnp.ndarray):
    """Galerkin-coarsen the current pressure values down the hierarchy."""
    vals = [(P_diag, P_off)]
    for lvl in hier.levels:
        fd, fo = vals[-1]
        flat = jnp.concatenate([fd, fo.reshape(-1)])
        seg = jax.ops.segment_sum(flat, lvl.rap_target,
                                  num_segments=lvl.n * (lvl.k + 1) + 1)
        seg = seg[:-1].reshape(lvl.n, lvl.k + 1)
        vals.append((seg[:, 0], seg[:, 1:]))
    return vals


def _ell_spmv(diag, off, gather, x):
    return diag * x + jnp.sum(off * gather(x), axis=1)


def _smooth(diag, off, gather, x, b, sweeps=1):
    dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 0.0)
    for _ in range(sweeps):
        x = x + _OMEGA * dinv * (b - _ell_spmv(diag, off, gather, x))
    return x


def v_cycle(hier: AmgHierarchy, level_values, mesh,
            b0: jnp.ndarray, x0: jnp.ndarray) -> jnp.ndarray:
    """One V-cycle; level structure is static so the cycle fully unrolls.

    Level 0 uses ``mesh.gather`` (stencil shifts on structured meshes);
    coarse levels are small and use plain gathers over their ELL adjacency.
    """
    L = len(hier.levels)
    gathers = [mesh.gather] + [
        (lambda ngh: (lambda x: x[ngh]))(lvl.ell_neighbor)
        for lvl in hier.levels]

    xs = [x0]
    bs = [b0]
    # Downward
    for i in range(L):
        diag, off = level_values[i]
        lvl = hier.levels[i]
        x = _smooth(diag, off, gathers[i], xs[i], bs[i])
        r = bs[i] - _ell_spmv(diag, off, gathers[i], x)
        b_c = jnp.sum(r[lvl.members] * lvl.members_mask, axis=1)
        xs[i] = x
        bs.append(b_c)
        xs.append(jnp.zeros((lvl.n,), x.dtype))

    # Coarsest solve: 10 damped-Jacobi sweeps.
    diag, off = level_values[L]
    xs[L] = _smooth(diag, off, gathers[L], xs[L], bs[L],
                    sweeps=_COARSE_SWEEPS)

    # Upward
    for i in reversed(range(L)):
        lvl = hier.levels[i]
        diag, off = level_values[i]
        x = xs[i] + xs[i + 1][lvl.agg]
        xs[i] = _smooth(diag, off, gathers[i], x, bs[i])

    return xs[0]


def make_pressure_solve(hier: AmgHierarchy, mesh, sys: BlockSystem):
    """pressure_solve(rhs_p) closure for the Schur preconditioner (the AMG
    path of coupled_solver_fgmres.rs:1942-1946).

    ``hier`` must reach the jitted computation as an *argument* pytree, never
    a Python closure constant — its index arrays would otherwise be embedded
    in the HLO as literals (huge programs; breaks remote compilation).
    """
    level_values = compute_level_values(hier, sys.P_diag, sys.P_off)

    def pressure_solve(rhs_p):
        x0 = sys.diag_p_inv * rhs_p          # Jacobi seed, like p_sol init
        return v_cycle(hier, level_values, mesh, rhs_p, x0)

    return pressure_solve


def build_hierarchy_for_mesh(mesh) -> AmgHierarchy | None:
    """Build the hierarchy for a DeviceMesh (None if the mesh is too small)."""
    hier = build_hierarchy(np.asarray(mesh.ck_neighbor),
                           np.asarray(mesh.ck_mask),
                           np.asarray(mesh.c_valid))
    return hier if hier.levels else None
