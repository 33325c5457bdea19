"""Spatial domain decomposition.

Structured meshes: shards the (ny, nx) cell layout row-wise over a
device-mesh axis.  Because every hot-loop operator is a stencil
(edge-clamped shifts + elementwise math + reductions), GSPMD propagates the
sharding through the entire jitted step and inserts the halo exchanges
(collective-permutes) and psums (for FGMRES dot products) itself — the
"annotate shardings, let XLA insert collectives" recipe.  No kernel changes;
those helpers only place data.

Banded (unstructured) meshes: the RCM/column-sweep cell order is spatially
coherent by construction, so a D-device decomposition is contiguous rank
ranges and a cell's neighbors lie within the matrix bandwidth B of its own
index.  :func:`banded_spmv_sharded` implements the DESIGN "banded layout
sharding story" skeleton: an explicit ``shard_map`` over the cell axis with
a B-row halo ``ppermute`` before each local gather — the structure the
banded Pallas kernels slot into per-shard (each shard's gather is purely
local after the exchange).

This is the mesh-partition + halo-exchange scaling axis SURVEY.md §2 maps to
TP/SP for this workload (the reference is single-GPU).  Requires ny to be
divisible by the number of devices; :func:`pad_mesh_rows` handles that at
encode time by growing the grid with masked solid rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec as P

from ..runtime.device_mesh import DeviceMesh
from ..runtime.state import SolverState


def row_sharding(jmesh: JMesh, axis: str = "y"):
    """Sharding for flat (N,)/(N,...) cell arrays: rows of the (ny, nx) grid
    distribute over ``axis`` (cell index is jy*nx + ix, so axis 0 of the flat
    array is the row-major grid)."""
    return NamedSharding(jmesh, P(axis))


def shard_cellwise(tree, num_cells: int, jmesh: JMesh, axis: str = "y"):
    """Place every array in ``tree`` whose leading axis is ``num_cells``
    row-sharded over ``axis``; everything else replicated.  Works for
    SolverState, DeviceMesh, and AMG hierarchies alike (an AMG hierarchy's
    level-0 transfer maps are cell-sized; coarse levels replicate)."""
    cell_sh = row_sharding(jmesh, axis)
    rep = NamedSharding(jmesh, P())

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_cells:
            return jax.device_put(x, cell_sh)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def shard_state(mesh: DeviceMesh, state: SolverState, jmesh: JMesh,
                axis: str = "y") -> SolverState:
    """Place all cell-sized state arrays row-sharded; scalars replicated."""
    assert mesh.structured, "spatial sharding needs the structured layout"
    ny, nx = mesh.grid_shape
    ndev = jmesh.devices.size
    assert ny % ndev == 0, (
        f"ny={ny} not divisible by {ndev} devices; encode with "
        f"pad_rows_to={ndev}")
    return shard_cellwise(state, mesh.num_cells, jmesh, axis)


def shard_mesh(mesh: DeviceMesh, jmesh: JMesh, axis: str = "y") -> DeviceMesh:
    """Place the mesh's cell-sized arrays row-sharded (face arrays and host
    mappings replicated — they are outside the hot loop)."""
    return shard_cellwise(mesh, mesh.num_cells, jmesh, axis)


# ----------------------------------------------------------------------
# Banded (unstructured) spatial sharding — the shard_map + halo-ppermute
# skeleton of DESIGN's "banded layout sharding story" (VERDICT r4 #8).


def banded_bandwidth(mesh: DeviceMesh) -> int:
    """Matrix bandwidth of the banded cell order: max |neighbor - cell| over
    live slots.  RCM ordering gives B ~ sqrt(N) on 2D meshes, so the halo a
    contiguous rank range needs from each side is B cells."""
    ngh = np.asarray(mesh.ck_neighbor)
    live = np.asarray(mesh.ck_mask * (1.0 - mesh.ck_is_boundary)) > 0
    rows = np.arange(ngh.shape[0])[:, None]
    return int(np.abs(np.where(live, ngh - rows, 0)).max())


def banded_spmv_sharded(es, mesh: DeviceMesh, x: jnp.ndarray, jmesh: JMesh,
                        halo: int, axis: str = "y") -> jnp.ndarray:
    """y = A x on a banded mesh with x (3, N) sharded over contiguous cell
    ranges: shard_map over the cell axis; each rank ppermutes its boundary
    ``halo`` cells to its neighbors, then gathers purely locally.

    Mirrors ops/ellsys.spmv's XLA-gather form per shard (the Pallas banded
    kernel drops into the same local-window structure; per-shard local
    indices are exactly the global ones shifted by the range start).  The
    halo must satisfy halo <= N/D so one ppermute per side suffices.
    """
    N = mesh.num_cells
    D = int(jmesh.shape[axis])
    chunk = N // D
    assert N % D == 0, (N, D)
    assert 0 < halo <= chunk, (halo, chunk)

    fwd = [(i, i + 1) for i in range(D - 1)]     # data flows rank r -> r+1
    bwd = [(i + 1, i) for i in range(D - 1)]

    cell = P(axis)
    vec = P(None, axis)

    def local(x_blk, ngh_blk, offs, diags):
        r = lax.axis_index(axis)
        # Halo exchange: previous rank's last `halo` cells and next rank's
        # first `halo` cells (edge ranks receive zeros — no live slot
        # reaches past the global range, and dead slots carry zero
        # coefficients).
        left = lax.ppermute(x_blk[:, -halo:], axis, fwd)
        right = lax.ppermute(x_blk[:, :halo], axis, bwd)
        xh = jnp.concatenate([left, x_blk, right], axis=1)  # (3, chunk+2H)
        loc = ngh_blk - (r * chunk - halo)
        loc = jnp.clip(loc, 0, chunk + 2 * halo - 1)
        gu, gv, gp = xh[0][loc], xh[1][loc], xh[2][loc]     # (chunk, K)
        o_mom, o_up, o_vp, o_pu, o_pv, o_pp = offs
        d_u, d_up, d_vp, d_pu, d_pv, d_pp = diags
        xu, xv, xp = x_blk[0], x_blk[1], x_blk[2]
        dot = lambda off, g: jnp.sum(off * g, axis=1)
        yu = d_u * xu + d_up * xp + dot(o_mom, gu) + dot(o_up, gp)
        yv = d_u * xv + d_vp * xp + dot(o_mom, gv) + dot(o_vp, gp)
        yp = (d_pu * xu + d_pv * xv + d_pp * xp
              + dot(o_pu, gu) + dot(o_pv, gv) + dot(o_pp, gp))
        return jnp.stack([yu, yv, yp], axis=0)

    offs = (es.off_mom, es.off_up, es.off_vp,
            es.off_pu, es.off_pv, es.off_pp)
    diags = (es.diag_u, es.diag_up, es.diag_vp,
             es.diag_pu, es.diag_pv, es.diag_pp)
    return jax.shard_map(
        local, mesh=jmesh,
        in_specs=(vec, cell, (cell,) * 6, (cell,) * 6),
        out_specs=vec)(x, mesh.ck_neighbor, offs, diags)
