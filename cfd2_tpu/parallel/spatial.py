"""Spatial domain decomposition for structured meshes.

Shards the (ny, nx) structured cell layout row-wise over a device-mesh axis.
Because every hot-loop operator is a stencil (edge-clamped shifts + element-
wise math + reductions), GSPMD propagates the sharding through the entire
jitted step and inserts the halo exchanges (collective-permutes) and psums
(for FGMRES dot products) itself — the "annotate shardings, let XLA insert
collectives" recipe.  No kernel changes; this module only places data.

This is the mesh-partition + halo-exchange scaling axis SURVEY.md §2 maps to
TP/SP for this workload (the reference is single-GPU).  Requires ny to be
divisible by the number of devices; :func:`pad_mesh_rows` handles that at
encode time by growing the grid with masked solid rows.
"""

from __future__ import annotations

import jax
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
