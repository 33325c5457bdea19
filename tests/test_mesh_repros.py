"""Mesh regression repro tests, ported from the reference
(tests/reproduce_chamfer.rs, tests/debug_obstacle_mesh.rs)."""

import numpy as np

from cfd2_tpu.mesh import (
    BOUNDARY_INLET,
    BOUNDARY_OUTLET,
    BOUNDARY_WALL,
    BackwardsStep,
    ChannelWithObstacle,
    generate_cut_cell_mesh,
    generate_voronoi_mesh,
)


def test_reproduce_chamfer():
    """Sharp step corner at (0.501, 0.501) inside a 0.1 grid cell: the
    corner cell must resolve the corner (6 vertices via sharp-corner
    reconstruction) or at worst chamfer it (5)."""
    geo = BackwardsStep(length=2.0, height_inlet=0.501, height_outlet=1.0,
                        step_x=0.501)
    mesh = generate_cut_cell_mesh(geo, 0.1, 0.1, 1.2, (2.0, 1.0))
    cell_idx = mesh.get_cell_at_pos(0.55, 0.45)
    assert cell_idx is not None, "no cell at probe position"
    s = mesh.cell_vertex_offsets[cell_idx]
    e = mesh.cell_vertex_offsets[cell_idx + 1]
    num_vertices = e - s
    assert num_vertices in (5, 6), f"unexpected vertex count {num_vertices}"
    # The sharp-corner reconstruction should place a vertex near the corner.
    verts = mesh.cell_vertices[s:e]
    d = np.hypot(mesh.vx[verts] - 0.501, mesh.vy[verts] - 0.499)
    assert d.min() < 0.02, "no vertex near the sharp corner"


def test_obstacle_voronoi_connectivity():
    """debug_obstacle_mesh.rs: boundary-type counts and positions on a
    Voronoi channel-obstacle mesh."""
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.1)
    mesh = generate_voronoi_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    assert mesh.validate() == []

    inlet = mesh.face_boundary == BOUNDARY_INLET
    outlet = mesh.face_boundary == BOUNDARY_OUTLET
    wall = mesh.face_boundary == BOUNDARY_WALL
    assert inlet.sum() > 0
    assert outlet.sum() > 0
    assert wall.sum() > 0
    assert (mesh.face_cx[inlet] < 1e-3).all(), "inlet face not at x=0"
    assert (np.abs(mesh.face_cx[outlet] - 3.0) < 1e-3).all(), \
        "outlet face not at x=L"
    # Wall faces: top/bottom domain walls or obstacle surface.
    wy = mesh.face_cy[wall]
    wx = mesh.face_cx[wall]
    on_domain_wall = (wy < 0.05) | (wy > 0.95)
    near_obstacle = np.hypot(wx - 1.0, wy - 0.5) < 0.2
    assert (on_domain_wall | near_obstacle).all()

    # Connectivity: every internal face's owner/neighbor adjacency is
    # reflected in both cells' face lists.
    internal = mesh.face_neighbor >= 0
    counts = np.diff(mesh.cell_face_offsets)
    cell_of = np.repeat(np.arange(mesh.num_cells), counts)
    appearances = np.bincount(mesh.cell_faces, minlength=mesh.num_faces)
    assert (appearances[internal] == 2).all()
    assert (appearances[~internal] == 1).all()
