"""Delaunay/Voronoi generator tests, ported from the reference
(src/solver/mesh/tests.rs:148-318, tests/reproduce_hole.rs,
tests/test_mesh_comparison.rs)."""

import numpy as np
import pytest

from cfd2_tpu.mesh import (
    ChannelWithObstacle,
    generate_cut_cell_mesh,
    generate_delaunay_mesh,
    generate_voronoi_mesh,
    triangulate,
)


@pytest.fixture(scope="module")
def geo():
    return ChannelWithObstacle(length=3.0, height=1.0,
                               obstacle_center=(1.0, 0.5), obstacle_radius=0.2)


def test_delaunay_empty_circumcircle(geo):
    """Reference mesh/tests.rs:148-253: no vertex lies strictly inside any
    triangle's circumcircle."""
    pts, tris, _ = triangulate(geo, 0.1, 0.1, 1.2, (3.0, 1.0))
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    d = 2.0 * (a[:, 0] * (b[:, 1] - c[:, 1]) + b[:, 0] * (c[:, 1] - a[:, 1])
               + c[:, 0] * (a[:, 1] - b[:, 1]))
    a2 = (a * a).sum(1)
    b2 = (b * b).sum(1)
    c2 = (c * c).sum(1)
    ux = (a2 * (b[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1])
          + c2 * (a[:, 1] - b[:, 1])) / d
    uy = (a2 * (c[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c[:, 0])
          + c2 * (b[:, 0] - a[:, 0])) / d
    r2 = (a[:, 0] - ux) ** 2 + (a[:, 1] - uy) ** 2
    # All points vs all circumcircles (small mesh, dense check like reference).
    d2 = (pts[None, :, 0] - ux[:, None]) ** 2 + (pts[None, :, 1] - uy[:, None]) ** 2
    inside = d2 < r2[:, None] - 1e-9
    for t in range(len(tris)):
        inside[t, tris[t]] = False
    assert not inside.any()


def test_delaunay_hole_detection(geo):
    """Reference tests/reproduce_hole.rs: mesh area excludes the obstacle."""
    m = generate_delaunay_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    assert m.validate() == []
    expected = 3.0 * 1.0 - np.pi * 0.2 ** 2
    assert abs(m.cell_vol.sum() - expected) < 0.05


def test_voronoi_structure(geo):
    """Reference mesh/tests.rs:256-318: total area ~= domain - obstacle
    (+-0.05), >=3 faces per cell, all polygons CCW."""
    m = generate_voronoi_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    assert m.validate() == []
    expected = 3.0 * 1.0 - np.pi * 0.2 ** 2
    assert abs(m.cell_vol.sum() - expected) < 0.05
    assert np.diff(m.cell_face_offsets).min() >= 3
    for i in range(m.num_cells):
        s, e = m.cell_vertex_offsets[i], m.cell_vertex_offsets[i + 1]
        vv = m.cell_vertices[s:e]
        px, py = m.vx[vv], m.vy[vv]
        a2 = np.sum(px * np.roll(py, -1) - np.roll(px, -1) * py)
        assert a2 > 0, f"cell {i} not CCW"


def test_mesh_comparison(geo):
    """Reference tests/test_mesh_comparison.rs: generators produce comparable
    meshes for the same geometry/size."""
    mc = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    md = generate_delaunay_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    assert 0.3 < md.num_cells / mc.num_cells < 3.0
    assert abs(mc.cell_vol.sum() - md.cell_vol.sum()) < 0.05


def test_delaunay_scale(geo):
    """Reference tests/delaunay_test.rs: the 0.005 mesh exceeds 100k cells
    and remains structurally valid."""
    m = generate_delaunay_mesh(geo, 0.005, 0.005, 1.2, (3.0, 1.0))
    assert m.num_cells > 100_000
    assert m.validate() == []
    assert (m.cell_vol > 0).all()


def test_voronoi_quality_after_smoothing(geo):
    """Port of tests/reproduce_voronoi_quality.rs: after smoothing, boundary
    vertices lie within 1e-3 of the SDF zero level."""
    m = generate_voronoi_mesh(geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    m.smooth(geo, 0.3, 30)
    assert m.validate() == []
    fixed = m.v_fixed
    assert fixed.any()
    import numpy as _np
    # Only obstacle-surface vertices are SDF-constrained; wall/inlet/outlet
    # vertices sit on the domain box where sdf==0 as well.
    err = _np.abs(geo.sdf(m.vx[fixed], m.vy[fixed]))
    assert err.max() <= 1e-3, f"boundary fidelity {err.max():.2e}"


def test_provenance_survives_clipped_domain_edge():
    """Quadtree provenance (cell_level/gi/gj) must survive domains whose
    extent is NOT an integer multiple of the cell size: the right/top edge
    tiles are clipped (quadtree.refine_leaves), and without edge-aware level
    inference the 1M flagship (3.0 / 0.0017 = 1764.7 columns) lost
    provenance, so *smoothed* meshes fell off the structured fast path."""
    import numpy as np

    from cfd2_tpu.mesh import ChannelWithObstacle, generate_cut_cell_mesh
    from cfd2_tpu.runtime.device_mesh import encode_mesh

    geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
    # 3.0 / 0.07 = 42.86 columns, 1.0 / 0.07 = 14.3 rows: both edges clipped.
    mesh = generate_cut_cell_mesh(geo, 0.07, 0.07, 1.2, (3.0, 1.0))
    assert mesh.cell_level is not None, "clipped edge tiles lost provenance"
    assert (mesh.cell_level == mesh.cell_level[0]).all()
    mesh.smooth(geo, 0.3, 50)
    dm = encode_mesh(mesh)
    assert dm.structured, "smoothed clipped-domain mesh fell off the " \
        "structured fast path"
    # And a refined clipped-domain mesh keeps multilevel provenance.
    mesh2 = generate_cut_cell_mesh(geo, 0.035, 0.14, 1.2, (3.0, 1.0))
    assert mesh2.cell_level is not None
    assert mesh2.cell_level.max() > mesh2.cell_level.min()
