"""Mesh property tests, ported from the reference's in-crate unit tests
(src/solver/mesh/tests.rs) and mesh regression repros (tests/reproduce_*.rs,
tests/test_channel_obstacle_mesh.rs, tests/mesh_profile_test.rs)."""

import numpy as np
import pytest

from cfd2_tpu.mesh import (
    BackwardsStep,
    ChannelWithObstacle,
    RectangularChannel,
    generate_cut_cell_mesh,
)


@pytest.fixture(scope="module")
def channel_geo():
    return ChannelWithObstacle(length=3.0, height=1.0,
                               obstacle_center=(1.0, 0.5), obstacle_radius=0.2)


@pytest.fixture(scope="module")
def channel_mesh(channel_geo):
    mesh = generate_cut_cell_mesh(channel_geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    mesh.smooth(channel_geo, 0.3, 50)
    return mesh


def test_mesh_structurally_valid(channel_mesh):
    assert channel_mesh.validate() == []
    assert channel_mesh.num_cells > 500


def test_positive_volumes_and_areas(channel_mesh):
    assert (channel_mesh.cell_vol > 0).all()
    assert (channel_mesh.face_area > 0).all()


def test_boundary_vertices_stay_on_sdf_after_smoothing(channel_geo, channel_mesh):
    """Reference mesh/tests.rs:96-114: surface vertices within 1e-4 of SDF=0."""
    fixed = channel_mesh.v_fixed
    assert fixed.any()
    err = np.abs(channel_geo.sdf(channel_mesh.vx[fixed], channel_mesh.vy[fixed]))
    assert err.max() < 1e-4


def test_skewness_bound_after_smoothing(channel_mesh):
    """Reference mesh/tests.rs:138-144 and mesh_profile_test.rs: skew < 1.0,
    and smoothing targets 0.3."""
    skew = channel_mesh.calculate_max_skewness()
    assert skew < 1.0
    assert skew < 0.45  # smoothing should get close to the 0.3 target


def test_total_area_matches_domain(channel_geo, channel_mesh):
    """Analogue of the Voronoi area test (mesh/tests.rs:256-318): cell areas
    sum to the fluid area (domain minus obstacle) within tolerance."""
    expected = 3.0 * 1.0 - np.pi * 0.2 ** 2
    assert abs(channel_mesh.cell_vol.sum() - expected) < 0.05


def test_cell_face_closure(channel_mesh):
    """Sum of outward normal * area over each cell's faces must vanish —
    the discrete conservation property every FV operator relies on."""
    m = channel_mesh
    n = m.num_cells
    sx = np.zeros(n)
    sy = np.zeros(n)
    counts = np.diff(m.cell_face_offsets)
    cell_ids = np.repeat(np.arange(n), counts)
    f = m.cell_faces
    sign = np.where(m.face_owner[f] == cell_ids, 1.0, -1.0)
    np.add.at(sx, cell_ids, sign * m.face_nx[f] * m.face_area[f])
    np.add.at(sy, cell_ids, sign * m.face_ny[f] * m.face_area[f])
    assert np.abs(sx).max() < 1e-10
    assert np.abs(sy).max() < 1e-10


def test_refined_mesh_closure_across_level_jumps():
    """Hanging-node imprinting: closure must hold with quadtree refinement."""
    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    m = generate_cut_cell_mesh(geo, 0.0125, 0.05, 1.2, (3.0, 1.0))
    assert m.validate() == []
    n = m.num_cells
    counts = np.diff(m.cell_face_offsets)
    cell_ids = np.repeat(np.arange(n), counts)
    f = m.cell_faces
    sign = np.where(m.face_owner[f] == cell_ids, 1.0, -1.0)
    sx = np.zeros(n)
    sy = np.zeros(n)
    np.add.at(sx, cell_ids, sign * m.face_nx[f] * m.face_area[f])
    np.add.at(sy, cell_ids, sign * m.face_ny[f] * m.face_area[f])
    assert np.abs(sx).max() < 1e-10
    assert np.abs(sy).max() < 1e-10
    expected = 3.0 * 1.0 - np.pi * 0.2 ** 2
    assert abs(m.cell_vol.sum() - expected) < 0.01


def test_backwards_step_exact_area():
    """BackwardsStep is polygonal: cut-cell mesh should capture it exactly."""
    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    m = generate_cut_cell_mesh(geo, 0.05, 0.05, 1.2, (3.5, 1.0))
    assert m.validate() == []
    assert abs(m.cell_vol.sum() - (3.5 - 0.25)) < 1e-9


def test_boundary_classification():
    """Inlet at x=0, outlet at x=L, wall elsewhere (cut_cell.rs:457-463)."""
    geo = RectangularChannel(length=2.0, height=1.0)
    m = generate_cut_cell_mesh(geo, 0.1, 0.1, 1.2, (2.0, 1.0))
    from cfd2_tpu.mesh import BOUNDARY_INLET, BOUNDARY_OUTLET, BOUNDARY_WALL
    inlet = m.face_boundary == BOUNDARY_INLET
    outlet = m.face_boundary == BOUNDARY_OUTLET
    wall = m.face_boundary == BOUNDARY_WALL
    assert inlet.sum() == 10
    assert outlet.sum() == 10
    assert wall.sum() == 40
    assert np.allclose(m.face_cx[inlet], 0.0)
    assert np.allclose(m.face_cx[outlet], 2.0)


def test_channel_obstacle_boundary_fidelity(channel_geo):
    """Port of tests/test_channel_obstacle_mesh.rs: SDF error of boundary
    vertices pre/post smoothing stays small."""
    mesh = generate_cut_cell_mesh(channel_geo, 0.05, 0.05, 1.2, (3.0, 1.0))
    fixed = mesh.v_fixed
    pre = np.abs(channel_geo.sdf(mesh.vx[fixed], mesh.vy[fixed])).max()
    mesh.smooth(channel_geo, 0.3, 50)
    fixed = mesh.v_fixed
    post = np.abs(channel_geo.sdf(mesh.vx[fixed], mesh.vy[fixed])).max()
    assert pre < 1e-6     # cut vertices are root-found onto the surface
    assert post < 1e-3    # reproduce_voronoi_quality.rs tolerance
