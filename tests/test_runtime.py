"""Runtime subsystem tests: profiling report, checkpoint round-trip,
renderer, device-mesh encoding invariants."""

import os

import numpy as np
import pytest

from cfd2_tpu.mesh import BackwardsStep, generate_cut_cell_mesh
from cfd2_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from cfd2_tpu.runtime.device_mesh import encode_mesh
from cfd2_tpu.runtime.profiling import ProfileCategory, ProfilingStats
from cfd2_tpu.runtime.state import SolverParams, initial_state


@pytest.fixture(scope="module")
def mesh():
    geo = BackwardsStep(length=3.5, height_inlet=0.5, height_outlet=1.0,
                        step_x=0.5)
    return generate_cut_cell_mesh(geo, 0.1, 0.1, 1.2, (3.5, 1.0))


def test_device_mesh_encoding(mesh):
    dm = encode_mesh(mesh)
    assert dm.num_host_cells == mesh.num_cells
    assert dm.num_cells >= mesh.num_cells    # structured layout pads solids
    assert int(np.asarray(dm.c_valid).sum()) == mesh.num_cells
    assert dm.num_faces == mesh.num_faces
    # Every valid slot's sign is +-1; padding slots are 0.
    sign = np.asarray(dm.ck_sign)
    maskb = np.asarray(dm.ck_mask) > 0
    assert set(np.unique(sign[maskb])) <= {-1.0, 1.0}
    assert (sign[~maskb] == 0).all()
    # Normals are owner-outward.
    fo = np.asarray(dm.f_owner)
    dx = np.asarray(dm.f_cx) - np.asarray(dm.c_cx)[fo]
    dy = np.asarray(dm.f_cy) - np.asarray(dm.c_cy)[fo]
    dot = dx * np.asarray(dm.f_nx) + dy * np.asarray(dm.f_ny)
    assert (dot >= -1e-6).all()
    # Per-cell closure of slot normals (conservation on device arrays).
    sx = np.sum(np.asarray(dm.ck_nx) * np.asarray(dm.ck_area), axis=1)
    sy = np.sum(np.asarray(dm.ck_ny) * np.asarray(dm.ck_area), axis=1)
    assert np.abs(sx).max() < 1e-3
    assert np.abs(sy).max() < 1e-3


def test_checkpoint_roundtrip(tmp_path, mesh):
    dm = encode_mesh(mesh)
    state = initial_state(dm, u0=np.random.default_rng(0).standard_normal(
        (dm.num_host_cells, 2)))
    params = SolverParams.default(dt=0.042)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, state, params)
    state2, params2 = load_checkpoint(path)
    assert np.allclose(np.asarray(state.u), np.asarray(state2.u))
    assert np.allclose(np.asarray(state.time), np.asarray(state2.time))
    assert float(params2.dt) == pytest.approx(0.042)


def test_profiling_report():
    p = ProfilingStats()
    p.enable()
    with p.session():
        with p.scope("solve", ProfileCategory.DEVICE_DISPATCH):
            pass
        p.record_location("get_u", ProfileCategory.DEVICE_READ, 0.5, 4096)
        p.record_location("get_u", ProfileCategory.DEVICE_READ, 0.4, 4096)
        p.increment_iteration()
    rep = p.report()
    assert "DeviceRead" in rep
    assert "get_u" in rep
    assert p.category_totals()["DeviceRead"] == pytest.approx(0.9)


def test_renderer(tmp_path, mesh):
    from cfd2_tpu.viz import FieldRenderer, rainbow_colormap

    # Colormap endpoints match the reference shader: blue -> green -> red.
    assert np.allclose(rainbow_colormap(np.array(0.0)), [0, 0, 1])
    assert np.allclose(rainbow_colormap(np.array(0.5)), [0, 1, 0])
    assert np.allclose(rainbow_colormap(np.array(1.0)), [1, 0, 0])

    dm = encode_mesh(mesh)
    state = initial_state(dm)
    r = FieldRenderer(mesh)
    out = os.path.join(tmp_path, "frame.png")
    r.render(state, mode="mag", path=out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000
