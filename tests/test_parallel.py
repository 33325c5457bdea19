"""Batch data-parallelism tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh as JMesh

from cfd2_tpu.mesh import RectangularChannel, generate_cut_cell_mesh
from cfd2_tpu.parallel.batch import (
    batched_initial_state,
    batched_step,
    shard_batch,
    sweep_step,
)
from cfd2_tpu.runtime.device_mesh import encode_mesh
from cfd2_tpu.runtime.state import SolverConfig, SolverParams, initial_state


@pytest.fixture(scope="module")
def setup():
    geo = RectangularChannel(length=2.0, height=1.0)
    mesh = generate_cut_cell_mesh(geo, 0.125, 0.125, 1.2, (2.0, 1.0))
    dm = encode_mesh(mesh)
    u0 = np.zeros((mesh.num_cells, 2))
    u0[mesh.cell_cx < 0.25, 0] = 1.0
    return dm, u0


def _devices():
    d = jax.devices()
    if len(d) < 8:
        d = jax.devices("cpu")
    return d


def test_batched_step_sharded(setup):
    dm, u0 = setup
    devices = _devices()
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    jmesh = JMesh(np.array(devices[:8]), axis_names=("batch",))
    config = SolverConfig()
    params = SolverParams.default(dt=0.01)
    bstate = batched_initial_state(dm, batch=8, u0=u0)
    bstate = shard_batch(bstate, jmesh)
    out = batched_step(dm, bstate, params, config)
    u = np.asarray(out.u)
    assert u.shape[0] == 8
    assert np.isfinite(u).all()
    # All cases identical inputs -> identical outputs.
    assert np.abs(u - u[0]).max() < 1e-6
    # Matches the single-case step.
    single = initial_state(dm, u0=u0)
    from cfd2_tpu.models.coupled import step
    ref = step(dm, single, params, config)
    assert np.abs(u[0] - np.asarray(ref.u)).max() < 1e-5


def test_parameter_sweep(setup):
    """Per-case viscosities in one compiled batched step."""
    from dataclasses import replace

    dm, u0 = setup
    config = SolverConfig()
    base = SolverParams.default(dt=0.01)
    B = 4
    viscs = jnp.asarray([0.001, 0.01, 0.05, 0.1], jnp.float32)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), base)
    bparams = replace(bparams, viscosity=viscs)
    bstate = batched_initial_state(dm, batch=B, u0=u0)
    out = sweep_step(dm, bstate, bparams, config)
    u = np.asarray(out.u)
    assert np.isfinite(u).all()
    # Different viscosities must give different flow fields.
    assert np.abs(u[0] - u[-1]).max() > 1e-5


def test_banded_spatial_spmv_matches_single_device():
    """Banded spatial skeleton (DESIGN "banded layout sharding story"):
    the shard_map + halo-ppermute coupled SpMV over contiguous RCM cell
    ranges must match ops/ellsys.spmv on a single device."""
    from cfd2_tpu.mesh import ChannelWithObstacle, generate_delaunay_mesh
    from cfd2_tpu.models.assembly import assemble_ell, prepare
    from cfd2_tpu.ops import ellsys as el
    from cfd2_tpu.parallel.spatial import (banded_bandwidth,
                                           banded_spmv_sharded)

    devices = _devices()
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    geo = ChannelWithObstacle(3.0, 1.0, (1.0, 0.5), 0.2)
    mesh = generate_delaunay_mesh(geo, 0.06, 0.06, 1.2, (3.0, 1.0), seed=3)
    dm = encode_mesh(mesh)
    assert dm.banded
    config = SolverConfig()
    params = SolverParams.default(dt=0.005)
    rng = np.random.default_rng(0)
    state = initial_state(
        dm, u0=rng.standard_normal((dm.num_host_cells, 2)) * 0.1)
    state = prepare(dm, state, params, config)
    es = assemble_ell(dm, state, params, config)

    halo = banded_bandwidth(dm)
    assert halo <= dm.num_cells // 8, "halo must fit one rank range"
    x = jnp.asarray(rng.standard_normal((3, dm.num_cells)), jnp.float32)
    y_single = np.asarray(el.spmv(es, dm, x))
    jmesh = JMesh(np.array(devices[:8]), axis_names=("y",))
    y_shard = np.asarray(banded_spmv_sharded(es, dm, x, jmesh, halo))
    scale = max(np.abs(y_single).max(), 1.0)
    assert np.abs(y_shard - y_single).max() < 1e-5 * scale
