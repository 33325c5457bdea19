"""Data parallelism over a batch of independent simulations.

Runs B cases of the same mesh concurrently, sharded over a
``jax.sharding.Mesh`` axis ("batch") so each device advances its own subset —
ensemble runs, parameter sweeps, design-space exploration.  XLA inserts no
collectives in the hot loop (cases are independent); the only cross-device
traffic is the initial shard placement.

This is the TPU-mapping SURVEY.md §2 prescribes for DP on this workload; the
reference has no multi-device capability at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.coupled import multi_step, step
from ..runtime.state import SolverConfig, SolverParams, SolverState, initial_state


def batched_initial_state(mesh, batch: int, u0=None, p0=None) -> SolverState:
    """Stack B initial states along a leading batch axis."""
    one = initial_state(mesh, u0=u0, p0=p0)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


def shard_batch(bstate: SolverState, device_mesh: Mesh,
                axis: str = "batch") -> SolverState:
    """Place a batched state with its leading axis sharded over the mesh."""
    sharding = NamedSharding(device_mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if x.ndim >= 1
        else jax.device_put(x, NamedSharding(device_mesh, P())), bstate)


@partial(jax.jit, static_argnames=("config",))
def batched_step(mesh, bstate: SolverState, params: SolverParams,
                 config: SolverConfig) -> SolverState:
    """One timestep for every case in the batch (same mesh, shared params)."""
    return jax.vmap(lambda s: step(mesh, s, params, config))(bstate)


@partial(jax.jit, static_argnames=("config", "num_steps"))
def batched_multi_step(mesh, bstate: SolverState, params: SolverParams,
                       config: SolverConfig, num_steps: int):
    """N scanned steps for every case in the batch."""
    return jax.vmap(lambda s: multi_step(mesh, s, params, config, num_steps))(
        bstate)


def batched_params(params: SolverParams, overrides: dict) -> SolverParams:
    """Broadcast params and override selected fields with per-case arrays —
    parameter sweeps (e.g. a batch of viscosities) in one compiled run."""
    from dataclasses import replace
    return replace(params, **{k: jnp.asarray(v, jnp.float32)
                              for k, v in overrides.items()})


@partial(jax.jit, static_argnames=("config",))
def sweep_step(mesh, bstate: SolverState, bparams: SolverParams,
               config: SolverConfig) -> SolverState:
    """Like :func:`batched_step` but with per-case parameters (vmapped)."""
    return jax.vmap(lambda s, p: step(mesh, s, p, config))(bstate, bparams)
