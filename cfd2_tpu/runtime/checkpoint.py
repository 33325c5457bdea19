"""Checkpoint / resume of solver state.

The reference has **no** serialization (SURVEY.md §5: serde disabled, history
init is buffer copies).  This is a new capability: the full ``SolverState`` +
``SolverParams`` pytrees round-trip through a single ``.npz`` (no external
deps), or through orbax for async/distributed checkpointing when available.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .state import SolverParams, SolverState


def save_checkpoint(path: str, state: SolverState,
                    params: SolverParams | None = None) -> None:
    """Write state (+params) to an .npz file."""
    arrs = {f"state.{f.name}": np.asarray(getattr(state, f.name))
            for f in dataclasses.fields(state)}
    if params is not None:
        arrs.update({f"params.{f.name}": np.asarray(getattr(params, f.name))
                     for f in dataclasses.fields(params)})
    np.savez_compressed(path, **arrs)


def load_checkpoint(path: str):
    """Read (state, params|None) back from an .npz file."""
    data = np.load(path)
    skw = {}
    pkw = {}
    for key in data.files:
        scope, name = key.split(".", 1)
        if scope == "state":
            skw[name] = jnp.asarray(data[key])
        else:
            pkw[name] = jnp.asarray(data[key])
    # Diagnostic counters added after a checkpoint was written default to 0
    # (forward-compatible resume; the physics fields are always present).
    for f in dataclasses.fields(SolverState):
        if f.name not in skw and f.name in ("linear_iters_total",):
            skw[f.name] = jnp.asarray(0, jnp.int32)
    state = SolverState(**skw)
    params = SolverParams(**pkw) if pkw else None
    return state, params


def save_checkpoint_orbax(path: str, state: SolverState,
                          params: SolverParams | None = None) -> None:
    """Orbax variant (async-capable, multi-host) when orbax is installed."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {"state": dataclasses.asdict(state)}
    if params is not None:
        payload["params"] = dataclasses.asdict(params)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    state = SolverState(**jax.tree.map(jnp.asarray, payload["state"]))
    params = (SolverParams(**jax.tree.map(jnp.asarray, payload["params"]))
              if "params" in payload else None)
    return state, params
