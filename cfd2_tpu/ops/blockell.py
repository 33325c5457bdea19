"""Block-ELL sparse matrix container and SpMV.

The coupled (u,v,p) system is stored as dense per-cell 3x3 blocks keyed by the
mesh's padded (N, K) slot structure (see runtime/device_mesh.py), replacing
the reference's interleaved 3Nx3N block CSR (init/linear_solver/mod.rs:180-216)
and its scalar SpMV kernel (gmres_ops.wgsl).  On TPU the SpMV becomes two
batched einsums — MXU-friendly, no scatter, no indirection beyond one gather.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class BlockSystem:
    """Assembled coupled system + scalar pressure (Schur) system.

    Off-diagonal blocks are identically zero at padding and boundary slots, so
    no masks are needed in products.
    """
    A_diag: jnp.ndarray     # (N, 3, 3)
    A_off: jnp.ndarray      # (N, K, 3, 3)
    rhs: jnp.ndarray        # (N, 3)
    P_diag: jnp.ndarray     # (N,)   scalar pressure matrix diagonal
    P_off: jnp.ndarray      # (N, K)
    diag_u_inv: jnp.ndarray  # (N,)
    diag_v_inv: jnp.ndarray  # (N,)
    diag_p_inv: jnp.ndarray  # (N,)  inverse of scalar pressure diagonal


def block_spmv(sys: BlockSystem, mesh, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x with x of shape (N, 3).  Neighbor access via ``mesh.gather``
    (stencil shifts on structured meshes, one gather otherwise)."""
    xg = mesh.gather(x)                          # (N, K, 3)
    y = jnp.einsum("nab,nb->na", sys.A_diag, x,
                   preferred_element_type=jnp.float32)
    y += jnp.einsum("nkab,nkb->na", sys.A_off, xg,
                    preferred_element_type=jnp.float32)
    return y


def scalar_spmv(P_diag: jnp.ndarray, P_off: jnp.ndarray, mesh,
                x: jnp.ndarray) -> jnp.ndarray:
    """y = P x with x of shape (N,) — the scalar pressure (Schur) operator."""
    xg = mesh.gather(x)                          # (N, K)
    return P_diag * x + jnp.sum(P_off * xg, axis=1)
