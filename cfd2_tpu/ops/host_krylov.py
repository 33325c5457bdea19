"""Host-side GMRES fallback (debug/verification path).

Parity with the reference's legacy CPU-state GMRES variant
(src/solver/gpu/linear_solver/gmres.rs:15-178 — Hessenberg/Givens/triangular
solve on the CPU, used only as fallback scaffolding).  Here the same role is
filled by scipy's GMRES over a LinearOperator that calls the device SpMV;
useful for verifying the on-device FGMRES against an independent
implementation.
"""

from __future__ import annotations

import numpy as np


def host_gmres(matvec, b: np.ndarray, x0: np.ndarray | None = None,
               restart: int = 50, max_restarts: int = 20,
               tol: float = 1e-5):
    """Solve A x = b with scipy GMRES; ``matvec`` maps (n,) -> (n,) and may
    internally call jitted device code.  Returns (x, info)."""
    import scipy.sparse.linalg as spla

    b = np.asarray(b, dtype=np.float64).reshape(-1)
    n = b.shape[0]
    op = spla.LinearOperator(
        (n, n),
        matvec=lambda v: np.asarray(matvec(v.astype(np.float32)),
                                    dtype=np.float64).reshape(-1))
    x, info = spla.gmres(op, b,
                         x0=None if x0 is None else np.asarray(x0).reshape(-1),
                         restart=restart, maxiter=max_restarts, rtol=tol)
    return x, info
