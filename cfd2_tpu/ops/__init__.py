"""Linear-algebra ops: block-ELL SpMV, FGMRES, Schur preconditioner, AMG."""

from .blockell import BlockSystem, block_spmv, scalar_spmv
from .fgmres import FgmresResult, fgmres_solve
from .schur import schur_preconditioner

__all__ = [
    "BlockSystem", "block_spmv", "scalar_spmv",
    "fgmres_solve", "FgmresResult", "schur_preconditioner",
]
