"""Pallas TPU kernel: red-black Gauss-Seidel half-sweep on the structured grid.

One colored half-sweep of the 5-point pressure stencil as a single fused
kernel: the x slab (with one halo row each side) is DMA-staged from HBM into
VMEM scratch per row-block, the four neighbor reads become static VMEM
slices, and the colored update is masked elementwise — one kernel launch per
half-sweep instead of the ~6 XLA kernels of the jnp formulation.  This
matters in the launch-latency-bound regime (small/medium grids through the
device tunnel); the jnp path (ops/amg._GridOps.smooth_rbgs) remains the
default and the numerics are identical (tests compare them elementwise).

Enable inside the multigrid with CFD2_PALLAS=1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_HALO = 4  # rows of halo padding each side; keeps DMA slabs 8-row aligned


def _rbgs_half_sweep_kernel(xpad_ref, diag_ref, oe_ref, ow_ref, on_ref,
                            os_ref, b_ref, parity_ref, out_ref,
                            scratch, sem, *, block_rows, nx):
    i = pl.program_id(0)
    # Stage the x slab (block rows + _HALO rows each side) HBM -> VMEM.
    # Slab starts at i*block_rows (8-aligned) and spans block_rows + 2*_HALO
    # rows (8-aligned) — Mosaic requires 8-row tile alignment on DMA slices.
    copy = pltpu.make_async_copy(
        xpad_ref.at[pl.ds(i * block_rows, block_rows + 2 * _HALO)],
        scratch, sem)
    copy.start()
    copy.wait()

    xc = scratch[_HALO:_HALO + block_rows, :]
    xn = scratch[_HALO + 1:_HALO + block_rows + 1, :]
    xs = scratch[_HALO - 1:_HALO + block_rows - 1, :]
    xe = jnp.concatenate([xc[:, 1:], xc[:, -1:]], axis=1)
    xw = jnp.concatenate([xc[:, :1], xc[:, :-1]], axis=1)

    sigma = (oe_ref[:] * xe + ow_ref[:] * xw
             + on_ref[:] * xn + os_ref[:] * xs)
    diag = diag_ref[:]
    dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 0.0)
    x_new = dinv * (b_ref[:] - sigma)

    # Checkerboard parity of each cell: (global_row + col + parity) % 2 == 0.
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, nx), 0) \
        + i * block_rows
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_rows, nx), 1)
    update = ((rows + cols + parity_ref[0]) % 2) == 0
    out_ref[:] = jnp.where(update, x_new, xc)


def _round_up(v, m):
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("grid_shape", "interpret"))
def rbgs_half_sweep(x, diag, off, b, parity, grid_shape, interpret=False):
    """One colored half-sweep: relax cells with (j+i+parity) even.

    ``x``/``diag``/``b``: (n,) flat fields; ``off``: (n, 4) slots [E,W,N,S].
    Returns the updated flat x.
    """
    ny, nx = grid_shape
    # Mosaic DMA slices must be lane-aligned: run the kernel at a width
    # padded to a multiple of 128.  x pads edge-replicated (so the E clamp at
    # the true right edge still reads its own value); coefficients pad with
    # zeros, so padded-column updates are inert and sliced away.
    nxp = _round_up(nx, 128)
    block_rows = min(_round_up(ny, 8),
                     max(8, (512 * 1024 // max(nxp * 4, 1)) // 8 * 8))
    ny_pad = _round_up(ny, block_rows)

    def grid2(v):
        g = v.reshape(ny, nx)
        return jnp.pad(g, ((0, ny_pad - ny), (0, nxp - nx)))

    xpad = jnp.pad(x.reshape(ny, nx),
                   ((_HALO, _HALO + ny_pad - ny), (0, nxp - nx)),
                   mode="edge")
    og = off.reshape(ny, nx, 4)
    og = jnp.pad(og, ((0, ny_pad - ny), (0, nxp - nx), (0, 0)))

    n_blocks = ny_pad // block_rows
    blk = lambda: pl.BlockSpec((block_rows, nxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rbgs_half_sweep_kernel,
                          block_rows=block_rows, nx=nxp),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # xpad (DMA'd manually)
            blk(),                                      # diag
            blk(), blk(), blk(), blk(),                 # off E/W/N/S
            blk(),                                      # b
            pl.BlockSpec(memory_space=pltpu.SMEM),      # parity scalar
        ],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((ny_pad, nxp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2 * _HALO, nxp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad, grid2(diag), og[:, :, 0], og[:, :, 1], og[:, :, 2], og[:, :, 3],
      grid2(b), jnp.asarray([parity], jnp.int32))
    return out[:ny, :nx].reshape(-1)


def smooth_rbgs_pallas(grid_shape, diag, off, x, b, sweeps=1,
                       interpret=None):
    """Drop-in replacement for _GridOps.smooth_rbgs using the Pallas kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    for _ in range(sweeps):
        for parity in (0, 1):
            x = rbgs_half_sweep(x, diag, off[:, :4], b, parity, grid_shape,
                                interpret=interpret)
    return x


def pallas_enabled() -> bool:
    return os.environ.get("CFD2_PALLAS", "0") == "1"
