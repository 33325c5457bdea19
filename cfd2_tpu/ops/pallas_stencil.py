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
    return pallas_level() >= 1


def pallas_level() -> int:
    """0 = jnp stencils (default); 1 = per-half-sweep RB-GS kernels;
    2 = fused V-cycle legs (one kernel per level per leg)."""
    raw = os.environ.get("CFD2_PALLAS", "0") or 0
    try:
        return int(raw)
    except ValueError:
        # A truthy-but-non-numeric value ("on", "true", "1.5") silently
        # running the jnp path would defeat the user's intent — warn once.
        import warnings
        warnings.warn(
            f"CFD2_PALLAS={raw!r} is not an integer; expected 0/1/2 — "
            "falling back to the jnp stencil path (level 0)",
            RuntimeWarning, stacklevel=2)
        return 0


# ----------------------------------------------------------------------
# Fused V-cycle leg: 2*sweeps RB-GS half-sweeps (+ optionally the residual)
# in ONE kernel launch per level.
#
# The per-half-sweep kernel above still leaves the V-cycle as ~4 Pallas
# launches + an XLA spmv chain per level; fusing a full smooth (both colors)
# and the down-leg residual into one kernel reads the 5 stencil planes once
# per leg instead of once per half-sweep and collapses the Schur apply's
# dominant op count (VERDICT r3 #3's "mega-kernel" item).  Halo rows are
# computed redundantly per row-block: each half-sweep consumes one valid halo
# row per side and the residual one more, so a slab staged with H >=
# 2*sweeps+1 rows of halo yields exact interior values with no cross-block
# communication.  Global-edge clamping is applied explicitly per read
# (``rows == 0`` / ``rows == ny-1`` overrides), so the numerics match
# _GridOps.smooth_rbgs2 / spmv2 elementwise for any sweep count.


def _fused_rbgs_kernel(x_hbm, d_hbm, oe_hbm, ow_hbm, on_hbm, os_hbm, b_hbm,
                       *refs, block_rows, halo, nxp, ny, nx, sweeps,
                       residual):
    if residual:
        x_out, r_out = refs[0], refs[1]
        scr = refs[2:9]
        sems = refs[9:16]
    else:
        x_out = refs[0]
        scr = refs[1:8]
        sems = refs[8:15]
    i = pl.program_id(0)
    srcs = (x_hbm, d_hbm, oe_hbm, ow_hbm, on_hbm, os_hbm, b_hbm)
    copies = [pltpu.make_async_copy(
        src.at[pl.ds(i * block_rows, block_rows + 2 * halo)], dst, sem)
        for src, dst, sem in zip(srcs, scr, sems)]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    slab_rows = block_rows + 2 * halo
    rows = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, nxp), 0) \
        + i * block_rows - halo
    cols = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, nxp), 1)
    x = scr[0][:, :]
    d = scr[1][:, :]
    oe = scr[2][:, :]
    ow = scr[3][:, :]
    on = scr[4][:, :]
    os_ = scr[5][:, :]
    b = scr[6][:, :]
    dinv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 0.0)

    def sigma_of(x):
        # E/W are lane shifts, N/S sublane shifts; clamp at the GLOBAL grid
        # edges (not the slab edges) so every read matches _GridOps.shifts2.
        xe = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
        xw = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        xn = jnp.concatenate([x[1:], x[-1:]], axis=0)
        xs = jnp.concatenate([x[:1], x[:-1]], axis=0)
        xe = jnp.where(cols == nx - 1, x, xe)
        xw = jnp.where(cols == 0, x, xw)
        xn = jnp.where(rows == ny - 1, x, xn)
        xs = jnp.where(rows == 0, x, xs)
        return oe * xe + ow * xw + on * xn + os_ * xs

    inside = (rows >= 0) & (rows < ny) & (cols < nx)
    for _ in range(sweeps):
        for par in (0, 1):
            x_new = dinv * (b - sigma_of(x))
            upd = (jnp.mod(rows + cols + par, 2) == 0) & inside
            x = jnp.where(upd, x_new, x)
    x_out[:] = x[halo:halo + block_rows, :]
    if residual:
        r = b - (d * x + sigma_of(x))
        r_out[:] = r[halo:halo + block_rows, :]


@functools.partial(jax.jit, static_argnames=("grid_shape", "sweeps",
                                             "residual", "interpret"))
def fused_rbgs2(xg, diag2, off2, bg, grid_shape, sweeps=1, residual=False,
                interpret=False):
    """Fused RB-GS smooth (``sweeps`` full sweeps = 2*sweeps half-sweeps) on
    2D grid-form inputs; with ``residual=True`` also returns ``b - A x`` for
    the smoothed x.  One Pallas launch total.

    ``xg``/``diag2``/``bg``: (ny, nx); ``off2``: (4, ny, nx) slots E,W,N,S.
    Elementwise-identical to _GridOps.smooth_rbgs2 (+ spmv2) — pinned by
    tests/test_pallas.py.
    """
    ny, nx = grid_shape
    halo = 4 * ((2 * sweeps + 1 + 3) // 4)
    nxp = _round_up(nx, 128)
    block_rows = min(_round_up(ny, 8),
                     max(8, (512 * 1024 // max(nxp * 4, 1)) // 8 * 8))
    ny_pad = _round_up(ny, block_rows)

    def padz(g):
        return jnp.pad(g, ((halo, halo + ny_pad - ny), (0, nxp - nx)))

    # x pads edge-replicated so slab-edge reads stay finite; pad values are
    # never *used* (global-edge clamps override them, coefficient pads are
    # zero) but NaN/inf garbage would still poison 0*x products.
    xpad = jnp.pad(xg, ((halo, halo + ny_pad - ny), (0, nxp - nx)),
                   mode="edge")
    n_blocks = ny_pad // block_rows
    blk = lambda: pl.BlockSpec((block_rows, nxp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((ny_pad, nxp), xg.dtype)]
    out_specs = [blk()]
    if residual:
        out_shape.append(jax.ShapeDtypeStruct((ny_pad, nxp), xg.dtype))
        out_specs.append(blk())
    out = pl.pallas_call(
        functools.partial(_fused_rbgs_kernel, block_rows=block_rows,
                          halo=halo, nxp=nxp, ny=ny, nx=nx, sweeps=sweeps,
                          residual=residual),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((block_rows + 2 * halo, nxp), xg.dtype)] * 7
            + [pltpu.SemaphoreType.DMA] * 7),
        interpret=interpret,
    )(xpad, padz(diag2), padz(off2[0]), padz(off2[1]), padz(off2[2]),
      padz(off2[3]), padz(bg))
    if residual:
        return out[0][:ny, :nx], out[1][:ny, :nx]
    return out[0][:ny, :nx]
