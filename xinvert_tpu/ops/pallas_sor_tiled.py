# -*- coding: utf-8 -*-
"""Tiled communication-avoiding multi-sweep SOR for grids larger than VMEM.

The VMEM-resident kernel (pallas_sor.py) needs the whole problem on-chip.
For ocean-scale grids (2048^2+) this kernel instead tiles the y axis: each
program DMAs a row window WITH a halo of ``2 * radius * k_sweeps`` rows,
runs ``k_sweeps`` full red-black iterations locally, and writes back only
the interior rows — which are bit-exact equal to ``k_sweeps`` global
iterations, because one full iteration propagates information at most
``2 * radius`` rows (radius = max |offset|; red half + black half).

HBM traffic per sweep drops from ~(K+5) planes (the XLA roll path re-reads
every plane per color) to ~(K+5)/k_sweeps plane-equivalents plus halo
overhead — the speed-of-light design for the memory-bound large-grid case.

x stays unsplit (wrap-around periodic handled by pltpu.roll); only 2-D
specs are supported, matching the reference's large-grid workloads.

DEPLOYMENT NOTE: the kernel is validated bit-exact against the XLA path in
interpret mode (tests/test_pallas_tiled.py), but the TPU compile stack in
this environment stack-allocates manual-DMA pallas RESULTS in the same
16 MiB scoped-VMEM budget as kernel scratch — regardless of HBM memory-space
tags on the out_shape aval, blocked out_specs, or input/output aliasing —
so any result too large for VMEM cannot compile, which defeats the purpose
of this kernel.  ``tiled_applicable`` therefore returns False and the
solver never auto-dispatches here; revisit when the compiler honors
HBM-space pallas outputs.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sor import _roll2

__all__ = ["sor_sweeps_tiled", "tiled_applicable"]


def _radius(offsets):
    return max(max(abs(o) for o in off) for off in offsets)


def tiled_applicable(spec, S_shape) -> bool:
    # disabled on this deployment's compile stack — see module docstring
    return False


def _kernel(w_hbm, w0_hbm, g_hbm, rr_hbm, rb_hbm, s_hbm, out_ref,
            w_v, w0_v, g_v, rr_v, rb_v, s_v, sem,
            *, offsets, k_sweeps, extend_y, periodic_x, bih,
            tile, halo, ny, nx):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    K = len(offsets)
    win = tile + 2 * halo

    # window start, clamped into the domain; global row of local row r is
    # start + r.  tile, halo and ny are all multiples of the sublane tiling
    # (8), so every slice start is too — tell Mosaic.
    start = pl.multiple_of(jnp.clip(t * tile - halo, 0, ny - win), 8)

    def copy_in(src, dst):
        cp = pltpu.make_async_copy(src.at[pl.ds(start, win)], dst, sem)
        cp.start()
        cp.wait()

    copy_in(w0_hbm, w0_v)
    copy_in(g_hbm, g_v)
    copy_in(rr_hbm, rr_v)
    copy_in(rb_hbm, rb_v)
    copy_in(s_hbm, s_v)
    cpw = pltpu.make_async_copy(w_hbm.at[:, pl.ds(start, win)], w_v, sem)
    cpw.start()
    cpw.wait()

    w = [w_v[k] for k in range(K)]
    w0 = w0_v[:]
    g = g_v[:]
    rr = rr_v[:]
    rb = rb_v[:]

    # global row index of each window row; the clamp may make the window
    # overlap rows another tile owns — those compute too but are discarded
    # at write-back
    row_g = jax.lax.broadcasted_iota(jnp.int32, (win, nx), 0) + start

    def one_sweep(_, S):
        if extend_y:
            # extend rows exist only at global rows 0 / ny-1; apply the
            # single-device mask-wise pre-pass on the window — its row
            # conditions are computed from global rows
            S = _extend_windowed(S, row_g, ny, nx, periodic_x, bih)
        for rel in (rr, rb):
            acc = g
            for k in range(K):
                acc = acc + w[k] * _roll2(S, offsets[k])
            S = S + rel * (acc + w0 * S)
        return S

    S = jax.lax.fori_loop(0, k_sweeps, one_sweep, s_v[:])

    # write back this tile's interior rows [t*tile, t*tile + tile) through
    # the pipelined VMEM output block; value-level dynamic_slice is not
    # lowerable on TPU, so the dynamic window offset goes through the
    # scratch ref (dynamic pl.ds reads on refs are supported)
    loc = pl.multiple_of(t * tile - start, 8)
    s_v[:] = S
    out_ref[:] = s_v[pl.ds(loc, tile), :]


def _extend_windowed(S, row_g, ny, nx, periodic_x, bih):
    """Extend pre-pass on a row window using global row indices."""
    col = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    up1 = _roll2(S, (1, 0))
    dn1 = _roll2(S, (-1, 0))

    def colfix(a, width):
        if periodic_x:
            return a
        out = a
        for wd in range(1, width + 1):
            out = jnp.where(col == wd - 1, _roll2(a, (0, width - wd + 1)), out)
            out = jnp.where(col == nx - wd, _roll2(a, (0, -(width - wd + 1))),
                            out)
        return out

    if not bih:
        top = colfix(up1, 1)
        bot = colfix(dn1, 1)
        S = jnp.where(row_g == 0, top, S)
        S = jnp.where(row_g == ny - 1, bot, S)
        return S

    up2 = _roll2(S, (2, 0))
    dn2 = _roll2(S, (-2, 0))
    if periodic_x:
        top = up1
    else:
        top = colfix(jnp.where(row_g == 0, up2, up1), 2)
    bot = jnp.where(row_g == ny - 1, dn2, dn1)
    if not periodic_x:
        bot = colfix(bot, 2)
    S = jnp.where(row_g <= 1, top, S)
    S = jnp.where(row_g >= ny - 2, bot, S)
    return S


@functools.partial(jax.jit,
                   static_argnames=("n_sweeps", "k_sweeps", "tile",
                                    "interpret"))
def sor_sweeps_tiled(spec, S, omega, n_sweeps: int, k_sweeps: int = 4,
                     tile: int = 128, interpret: bool = False):
    """Run n_sweeps iterations via chunks of k_sweeps fused tiled sweeps.

    Bit-exact equal to ``solve_fixed`` when ``ny % tile == 0`` and
    n_sweeps % k_sweeps == 0 (asserted).  The per-chunk pallas launch
    double-buffers tiles across programs via the implicit pipeline.
    """
    ny, nx = S.shape[-2:]
    if S.ndim != 2:
        raise ValueError("tiled kernel supports unbatched 2-D problems")
    if ny % tile or n_sweeps % k_sweeps:
        raise ValueError("ny must divide by tile, n_sweeps by k_sweeps")
    if tile % 8:
        raise ValueError("tile must be a multiple of the sublane tiling (8)")
    radius = _radius(spec.offsets)
    halo = 2 * radius * k_sweeps
    halo = -(-halo // 8) * 8          # round up to the (8,128) sublane tiling
    win = tile + 2 * halo
    if win > ny:
        raise ValueError("window exceeds grid; lower k_sweeps or raise tile")

    dtype = S.dtype
    from ..solver import _color_relax
    rr, rb = _color_relax(spec, jnp.asarray(omega, dtype))
    K = len(spec.offsets)

    def full(a):
        if a.ndim > 2:   # squeeze size-1 batch dims
            a = a.reshape(a.shape[-2:])
        return jnp.broadcast_to(a, (ny, nx)).astype(dtype)

    w = spec.w.astype(dtype)
    if w.ndim > 3:
        w = w.reshape((w.shape[0],) + w.shape[-2:])
    args = (w, full(spec.w0), full(spec.g), full(rr), full(rb))

    kern = functools.partial(
        _kernel,
        offsets=tuple(tuple(int(x) for x in o) for o in spec.offsets),
        k_sweeps=k_sweeps,
        extend_y=spec.bcs[-2] == "extend",
        periodic_x=spec.bcs[-1] == "periodic",
        bih=spec.bih, tile=tile, halo=halo, ny=ny, nx=nx,
    )

    grid = (ny // tile,)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        # pipelined VMEM blocks for the output, with the full result aval
        # tagged HBM — an untagged or ANY-space output gets stack-allocated
        # by XLA in scoped VMEM, which OOMs for ocean-scale grids
        out_specs=pl.BlockSpec((tile, nx), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=pltpu.HBM((ny, nx), dtype),
        scratch_shapes=[
            pltpu.VMEM((K, win, nx), dtype),
            pltpu.VMEM((win, nx), dtype),
            pltpu.VMEM((win, nx), dtype),
            pltpu.VMEM((win, nx), dtype),
            pltpu.VMEM((win, nx), dtype),
            pltpu.VMEM((win, nx), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )

    for _ in range(n_sweeps // k_sweeps):
        S = call(*args, S)
    return S
