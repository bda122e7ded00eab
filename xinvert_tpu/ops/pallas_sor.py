# -*- coding: utf-8 -*-
"""Fused multi-sweep red-black SOR as a Pallas TPU kernel.

The XLA roll-based sweep (:mod:`xinvert_tpu.solver`) re-reads every weight
plane from HBM twice per iteration (once per color).  SOR is memory-bound, so
the speed-of-light design keeps the whole per-slice problem resident in VMEM
and runs MANY sweeps per kernel launch: weights stream HBM->VMEM once, then
``n_sweeps`` iterations run at VPU compute speed.  Batch slices (the
reference's `loop_noncore` time loop, core.py:129-139) map onto the Pallas
grid, so the HBM transfer of slice k+1 overlaps the sweeps of slice k via the
standard Pallas pipeline.

Applicability: 2-D stencil families whose per-slice planes fit the VMEM
budget (all bundled gallery problems qualify: 73x144, 201x301, 99x73, ...).
Larger grids and 3-D problems use the XLA path; the solver driver picks
automatically.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sor_sweeps_pallas", "pallas_applicable", "VMEM_BUDGET"]

VMEM_BUDGET = 12 * 1024 * 1024     # leave headroom below the ~16 MB/core VMEM


def _roll2(a, off):
    """a[j+dy, i+dx] with wrap-around on the two axes of a 2-D array."""
    dy, dx = off
    if dy:
        a = pltpu.roll(a, -dy % a.shape[0], 0)
    if dx:
        a = pltpu.roll(a, -dx % a.shape[1], 1)
    return a


def _extend_rows(S, periodic_x, bih):
    """Per-iteration 'extend' pre-pass, mask-wise.

    Mirrors solver._apply_extend (itself modeled on numbas.py:284-310 and
    :1299-1343): one ring (two for biharmonic) of y-boundary rows copies the
    nearest interior row, with corner clamping when x is not periodic.
    The plane is whole-problem resident, so the non-biharmonic pass uses
    STATIC single-row slices (no full-plane rolls — the rolls cost ~2 of
    the sweep's ~10 plane copies)."""
    ny, nx = S.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)

    if not bih:
        col1 = jax.lax.broadcasted_iota(jnp.int32, (1, nx), 1)

        def fix_row(r):
            if periodic_x:
                return r
            out = jnp.where(col1 == 0, pltpu.roll(r, nx - 1, 1), r)
            return jnp.where(col1 == nx - 1, pltpu.roll(r, 1, 1), out)

        S = jnp.where(row == 0, fix_row(S[1:2, :]), S)
        return jnp.where(row == ny - 1, fix_row(S[ny - 2:ny - 1, :]), S)

    up1 = _roll2(S, (1, 0))    # S[j+1, i]
    dn1 = _roll2(S, (-1, 0))   # S[j-1, i]

    up2 = _roll2(S, (2, 0))
    dn2 = _roll2(S, (-2, 0))
    if periodic_x:
        # sequential reference semantics: S[0]=old S[1], S[1]=old S[2];
        # S[-1]=S[-2]=old S[-3]
        top = up1                                   # row0->S[1], row1->S[2]
        bot = jnp.where(row == ny - 1, dn2, dn1)    # both -> S[-3]
    else:
        top = jnp.where(row == 0, up2, up1)         # both rows -> S[2]
        bot = jnp.where(row == ny - 1, dn2, dn1)    # both rows -> S[-3]
        # corner 2x2 blocks clamp to the nearest interior column (col 2 /
        # col nx-3) of the source row
        top = jnp.where(col == 0, _roll2(top, (0, 2)),
                        jnp.where(col == 1, _roll2(top, (0, 1)), top))
        top = jnp.where(col == nx - 1, _roll2(top, (0, -2)),
                        jnp.where(col == nx - 2, _roll2(top, (0, -1)), top))
        bot = jnp.where(col == 0, _roll2(bot, (0, 2)),
                        jnp.where(col == 1, _roll2(bot, (0, 1)), bot))
        bot = jnp.where(col == nx - 1, _roll2(bot, (0, -2)),
                        jnp.where(col == nx - 2, _roll2(bot, (0, -1)), bot))
    return jnp.where(row <= 1, top, jnp.where(row >= ny - 2, bot, S))


def _kernel(n_ref, w_ref, w0_ref, g_ref, rr_ref, rb_ref, s_ref, out_ref, *,
            offsets, extend_y, periodic_x, bih):
    K = len(offsets)
    w = [w_ref[0, k] for k in range(K)]
    w0 = w0_ref[0]
    g = g_ref[0]
    rr = rr_ref[0]
    rb = rb_ref[0]

    def one_sweep(_, S):
        if extend_y:
            S = _extend_rows(S, periodic_x, bih)
        for rel in (rr, rb):
            acc = g
            for k in range(K):
                acc = acc + w[k] * _roll2(S, offsets[k])
            S = S + rel * (acc + w0 * S)
        return S

    # dynamic trip count from SMEM: one compiled kernel serves every sweep
    # count (the remote-compile relay makes each new jit shape cost minutes)
    out_ref[0] = jax.lax.fori_loop(0, n_ref[0], one_sweep, s_ref[0])


def pallas_applicable(spec, S_shape) -> bool:
    """2-D spec whose per-slice planes fit the VMEM budget.

    The extend pre-pass is only exercised on the y (second-to-last) dim —
    matching the reference kernels — which the 2-D restriction guarantees.
    """
    if spec.ndim != 2:
        return False
    ny, nx = S_shape[-2:]
    k = len(spec.offsets)
    itemsize = np.dtype(spec.w0.dtype).itemsize
    planes = k + 7            # w..., w0, g, rr, rb, S in + out + slack
    return planes * ny * nx * itemsize < VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def sor_sweeps_pallas(spec, S, omega, n_sweeps, interpret: bool = False):
    """Run n_sweeps full red-black iterations; batched over leading dims.

    Bit-identical semantics to ``solve_fixed`` (solver.py) — validated in
    tests/test_pallas.py — with the per-slice problem VMEM-resident for the
    whole sweep loop.  ``n_sweeps`` may be a traced scalar: the count is
    read from SMEM inside the kernel, so one compile serves all counts.
    """
    ny, nx = S.shape[-2:]
    batch_shape = S.shape[:-2]
    B = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    dtype = S.dtype

    from ..solver import _color_relax
    rr, rb = _color_relax(spec, jnp.asarray(omega, dtype))

    K = len(spec.offsets)

    def norm(a):
        """(B or 1, ny, nx) view of a possibly-unbatched plane."""
        return a.reshape(((B,) if a.ndim > 2 else (1,)) + (ny, nx))

    if spec.w.ndim == 3:
        wB = spec.w.reshape((1, K, ny, nx))
    else:
        wB = jnp.moveaxis(spec.w.reshape((K, B, ny, nx)), 0, 1)
    w0B, gB, rrB, rbB = norm(spec.w0), norm(spec.g), norm(rr), norm(rb)
    SB = S.reshape((B, ny, nx))

    def idx3(b):
        return (lambda i: (0, 0, 0)) if b == 1 else (lambda i: (i, 0, 0))

    kern = functools.partial(
        _kernel,
        offsets=tuple(tuple(int(x) for x in o) for o in spec.offsets),
        extend_y=spec.bcs[-2] == "extend",
        periodic_x=spec.bcs[-1] == "periodic",
        bih=spec.bih,
    )

    nS = jnp.reshape(jnp.asarray(n_sweeps, jnp.int32), (1,))
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, ny, nx),
                         (lambda i: (0, 0, 0, 0)) if wB.shape[0] == 1
                         else (lambda i: (i, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), idx3(w0B.shape[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), idx3(gB.shape[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), idx3(rrB.shape[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), idx3(rbB.shape[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ny, nx), dtype),
        interpret=interpret,
    )(nS, wB, w0B, gB, rrB, rbB, SB)
    return out.reshape(S.shape)
