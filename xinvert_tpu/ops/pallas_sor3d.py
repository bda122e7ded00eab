# -*- coding: utf-8 -*-
"""Fused multi-sweep red-black SOR for 3-D problems, VMEM-resident.

The 3-D families (standard_3d / general_3d — the QG-omega and 3-D ocean
inverters, reference numbas.py:16-212 and :746-984) are radius-1, 6-offset
stencils.  The flagship 37x72x288 omega problem is ~3 MB per plane; the
full working set (6 weight planes + w0/g/relax + state) is ~40 MB — larger
than the default 16 MiB scoped-VMEM allowance but comfortably inside the
raised budget the windowed 2-D kernel already validated on the v5e
(ops/pallas_sor_window.py: ``xla_tpu_scoped_vmem_limit_kib=98304``).  So
the whole 3-D problem stays resident in VMEM for the entire sweep loop:
weights stream HBM->VMEM once per solve, then every sweep runs at VPU
speed, exactly like the 2-D VMEM kernel (ops/pallas_sor.py) but with
3-axis rolls and the interior-z 'extend' pre-pass.

Batch slices map onto the Pallas grid so slice k+1's HBM transfer overlaps
slice k's sweeps.  Larger 3-D grids fall back to the XLA roll path.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sor_window import WINDOW_COMPILER_OPTS, _SCOPED_VMEM_KIB

__all__ = ["sor_sweeps_pallas3d", "pallas3d_applicable"]

# working set must fit the raised scoped-VMEM budget with headroom for the
# roll temporaries Mosaic materializes inside the sweep loop
VMEM3D_BUDGET = int(_SCOPED_VMEM_KIB * 1024 * 0.75)


def _roll3(a, off):
    """a[k+dz, j+dy, i+dx] with wrap-around on the three axes."""
    dz, dy, dx = off
    if dz:
        a = pltpu.roll(a, -dz % a.shape[0], 0)
    if dy:
        a = pltpu.roll(a, -dy % a.shape[1], 1)
    if dx:
        a = pltpu.roll(a, -dx % a.shape[2], 2)
    return a


def _extend_rows3d(S, periodic_x):
    """Per-iteration 'extend' pre-pass for 3-D: y-boundary rows copy the
    nearest interior row on INTERIOR z levels only, with corner clamping
    when x is not periodic (mirrors solver._apply_extend's nd==3 branch,
    itself modeled on the reference numbas.py:87-115).  Source rows come
    from STATIC single-row slices — no full-volume rolls."""
    nz, ny, nx = S.shape
    lev = jax.lax.broadcasted_iota(jnp.int32, S.shape, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)

    def fix_row(r):                    # (nz, 1, nx) corner clamp
        if periodic_x:
            return r
        out = jnp.where(col1 == 0, pltpu.roll(r, nx - 1, 2), r)
        return jnp.where(col1 == nx - 1, pltpu.roll(r, 1, 2), out)

    interior_z = jnp.logical_and(lev > 0, lev < nz - 1)
    S = jnp.where(jnp.logical_and(row == 0, interior_z),
                  fix_row(S[:, 1:2, :]), S)
    S = jnp.where(jnp.logical_and(row == ny - 1, interior_z),
                  fix_row(S[:, ny - 2:ny - 1, :]), S)
    return S


def _kernel(n_ref, w_ref, w0_ref, g_ref, rr_ref, rb_ref, s_ref, out_ref, *,
            offsets, extend_y, periodic_x):
    K = len(offsets)

    def one_sweep(_, S):
        if extend_y:
            S = _extend_rows3d(S, periodic_x)
        for rel_ref in (rr_ref, rb_ref):
            # weight refs are read transiently per use: hoisting value
            # copies of the K+4 volumes out of the loop spills VMEM
            acc = g_ref[0]
            for k in range(K):
                acc = acc + w_ref[0, k] * _roll3(S, offsets[k])
            S = S + rel_ref[0] * (acc + w0_ref[0] * S)
        return S

    # dynamic trip count from SMEM: one compiled kernel serves every sweep
    # count (each new jit shape costs minutes through the compile relay)
    out_ref[0] = jax.lax.fori_loop(0, n_ref[0], one_sweep, s_ref[0])


def pallas3d_applicable(spec, S_shape) -> bool:
    """3-D spec whose per-slice working set fits the raised VMEM budget."""
    if spec.ndim != 3:
        return False
    nz, ny, nx = S_shape[-3:]
    K = len(spec.offsets)
    itemsize = np.dtype(spec.w0.dtype).itemsize
    # K weights + w0/g/rr/rb + S in/out + ~4 roll temporaries live at peak
    planes = K + 10
    return planes * nz * ny * nx * itemsize < VMEM3D_BUDGET


def _impl(spec, S, omega, n_sweeps, interpret: bool = False):
    nz, ny, nx = S.shape[-3:]
    batch_shape = S.shape[:-3]
    B = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    dtype = S.dtype

    from ..solver import _color_relax
    rr, rb = _color_relax(spec, jnp.asarray(omega, dtype))

    K = len(spec.offsets)

    def norm(a):
        """(B or 1, nz, ny, nx) view of a possibly-unbatched volume."""
        return a.reshape(((B,) if a.ndim > 3 else (1,)) + (nz, ny, nx))

    if spec.w.ndim == 4:
        wB = spec.w.reshape((1, K, nz, ny, nx))
    else:
        wB = jnp.moveaxis(spec.w.reshape((K, B, nz, ny, nx)), 0, 1)
    w0B, gB, rrB, rbB = norm(spec.w0), norm(spec.g), norm(rr), norm(rb)
    SB = S.reshape((B, nz, ny, nx))

    def idx4(b):
        return (lambda i: (0, 0, 0, 0)) if b == 1 else (
            lambda i: (i, 0, 0, 0))

    kern = functools.partial(
        _kernel,
        offsets=tuple(tuple(int(x) for x in o) for o in spec.offsets),
        extend_y=spec.bcs[-2] == "extend",
        periodic_x=spec.bcs[-1] == "periodic",
    )

    nS = jnp.reshape(jnp.asarray(n_sweeps, jnp.int32), (1,))
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, nz, ny, nx),
                         (lambda i: (0, 0, 0, 0, 0)) if wB.shape[0] == 1
                         else (lambda i: (i, 0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, ny, nx), idx4(w0B.shape[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, ny, nx), idx4(gB.shape[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, ny, nx), idx4(rrB.shape[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, ny, nx), idx4(rbB.shape[0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, ny, nx), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nz, ny, nx), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nz, ny, nx), dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nS, wB, w0B, gB, rrB, rbB, SB)
    return out.reshape(S.shape)


_jit_plain = jax.jit(_impl, static_argnames=("interpret",))
_jit_tpu = jax.jit(_impl, static_argnames=("interpret",),
                   compiler_options=WINDOW_COMPILER_OPTS)


def sor_sweeps_pallas3d(spec, S, omega, n_sweeps, interpret: bool = False):
    """Run n_sweeps full red-black iterations on a VMEM-resident 3-D problem.

    Bit-identical to ``solve_fixed``'s XLA path (validated in
    tests/test_pallas3d.py); batched over leading dims via the Pallas grid.
    ``n_sweeps`` may be a traced scalar (read from SMEM in-kernel).

    On TPU the top-level jit carries the raised scoped-VMEM compiler option;
    when inlined into an outer trace (the solve driver carries the option
    itself) or off-TPU, the plain jit is used.
    """
    nested = isinstance(S, jax.core.Tracer)
    use_tpu_opts = (not interpret and not nested
                    and jax.default_backend() == "tpu")
    fn = _jit_tpu if use_tpu_opts else _jit_plain
    return fn(spec, S, omega, n_sweeps, interpret=interpret)
