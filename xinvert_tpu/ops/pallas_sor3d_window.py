# -*- coding: utf-8 -*-
"""Windowed communication-avoiding multi-sweep SOR for >VMEM 3-D problems.

The VMEM-resident 3-D kernel (pallas_sor3d.py) holds the whole volume
on-chip; the reference's deep-atmosphere omega workloads exceed that (the
11_Omega_equation notebook interpolates the 37-level case to 73 levels:
73 x 72 x 288 is a ~97 MB working set).  This kernel extends the 2-D
windowed ghost-zone design (pallas_sor_window.py) to the 3-D families
(standard_3d / general_3d, reference numbas.py:16-212 and :746-984 — both
radius-1, 6-offset stencils):

- the y (second-to-last) axis is tiled; each program's INPUT window is an
  overlapping ``Element``-indexed block of ``tile + 2*halo`` rows across
  the FULL z and x extents, with ``halo = 2*k_sweeps`` rounded to the
  sublane multiple (one red-black iteration propagates one row);
- window starts are clamped into the domain so every window holds genuine
  data; ``k_sweeps`` full iterations run in VMEM, then only the tile's own
  rows are written back (three static cases under ``pl.when``);
- z and x wrap-around rolls are harmless exactly as in the VMEM kernel:
  z-boundary cells are never updated (the reference's BCz-as-fixed
  semantics) and x wrap is either genuinely periodic or masked.

Batch slices map onto a leading grid dim; larger batches split into
batch-group calls bounded by the scoped-VMEM result cap.  Grids whose
per-slice volume exceeds the result cap (or whose ny is not a sublane
multiple) still fall back to the XLA roll path.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas import core as pallas_core

from .pallas_sor_window import (WINDOW_COMPILER_OPTS, _SCOPED_VMEM_KIB,
                                _RESULT_CAP, _CHUNK_TARGET, _MAX_CHUNKS,
                                _round8, _radius, WindowPlan)
from .pallas_sor3d import _roll3, pallas3d_applicable

__all__ = ["sor_sweeps_window3d", "window3d_applicable", "window3d_plan"]


# auto-dispatch gate; mirrors pallas_sor_window.WINDOW_AUTODISPATCH
WINDOW3D_AUTODISPATCH = True


def window3d_plan(spec, S_shape):
    """Pick a WindowPlan for a 3-D problem, or None.

    VMEM model in y-row units of ``nz * nx * itemsize`` bytes: the
    P = K+3 stacked coefficient windows plus S are double-buffered at
    window height by the pipeline and the output block at tile height; the
    stack-allocated result and the buffers share the raised scoped-VMEM
    budget.  Batch groups bound the per-call result by ``_CHUNK_TARGET``
    when the full batch exceeds the result cap.
    """
    if spec.ndim != 3:
        return None
    nz, ny, nx = S_shape[-3:]
    B = int(np.prod(S_shape[:-3], dtype=np.int64))
    if ny % 8 or ny < 24 or nz < 3:
        return None
    if _radius(spec.offsets) != 1:
        return None
    K = len(spec.offsets)
    P = K + 3
    itemsize = np.dtype(spec.w0.dtype).itemsize
    row_bytes = nz * nx * itemsize
    slab = ny * row_bytes                 # one batch slice's result bytes
    result = B * slab
    budget = int(_SCOPED_VMEM_KIB * 1024 * 0.85)

    tiles = [t for t in range(8, min(ny, 192) + 1, 8) if ny % t == 0]
    tiles.sort(reverse=True)

    for k in (4, 2, 1):
        halo = _round8(2 * k)
        for tile in tiles:
            if tile <= halo:
                # interior windows must stay clear of the domain-edge rows
                # and the three-case write-back assumes unclamped interior
                # starts — both require tile > halo
                continue
            win = tile + 2 * halo
            if win > ny:
                continue
            need = 2 * (P + 1) * win + 2 * tile
            if (result <= _RESULT_CAP
                    and need <= (budget - result) // row_bytes):
                return WindowPlan(tile, k, halo, ny, B)
            # batch-group splitting (no y-chunking for 3-D yet): per-call
            # result bounded by _CHUNK_TARGET
            if slab > _CHUNK_TARGET:
                continue
            if need > (budget - min(result, _CHUNK_TARGET)) // row_bytes:
                continue
            b_chunk = max(1, min(B, _CHUNK_TARGET // slab))
            if b_chunk >= B:
                continue
            if -(-B // b_chunk) > _MAX_CHUNKS:
                continue
            return WindowPlan(tile, k, halo, ny, b_chunk)
    return None


def window3d_applicable(spec, S_shape, for_dispatch: bool = False) -> bool:
    """True when the windowed 3-D path applies: a 3-D spec too large for
    the VMEM-resident kernel but with a feasible window plan."""
    if for_dispatch and not WINDOW3D_AUTODISPATCH:
        return False
    if pallas3d_applicable(spec, S_shape):
        return False
    return window3d_plan(spec, S_shape) is not None


def _kernel(n_ref, W_ref, s_ref, out_ref, *, K, offsets, tile, halo,
            nz, ny, nx, extend_y, periodic_x, dtype, n_static=None):
    """One grid program: k sweeps on an overlapping (nz, win, nx) window."""
    win = tile + 2 * halo
    t = pl.program_id(1)          # grid = (batch, tiles)
    n_t = pl.num_programs(1)
    start = jnp.clip(t * tile - halo, 0, ny - win)

    shape = (nz, win, nx)
    lev = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    row_l = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
    interior_z = jnp.logical_and(lev > 0, lev < nz - 1)

    def _fix_row(r):
        """Corner clamp of a single extended (nz, 1, nx) row."""
        if periodic_x:
            return r
        out = jnp.where(col1 == 0, pltpu.roll(r, nx - 1, 2), r)
        return jnp.where(col1 == nx - 1, pltpu.roll(r, 1, 2), out)

    def one_sweep(_, S):
        # weight refs are read transiently per use (hoisting value copies
        # of the K+3 plane-sets doubles live VMEM — the 2-D spill cliff)
        if extend_y:
            # extend rows via STATIC single-row slices: the clamped window
            # start pins domain row 0 to local row 0 of the first window
            # and domain ny-1 to local win-1 of the last.  3-D semantics:
            # interior z levels only (numbas.py:87-115).
            S = jax.lax.cond(
                t == 0,
                lambda s: jnp.where(
                    jnp.logical_and(row_l == 0, interior_z),
                    _fix_row(s[:, 1:2, :]), s),
                lambda s: s, S)
            S = jax.lax.cond(
                t == n_t - 1,
                lambda s: jnp.where(
                    jnp.logical_and(row_l == win - 1, interior_z),
                    _fix_row(s[:, win - 2:win - 1, :]), s),
                lambda s: s, S)
        parity = lev + (row_l + start) + col
        for color in (0, 1):
            acc = W_ref[0, K + 1]                  # g
            for k in range(K):
                acc = acc + W_ref[0, k] * _roll3(S, offsets[k])
            sel = ((parity % 2) == color).astype(dtype)
            r = W_ref[0, K + 2] * sel              # omega * relax * color
            S = S + r * (acc + W_ref[0, K] * S)
        return S

    if n_static is not None:
        # fully unrolled sweep loop — the fixed-iteration hot path
        S = s_ref[0]
        for i in range(n_static):
            S = one_sweep(i, S)
    else:
        S = jax.lax.fori_loop(0, n_ref[0], one_sweep, s_ref[0])

    first = t == 0
    last = t == n_t - 1

    @pl.when(jnp.logical_and(~first, ~last))
    def _():
        out_ref[0] = S[:, halo:halo + tile, :]

    @pl.when(first)
    def _():
        out_ref[0] = S[:, 0:tile, :]

    @pl.when(jnp.logical_and(last, ~first))
    def _():
        out_ref[0] = S[:, 2 * halo:2 * halo + tile, :]


def _stack_planes3(spec, rel, nz, ny, nx, dtype):
    """The (bW, K+3, nz, ny, nx) stacked coefficient volume (built once
    per solve call, outside the chunk loop — see pallas_sor_window's
    _stack_planes for the measured in-loop-build penalty)."""
    K = len(spec.offsets)

    def plane(a):
        a = jnp.asarray(a, dtype)
        a = a.reshape((-1,) + a.shape[-3:]) if a.ndim > 3 else a[None]
        return jnp.broadcast_to(a, (a.shape[0], nz, ny, nx))

    w = spec.w.astype(dtype)                     # (K, ...) maybe batched
    w = jnp.moveaxis(w.reshape((K, -1) + w.shape[-3:]), 0, 1)
    w0, g, r = plane(spec.w0), plane(spec.g), plane(rel)
    bW = max(w.shape[0], w0.shape[0], g.shape[0], r.shape[0])

    def bcast(a):
        return jnp.broadcast_to(a, (bW,) + a.shape[1:])

    return jnp.concatenate([bcast(w), bcast(w0)[:, None], bcast(g)[:, None],
                            bcast(r)[:, None]], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k_sweeps", "tile", "interpret",
                                    "n_static"))
def _window3d_call(spec, W, S, n, k_sweeps: int, tile: int,
                   interpret: bool = False, n_static=None):
    """One pallas launch running ``n`` (<= k_sweeps) full iterations on
    (B, nz, ny, nx); batch slices map onto the leading grid dim."""
    B, nz, ny, nx = S.shape
    dtype = S.dtype
    halo = _round8(2 * k_sweeps)
    win = tile + 2 * halo
    K = len(spec.offsets)
    bW = W.shape[0]

    kern = functools.partial(
        _kernel,
        K=K,
        offsets=tuple(tuple(int(x) for x in o) for o in spec.offsets),
        tile=tile, halo=halo, nz=nz, ny=ny, nx=nx,
        extend_y=spec.bcs[-2] == "extend",
        periodic_x=spec.bcs[-1] == "periodic",
        dtype=dtype, n_static=n_static,
    )

    def _start(t):
        # tile, halo, ny and win are all sublane multiples, so every
        # clamped window start is too — Mosaic cannot prove that through
        # the clip, hence the explicit hint
        return pl.multiple_of(jnp.clip(t * tile - halo, 0, ny - win), 8)

    def wmap(b, t):
        return ((b if bW > 1 else 0), 0, 0, _start(t), 0)

    def smap(b, t):
        return (b, 0, _start(t), 0)

    nS = jnp.reshape(jnp.asarray(n, jnp.int32), (1,))
    Element = pallas_core.Element
    return pl.pallas_call(
        kern,
        grid=(B, ny // tile),
        in_specs=[
            pl.BlockSpec((1,), lambda b, t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((Element(1), Element(K + 3), Element(nz),
                          Element(win), Element(nx)), wmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Element(1), Element(nz), Element(win),
                          Element(nx)), smap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nz, tile, nx), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nz, ny, nx), dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nS, W, S)


def _run_group(spec, S, omega, n_sweeps, plan, interpret):
    """Solve one batch group: n_sweeps iterations on (B, nz, ny, nx)."""
    tile, k, halo, _, _ = plan
    dtype = S.dtype
    nz, ny, nx = S.shape[-3:]
    rel = (jnp.asarray(omega, dtype) * spec.relax).astype(dtype)
    W = _stack_planes3(spec, rel, nz, ny, nx, dtype)

    if isinstance(n_sweeps, (int, np.integer)):
        # static count: full chunks run the fully unrolled kernel
        n = int(n_sweeps)
        full, rem = divmod(n, k)
        S = jax.lax.fori_loop(
            0, full,
            lambda i, s: _window3d_call(spec, W, s, k, k, tile,
                                        interpret=interpret, n_static=k),
            S)
        if rem:
            S = _window3d_call(spec, W, S, rem, k, tile,
                               interpret=interpret, n_static=rem)
        return S

    n = jnp.asarray(n_sweeps, jnp.int32)
    chunks = (n + k - 1) // k
    return jax.lax.fori_loop(
        0, chunks,
        lambda i, s: _window3d_call(spec, W, s,
                                    jnp.minimum(k, n - i * k), k, tile,
                                    interpret=interpret),
        S)


def _impl(spec, S, omega, n_sweeps, interpret: bool = False):
    if S.ndim != 4:
        # canonical layout is (B, nz, ny, nx)
        out = _impl(spec, S.reshape((-1,) + S.shape[-3:]), omega, n_sweeps,
                    interpret=interpret)
        return out.reshape(S.shape)
    plan = window3d_plan(spec, S.shape)
    if plan is None:
        raise ValueError("no feasible 3-D window plan for this problem")
    B = S.shape[0]
    b_chunk = plan.b_chunk
    if b_chunk >= B:
        return _run_group(spec, S, omega, n_sweeps, plan, interpret)

    # batch groups: per-slice planes (if any) slice with the state;
    # broadcast (size-1 or absent) batch dims are shared across groups
    import dataclasses

    def bsl(a, b0, nb, axis, base_ndim):
        a = jnp.asarray(a)
        if a.ndim > base_ndim and a.shape[axis] != 1:
            return jax.lax.slice_in_dim(a, b0, b0 + nb, axis=axis)
        return a

    outs = []
    for b0 in range(0, B, b_chunk):
        nb = min(b_chunk, B - b0)
        gspec = dataclasses.replace(
            spec,
            w=bsl(spec.w, b0, nb, 1, 4), w0=bsl(spec.w0, b0, nb, 0, 3),
            g=bsl(spec.g, b0, nb, 0, 3), relax=bsl(spec.relax, b0, nb, 0, 3),
            active=bsl(spec.active, b0, nb, 0, 3))
        outs.append(_run_group(
            gspec, jax.lax.slice_in_dim(S, b0, b0 + nb, axis=0), omega,
            n_sweeps, plan, interpret))
    return jnp.concatenate(outs, axis=0)


_jit_plain = jax.jit(_impl, static_argnames=("interpret",))
_jit_tpu = jax.jit(_impl, static_argnames=("interpret",),
                   compiler_options=WINDOW_COMPILER_OPTS)
_jit_plain_n = jax.jit(_impl, static_argnames=("n_sweeps", "interpret"))
_jit_tpu_n = jax.jit(_impl, static_argnames=("n_sweeps", "interpret"),
                     compiler_options=WINDOW_COMPILER_OPTS)


def sor_sweeps_window3d(spec, S, omega, n_sweeps, interpret: bool = False):
    """Run n_sweeps full red-black iterations on a >VMEM 3-D problem.

    Bit-identical to ``solve_fixed``'s XLA path (validated in
    tests/test_pallas3d_window.py).  ``n_sweeps`` may be traced;
    iterations run in chunks of the planned ``k_sweeps`` per pallas
    launch, the last chunk clamped inside the kernel via its SMEM count.

    On TPU the top-level jit carries the raised scoped-VMEM compiler
    option; when inlined into an outer trace (the solve driver carries the
    option itself) or off-TPU, the plain jit is used.
    """
    nested = isinstance(S, jax.core.Tracer)
    use_tpu_opts = (not interpret and not nested
                    and jax.default_backend() == "tpu")
    static_n = (isinstance(n_sweeps, (int, np.integer))
                and not isinstance(n_sweeps, jax.core.Tracer))
    if static_n:
        fn = _jit_tpu_n if use_tpu_opts else _jit_plain_n
        return fn(spec, S, omega, int(n_sweeps), interpret=interpret)
    fn = _jit_tpu if use_tpu_opts else _jit_plain
    return fn(spec, S, omega, n_sweeps, interpret=interpret)
