# -*- coding: utf-8 -*-
"""Windowed communication-avoiding multi-sweep SOR for >VMEM 3-D problems.

The VMEM-resident 3-D kernel (pallas_sor3d.py) holds the whole volume
on-chip; the reference's deep-atmosphere omega workloads exceed that (the
11_Omega_equation notebook interpolates the 37-level case to 73 levels:
73 x 72 x 288 is a ~97 MB working set).  This kernel brings the 2-D
ghost-zone windowing idea (pallas_sor_window.py) to the 3-D families
(standard_3d / general_3d, reference numbas.py:16-212 and :746-984 — both
radius-1, 6-offset stencils), windowing along **z** rather than y:

- each program's INPUT window is an overlapping ``Element``-indexed block
  of ``tile + 2*halo`` z-levels across the FULL (y, x) plane extents, with
  ``halo = 2*k_sweeps`` (one red-black iteration propagates at most TWO
  levels — one per color half-sweep); z is an untiled dim, so window
  offsets need no sublane alignment and ny/nx are unconstrained;
- window starts are clamped into the (padded) domain; ``k_sweeps`` full
  iterations run in VMEM, then only the tile's own levels are written
  back (three static cases under ``pl.when``);
- y and x rolls cover their full extents, so their wrap semantics are
  IDENTICAL to the XLA path; z wrap-around garbage at window edges is
  contained by the dependence cone (z-boundary cells are never updated —
  the reference's BCz-as-fixed semantics);
- the extend-BC pre-pass conditions on the GLOBAL z index, so every
  window applies it without first/last special-casing;
- nz pads up to a tile multiple with inert levels (zero weights/relax/g),
  which stay identically zero through the sweeps.

Batch slices map onto a leading grid dim (the coefficient-plane stack
folds batch into its plane axis, keeping every BlockSpec rank-4); larger
batches split into batch-group calls bounded by the scoped-VMEM result
cap.  Volumes whose per-z-plane slab is too large for a feasible window
(wide shallow oceans) still fall back to the XLA roll path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas import core as pallas_core

from .pallas_sor_window import (WINDOW_COMPILER_OPTS, _SCOPED_VMEM_KIB,
                                _RESULT_CAP, _CHUNK_TARGET, _MAX_CHUNKS,
                                _radius)
from .pallas_sor3d import _roll3, pallas3d_applicable

__all__ = ["sor_sweeps_window3d", "window3d_applicable", "window3d_plan"]


# auto-dispatch gate; mirrors pallas_sor_window.WINDOW_AUTODISPATCH
WINDOW3D_AUTODISPATCH = True

# sweep-loop strategy: the rolled static-bound fori_loop is the measured
# default (73x72x288, v5e: 1.66e10 pt-sweeps/s, bit-exact); flipping to
# the unrolled body via XINVERT_UNROLL3D=1 is for fresh-process A/B probes
# only (jit caches key on shapes, not this flag)
import os as _os
UNROLL3D = _os.environ.get("XINVERT_UNROLL3D") == "1"


class Window3dPlan(NamedTuple):
    tile: int          # z-levels per output block
    k_sweeps: int      # fused iterations per launch
    halo: int          # ghost levels per side (2 * k_sweeps)
    nzp: int           # padded z extent (tile multiple)
    b_chunk: int       # batch slices per call (== B when unchunked)


def window3d_plan(spec, S_shape):
    """Pick a Window3dPlan fitting the VMEM budget, or None.

    VMEM model in z-plane slabs of ``ny * nx * itemsize`` bytes: the
    P = K+3 stacked coefficient windows plus S are double-buffered at
    window depth by the pipeline, the output block at tile depth, and the
    sweep loop keeps a handful of window-sized temporaries (acc + rolls);
    the stack-allocated result shares the raised scoped-VMEM budget.
    Candidates are ranked by HBM traffic per true point-sweep,
    ``(P+1) * win / (tile * k) * (nzp / nz)``.
    """
    if spec.ndim != 3:
        return None
    if _radius(spec.offsets) != 1:
        return None
    nz, ny, nx = S_shape[-3:]
    B = int(np.prod(S_shape[:-3], dtype=np.int64))
    if nz < 8:
        return None
    K = len(spec.offsets)
    P = K + 3
    itemsize = np.dtype(spec.w0.dtype).itemsize
    slab = ny * nx * itemsize              # one z-plane
    budget = int(_SCOPED_VMEM_KIB * 1024 * 0.85)

    best = None
    for k in (4, 2, 1):
        halo = 2 * k
        for tile in (32, 24, 16, 8):
            if tile < halo:
                # the three-case write-back offsets {0, halo, 2*halo}
                # require every non-edge window start to be unclamped
                continue
            nzp = -(-nz // tile) * tile
            win = tile + 2 * halo
            if win > nzp:
                continue
            result = B * nzp * slab
            # double-buffered input windows + output blocks + ~6
            # window-sized sweep temporaries (acc, rolls, masks)
            need = (2 * (P + 1) * win + 2 * tile + 6 * win) * slab
            traffic = (P + 1) * win / (tile * k) * (nzp / nz)
            b_chunk = B
            if result <= _RESULT_CAP and need <= budget - result:
                pass
            elif nzp * slab <= _CHUNK_TARGET and need <= budget - min(
                    result, _CHUNK_TARGET):
                b_chunk = max(1, min(B, _CHUNK_TARGET // (nzp * slab)))
                if b_chunk >= B or -(-B // b_chunk) > _MAX_CHUNKS:
                    continue
            else:
                continue
            if best is None or traffic < best[0]:
                best = (traffic, Window3dPlan(tile, k, halo, nzp, b_chunk))
    return None if best is None else best[1]


def window3d_applicable(spec, S_shape, for_dispatch: bool = False) -> bool:
    """True when the windowed 3-D path applies: a 3-D spec too large for
    the VMEM-resident kernel but with a feasible window plan."""
    if for_dispatch and not WINDOW3D_AUTODISPATCH:
        return False
    if pallas3d_applicable(spec, S_shape):
        return False
    return window3d_plan(spec, S_shape) is not None


def _kernel(n_ref, W_ref, s_ref, out_ref, *, K, offsets, tile, halo,
            nzp, nz, ny, nx, extend_y, periodic_x, dtype, n_static=None,
            unroll=False):
    """One grid program: k sweeps on an overlapping (win, ny, nx) window.

    ``nz`` is the TRUE z extent (the pad levels above it are inert); all
    z conditions use global level indices, so the kernel body is
    position-independent."""
    win = tile + 2 * halo
    t = pl.program_id(1)          # grid = (batch, tiles)
    start = jnp.clip(t * tile - halo, 0, nzp - win)

    shape = (win, ny, nx)
    lev_l = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
    lev_g = lev_l + start
    interior_z = jnp.logical_and(lev_g > 0, lev_g < nz - 1)

    def _fix_row(r):
        """Corner clamp of a single extended (win, 1, nx) row."""
        if periodic_x:
            return r
        out = jnp.where(col1 == 0, pltpu.roll(r, nx - 1, 2), r)
        return jnp.where(col1 == nx - 1, pltpu.roll(r, 1, 2), out)

    def one_sweep(_, S):
        # weight refs are read transiently per use (hoisting value copies
        # of the K+3 plane-sets doubles live VMEM — the 2-D spill cliff)
        if extend_y:
            # y-boundary rows copy the nearest interior row on interior-z
            # levels (numbas.py:87-115); globally conditioned, so every
            # window applies it identically
            S = jnp.where(jnp.logical_and(row == 0, interior_z),
                          _fix_row(S[:, 1:2, :]), S)
            S = jnp.where(jnp.logical_and(row == ny - 1, interior_z),
                          _fix_row(S[:, ny - 2:ny - 1, :]), S)
        parity = lev_g + row + col
        for color in (0, 1):
            acc = W_ref[K + 1]                     # g
            for k in range(K):
                acc = acc + W_ref[k] * _roll3(S, offsets[k])
            sel = ((parity % 2) == color).astype(dtype)
            r = W_ref[K + 2] * sel                 # omega * relax * color
            S = S + r * (acc + W_ref[K] * S)
        return S

    if n_static is not None and unroll:
        # fully unrolled sweep loop (the 2-D kernel's fast path; at 3-D
        # window volumes unrolling bloats code and spills registers, so
        # the default is the static-bound fori_loop below)
        S = s_ref[0]
        for i in range(n_static):
            S = one_sweep(i, S)
    elif n_static is not None:
        # static trip count without unrolling: Mosaic sees a constant
        # bound (no SMEM read) but keeps the loop rolled
        S = jax.lax.fori_loop(0, n_static, one_sweep, s_ref[0])
    else:
        S = jax.lax.fori_loop(0, n_ref[0], one_sweep, s_ref[0])

    n_t = pl.num_programs(1)
    first = t == 0
    last = t == n_t - 1

    @pl.when(jnp.logical_and(~first, ~last))
    def _():
        out_ref[0] = S[halo:halo + tile]

    @pl.when(first)
    def _():
        out_ref[0] = S[0:tile]

    @pl.when(jnp.logical_and(last, ~first))
    def _():
        out_ref[0] = S[2 * halo:2 * halo + tile]


def _stack_planes3(spec, rel, nz, ny, nx, dtype, nzp=None):
    """The (bW * (K+3), nzp, ny, nx) stacked coefficient volume (built
    once per solve call; batch folds into the plane axis so the kernel's
    BlockSpec stays rank-4).  Pad levels are zero (inert)."""
    K = len(spec.offsets)
    nzp = nz if nzp is None else nzp

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

    W = jnp.concatenate([bcast(w), bcast(w0)[:, None], bcast(g)[:, None],
                         bcast(r)[:, None]], axis=1)
    W = W.reshape((bW * (K + 3), nz, ny, nx))
    if nzp > nz:
        W = jnp.pad(W, ((0, 0), (0, nzp - nz), (0, 0), (0, 0)))
    return W


@functools.partial(jax.jit,
                   static_argnames=("k_sweeps", "tile", "interpret",
                                    "n_static", "unroll"))
def _window3d_call(spec, W, S, n, k_sweeps: int, tile: int,
                   interpret: bool = False, n_static=None,
                   unroll: bool = False):
    """One pallas launch running ``n`` (<= k_sweeps) full iterations on
    (B, nzp, ny, nx) z-padded state; batch slices map onto the leading
    grid dim, W carries bW*(K+3) stacked planes."""
    B, nzp, ny, nx = S.shape
    dtype = S.dtype
    halo = 2 * k_sweeps
    win = tile + 2 * halo
    K = len(spec.offsets)
    P = K + 3
    bW = W.shape[0] // P
    nz = int(spec.w0.shape[-3])

    kern = functools.partial(
        _kernel,
        K=K,
        offsets=tuple(tuple(int(x) for x in o) for o in spec.offsets),
        tile=tile, halo=halo, nzp=nzp, nz=nz, ny=ny, nx=nx,
        extend_y=spec.bcs[-2] == "extend",
        periodic_x=spec.bcs[-1] == "periodic",
        dtype=dtype, n_static=n_static, unroll=unroll,
    )

    def _zstart(t):
        # z is an untiled dim: element offsets need no sublane alignment
        return jnp.clip(t * tile - halo, 0, nzp - win)

    def wmap(b, t):
        return ((b if bW > 1 else 0) * P, _zstart(t), 0, 0)

    def smap(b, t):
        return (b, _zstart(t), 0, 0)

    nS = jnp.reshape(jnp.asarray(n, jnp.int32), (1,))
    Element = pallas_core.Element
    return pl.pallas_call(
        kern,
        grid=(B, nzp // tile),
        in_specs=[
            pl.BlockSpec((1,), lambda b, t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((Element(P), Element(win), Element(ny),
                          Element(nx)), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((Element(1), Element(win), Element(ny),
                          Element(nx)), smap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, ny, nx), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nzp, ny, nx), dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nS, W, S)


def _run_group(spec, S, omega, n_sweeps, plan, interpret):
    """Solve one batch group: n_sweeps iterations on (B, nz, ny, nx)."""
    tile, k, halo, nzp, _ = plan
    dtype = S.dtype
    nz, ny, nx = S.shape[-3:]
    rel = (jnp.asarray(omega, dtype) * spec.relax).astype(dtype)
    W = _stack_planes3(spec, rel, nz, ny, nx, dtype, nzp=nzp)
    if nzp > nz:
        S = jnp.pad(S, ((0, 0), (0, nzp - nz), (0, 0), (0, 0)))

    if isinstance(n_sweeps, (int, np.integer)):
        # static count: full chunks run the static-trip kernel
        n = int(n_sweeps)
        full, rem = divmod(n, k)
        S = jax.lax.fori_loop(
            0, full,
            lambda i, s: _window3d_call(spec, W, s, k, k, tile,
                                        interpret=interpret, n_static=k,
                                        unroll=UNROLL3D),
            S)
        if rem:
            S = _window3d_call(spec, W, S, rem, k, tile,
                               interpret=interpret, n_static=rem,
                               unroll=UNROLL3D)
    else:
        n = jnp.asarray(n_sweeps, jnp.int32)
        chunks = (n + k - 1) // k
        S = jax.lax.fori_loop(
            0, chunks,
            lambda i, s: _window3d_call(spec, W, s,
                                        jnp.minimum(k, n - i * k), k, tile,
                                        interpret=interpret),
            S)
    return S[:, :nz] if nzp > nz else S


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
    from .pallas_sor_window import _flatten_spec_batch, _bsl

    spec = _flatten_spec_batch(spec, 3)
    outs = []
    for b0 in range(0, B, b_chunk):
        nb = min(b_chunk, B - b0)
        gspec = dataclasses.replace(
            spec,
            w=_bsl(spec.w, b0, nb, 1, 4), w0=_bsl(spec.w0, b0, nb, 0, 3),
            g=_bsl(spec.g, b0, nb, 0, 3),
            relax=_bsl(spec.relax, b0, nb, 0, 3),
            active=_bsl(spec.active, b0, nb, 0, 3))
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

    Matches ``solve_fixed``'s XLA path (validated in
    tests/test_pallas3d_window.py; on-hardware check in
    tools/tpu_window3d_check.py).  ``n_sweeps`` may be traced; iterations
    run in chunks of the planned ``k_sweeps`` per pallas launch, the last
    chunk clamped inside the kernel via its SMEM count.

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
