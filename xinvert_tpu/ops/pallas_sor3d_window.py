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
cap.

Wide-flat volumes (large ny*nx per z plane but small nz — ocean-model
grids like 50 x 330 x 720, where a z window cannot fit) run in the z<->y
PERMUTED layout: the state and coefficients transpose to (y, z, x), the
window rides physical y (still the untiled axis — no alignment
constraints), z and x rolls cover full extents (wrap semantics identical
to the XLA path since BCz is fixed and never updated), and the physical-y
'extend' pre-pass moves onto the windowed axis, conditioned on global
window indices (kernel stays position-independent).  Permuted mode
requires non-periodic y; periodic applies to x only in every reference
3-D problem.
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
                                WindowStepper,
                                _RESULT_CAP, _CHUNK_TARGET, _MAX_CHUNKS,
                                _radius)
from .pallas_sor3d import _roll3, pallas3d_applicable

__all__ = ["sor_sweeps_window3d", "window3d_applicable", "window3d_plan",
           "make_window3d_stepper",
           "window3d_plan_any"]


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
    z_chunk: int       # windowed-axis levels per call (== nzp when unchunked)


def window3d_plan(spec, S_shape):
    """Pick a Window3dPlan fitting the VMEM budget, or None.

    VMEM model in z-plane slabs of ``ny * nx * itemsize`` bytes: the
    P = K+3 stacked coefficient windows plus S are double-buffered at
    window depth by the pipeline, the output block at tile depth, and the
    sweep loop keeps a handful of window-sized temporaries (acc + rolls);
    the stack-allocated result shares the raised scoped-VMEM budget.
    Candidates are ranked by HBM traffic per true point-sweep,
    ``(P+1) * win / (tile * k) * (nzp / nz)``.

    When the full result exceeds the scoped-VMEM result cap, the step
    splits into multiple calls: batch groups first, then windowed-axis
    level chunks (``z_chunk``) — each call's result at most
    ``_CHUNK_TARGET`` bytes, assembled from a chunk plus ``halo``
    boundary levels of its neighbors.
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
            b_chunk, z_chunk = B, nzp
            if result <= _RESULT_CAP and need <= budget - result:
                pass
            elif need > budget - min(result, _CHUNK_TARGET):
                continue
            elif nzp * slab <= _CHUNK_TARGET:
                # batch groups: whole volumes per call
                b_chunk = max(1, min(B, _CHUNK_TARGET // (nzp * slab)))
                if b_chunk >= B or -(-B // b_chunk) > _MAX_CHUNKS:
                    continue
            else:
                # windowed-axis level chunks (the batch rides every call)
                b_chunk = B
                if B * slab > _CHUNK_TARGET:
                    continue
                z_chunk = (_CHUNK_TARGET // (B * slab)) // tile * tile
                if z_chunk < 2 * tile or z_chunk >= nzp:
                    continue
                n_chunks = -(-nzp // z_chunk)
                if nzp // tile < 2 * n_chunks or n_chunks > _MAX_CHUNKS:
                    continue          # keep every chunk >= 2 tiles
            if best is None or traffic < best[0]:
                best = (traffic,
                        Window3dPlan(tile, k, halo, nzp, b_chunk, z_chunk))
    return None if best is None else best[1]


def window3d_applicable(spec, S_shape, for_dispatch: bool = False) -> bool:
    """True when the windowed 3-D path applies: a 3-D spec too large for
    the VMEM-resident kernel but with a feasible window plan (direct
    z-windowed, or z<->y permuted for wide-flat volumes)."""
    if for_dispatch and not WINDOW3D_AUTODISPATCH:
        return False
    if pallas3d_applicable(spec, S_shape):
        return False
    return window3d_plan_any(spec, S_shape) is not None


def _kernel(n_ref, goff_ref, W_ref, s_ref, out_ref, *, K, offsets, tile,
            halo, nzp, nz, ny, nx, extend_mode, periodic_x, dtype,
            n_static=None, unroll=False, pad_lo=0, has_top=True,
            has_bot=True, pad_row=0, has_ytop=True, has_ybot=True,
            parity_off=0, pad_col=0, clamp_w=None, clamp_e=None):
    """One grid program: k sweeps on an overlapping (win, ny, nx) window.

    ``nz`` is the TRUE extent of the windowed axis (the pad levels above it
    are inert); all windowed-axis conditions use global level indices, so
    the kernel body is position-independent.

    For a call that owns one level-chunk of a larger domain, ``pad_lo``
    levels of neighbor data precede the chunk's own levels (``nzp`` is then
    the call-local extent), ``has_top`` / ``has_bot`` mark true domain ends,
    and ``goff_ref`` holds the global index of the call's local level 0 —
    a runtime SMEM scalar, so every interior chunk shares one compiled
    kernel regardless of its level offset.

    For a y-SPLIT block (sharded executor, parallel/halo_window3d.py),
    ``pad_row`` ghost ROWS ride each side of axis -2; only the owned rows
    are written back, ``has_ytop`` / ``has_ybot`` say whether the block
    touches the true y boundaries (the "row" extend pre-pass fires only
    there, at the pad-offset row indices), and ``parity_off`` is the
    red-black parity of the block's global row origin (0 when row blocks
    are even — odd blocks alternate it per device).

    ``extend_mode`` selects the extend-BC pre-pass layout:
      - "row": extend along axis -2 gated on windowed-axis interior — the
        direct layout, where the windowed axis is z and rows are y
        (numbas.py:87-115);
      - "win": extend along the WINDOWED axis gated on axis -2 interior —
        the z<->y permuted layout for wide-flat volumes, where the windowed
        axis is y and rows are z;
      - None: no extend pre-pass.

    For an x-SPLIT block (sharded executor), ``pad_col`` ghost COLUMNS
    ride each side of axis -1 (128-lane aligned, so static write-back
    slices stay on Mosaic's fast path and red-black parity needs no
    offset); only the owned columns are written back, in-kernel x wrap
    handling is off (the caller's ghost exchange carries periodicity),
    and the extend corner clamps move to ``clamp_w`` / ``clamp_e`` —
    LOCAL column indices of the true domain west/east edges (or -1 when
    this block touches neither)."""
    # x-split blocks must name their true-edge columns explicitly; the
    # unsplit defaults are the block's own edge columns
    if clamp_w is None:
        clamp_w = -1 if (periodic_x or pad_col) else 0
    if clamp_e is None:
        clamp_e = -1 if (periodic_x or pad_col) else nx - 1
    win = tile + 2 * halo
    nyo = ny - 2 * pad_row        # owned rows
    nxo = nx - 2 * pad_col        # owned columns
    ext_top_row = pad_row if has_ytop else -1
    ext_bot_row = pad_row + nyo - 1 if has_ybot else -1
    t = pl.program_id(1)          # grid = (batch, tiles)
    start = jnp.clip(pad_lo + t * tile - halo, 0, nzp - win)

    shape = (win, ny, nx)
    lev_l = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
    lev_g = lev_l + start + goff_ref[0]
    interior_z = jnp.logical_and(lev_g > 0, lev_g < nz - 1)

    def _fix_row(r):
        """Corner clamp of a single extended (win, 1, nx) row at the true
        domain west/east edge columns (skipped when periodic/off-block)."""
        out = r
        if clamp_w >= 0:
            out = jnp.where(col1 == clamp_w, pltpu.roll(r, nx - 1, 2), out)
        if clamp_e >= 0:
            out = jnp.where(col1 == clamp_e, pltpu.roll(r, 1, 2), out)
        return out

    def one_sweep(_, S):
        # weight refs are read transiently per use (hoisting value copies
        # of the K+3 plane-sets doubles live VMEM — the 2-D spill cliff)
        if extend_mode == "row":
            # y-boundary rows copy the nearest interior row on interior-z
            # levels (numbas.py:87-115); globally conditioned, so every
            # window applies it identically.  Only true y-boundary rows
            # extend (a y-split block's pad rows are neighbor data).
            if ext_top_row >= 0:
                S = jnp.where(jnp.logical_and(row == ext_top_row,
                                              interior_z),
                              _fix_row(S[:, ext_top_row + 1:
                                         ext_top_row + 2, :]), S)
            if ext_bot_row >= 0:
                S = jnp.where(jnp.logical_and(row == ext_bot_row,
                                              interior_z),
                              _fix_row(S[:, ext_bot_row - 1:
                                         ext_bot_row, :]), S)
        elif extend_mode == "win":
            # permuted layout: the windowed axis is y, rows are z.  The
            # boundary PLANES (global windowed index 0 / nz-1) copy the
            # neighboring plane on interior-z rows; neighbor values come
            # from single-step rolls along the windowed axis (the clamped
            # window start keeps those reads genuine wherever the
            # condition can hold)
            interior_row = jnp.logical_and(row > 0, row < ny - 1)
            S = jnp.where(jnp.logical_and(lev_g == 0, interior_row),
                          _fix_row(pltpu.roll(S, win - 1, 0)), S)
            S = jnp.where(jnp.logical_and(lev_g == nz - 1, interior_row),
                          _fix_row(pltpu.roll(S, 1, 0)), S)
        parity = lev_g + row + col + parity_off
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
    first = jnp.logical_and(t == 0, has_top)
    last = jnp.logical_and(t == n_t - 1, has_bot)

    def _own(block):
        if pad_row:
            block = block[:, pad_row:pad_row + nyo, :]
        if pad_col:
            block = block[:, :, pad_col:pad_col + nxo]
        return block

    @pl.when(jnp.logical_and(~first, ~last))
    def _():
        out_ref[0] = _own(S[halo:halo + tile])

    @pl.when(first)
    def _():
        out_ref[0] = _own(S[0:tile])

    @pl.when(jnp.logical_and(last, ~first))
    def _():
        out_ref[0] = _own(S[2 * halo:2 * halo + tile])


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
                                    "n_static", "unroll", "perm",
                                    "out_levs", "pad_lo", "has_top",
                                    "has_bot", "pad_row", "has_ytop",
                                    "has_ybot", "parity_off", "pad_col",
                                    "clamp_w", "clamp_e"))
def _window3d_call(spec, W, S, n, k_sweeps: int, tile: int,
                   interpret: bool = False, n_static=None,
                   unroll: bool = False, perm: bool = False,
                   g_off=0, out_levs=None, pad_lo: int = 0,
                   has_top: bool = True, has_bot: bool = True,
                   pad_row: int = 0, has_ytop: bool = True,
                   has_ybot: bool = True, parity_off: int = 0,
                   pad_col: int = 0, clamp_w=None, clamp_e=None):
    """One pallas launch running ``n`` (<= k_sweeps) full iterations on
    (B, nzp, ny, nx) state padded along the windowed axis; batch slices
    map onto the leading grid dim, W carries bW*(K+3) stacked planes.
    ``perm``: spec and S are in the z<->y permuted layout (the windowed
    axis is PHYSICAL y, rows are z — wide-flat volumes).

    For a level-chunk call of a split larger domain, ``S`` and ``W`` hold
    the chunk's levels plus one-sided neighbor pads (``pad_lo`` below),
    ``out_levs`` are the levels this call owns and writes, ``g_off`` is
    the runtime global index of local level 0, and ``has_top`` /
    ``has_bot`` mark true domain ends.

    For a y-SPLIT block (sharded executor), ``pad_row`` ghost rows ride
    each side of axis -2 (only the owned rows are written) and
    ``has_ytop`` / ``has_ybot`` mark true y boundaries (direct layout
    only — ``perm`` blocks are never y-split).  For an x-SPLIT block,
    ``pad_col`` ghost columns ride each side of axis -1 with
    ``clamp_w`` / ``clamp_e`` naming the true-edge columns (see
    ``_kernel``)."""
    B, nzp, ny, nx = S.shape
    out_levs = nzp if out_levs is None else out_levs
    nyo = ny - 2 * pad_row
    nxo = nx - 2 * pad_col
    dtype = S.dtype
    halo = 2 * k_sweeps
    win = tile + 2 * halo
    K = len(spec.offsets)
    P = K + 3
    bW = W.shape[0] // P
    nz = int(spec.w0.shape[-3])

    if perm:
        # permuted spec bcs are (y, z, x): the physical-y extend rides the
        # windowed axis; physical z (axis -2) has the reference's
        # BCz-as-fixed semantics (never extended)
        extend_mode = "win" if spec.bcs[-3] == "extend" else None
    else:
        extend_mode = "row" if spec.bcs[-2] == "extend" else None
    kern = functools.partial(
        _kernel,
        K=K,
        offsets=tuple(tuple(int(x) for x in o) for o in spec.offsets),
        tile=tile, halo=halo, nzp=nzp, nz=nz, ny=ny, nx=nx,
        extend_mode=extend_mode,
        # x-split blocks carry periodicity in their ghost columns; the
        # in-kernel wrap handling is then off
        periodic_x=(spec.bcs[-1] == "periodic" and pad_col == 0),
        dtype=dtype, n_static=n_static, unroll=unroll,
        pad_lo=pad_lo, has_top=has_top, has_bot=has_bot,
        pad_row=pad_row, has_ytop=has_ytop, has_ybot=has_ybot,
        parity_off=parity_off, pad_col=pad_col, clamp_w=clamp_w,
        clamp_e=clamp_e,
    )

    def _zstart(t):
        # z is an untiled dim: element offsets need no sublane alignment
        return jnp.clip(pad_lo + t * tile - halo, 0, nzp - win)

    def wmap(b, t):
        return ((b if bW > 1 else 0) * P, _zstart(t), 0, 0)

    def smap(b, t):
        return (b, _zstart(t), 0, 0)

    nS = jnp.reshape(jnp.asarray(n, jnp.int32), (1,))
    gS = jnp.reshape(jnp.asarray(g_off, jnp.int32), (1,))
    Element = pallas_core.Element
    return pl.pallas_call(
        kern,
        grid=(B, out_levs // tile),
        in_specs=[
            pl.BlockSpec((1,), lambda b, t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda b, t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((Element(P), Element(win), Element(ny),
                          Element(nx)), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((Element(1), Element(win), Element(ny),
                          Element(nx)), smap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, nyo, nxo),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_levs, nyo, nxo), dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nS, gS, W, S)


class _LevChunks3:
    """Step executor for a level-split (windowed-axis) 3-D domain — the
    3-D analog of pallas_sor_window._RowChunks.  The state lives as a
    tuple of level-chunk arrays; each step assembles a per-chunk input
    from the chunk plus ``halo`` boundary levels of its neighbors and
    launches one kernel per chunk (the full result would exceed the
    scoped-VMEM result cap).  The kernel takes the chunk's global level
    offset from SMEM, so interior chunks share one compile regardless of
    chunk count.  W slices are precomputed (loop-invariant)."""

    def __init__(self, W, nzp, tile, k, halo, z_chunk, interpret, perm):
        self.tile, self.k, self.halo = tile, k, halo
        self.interpret, self.perm = interpret, perm
        n_chunks = -(-nzp // z_chunk)
        base, extra = divmod(nzp // tile, n_chunks)
        self.levs = [(base + (1 if c < extra else 0)) * tile
                     for c in range(n_chunks)]
        self.bounds = list(np.cumsum([0] + self.levs[:-1]))
        self.Wsub = []
        for c, (z0, r) in enumerate(zip(self.bounds, self.levs)):
            lo = z0 - (halo if c > 0 else 0)
            hi = z0 + r + (halo if c < n_chunks - 1 else 0)
            self.Wsub.append(W[:, lo:hi])

    def split(self, S):
        return tuple(S[:, z0:z0 + r]
                     for z0, r in zip(self.bounds, self.levs))

    def join(self, chunks):
        return jnp.concatenate(chunks, axis=1)

    def step(self, spec, chunks, n, n_static):
        C = len(chunks)
        h = self.halo
        out = []
        for c in range(C):
            pieces = ([chunks[c - 1][:, -h:]] if c > 0 else [])
            pieces.append(chunks[c])
            if c < C - 1:
                pieces.append(chunks[c + 1][:, :h])
            sub = (pieces[0] if len(pieces) == 1
                   else jnp.concatenate(pieces, axis=1))
            pad_lo = h if c > 0 else 0
            out.append(_window3d_call(
                spec, self.Wsub[c], sub, n, self.k, self.tile,
                interpret=self.interpret, n_static=n_static,
                unroll=UNROLL3D, perm=self.perm,
                g_off=self.bounds[c] - pad_lo, out_levs=self.levs[c],
                pad_lo=pad_lo, has_top=(c == 0), has_bot=(c == C - 1)))
        return tuple(out)


class _OneCall3:
    """Trivial executor: the whole volume in one pallas call per step."""

    def __init__(self, W, tile, k, interpret, perm):
        self.W, self.tile, self.k = W, tile, k
        self.interpret, self.perm = interpret, perm

    def split(self, S):
        return S

    def join(self, S):
        return S

    def step(self, spec, S, n, n_static):
        return _window3d_call(spec, self.W, S, n, self.k, self.tile,
                              interpret=self.interpret, n_static=n_static,
                              unroll=UNROLL3D, perm=self.perm)


def _run_group(spec, S, omega, n_sweeps, plan, interpret, perm=False):
    """Solve one batch group: n_sweeps iterations on (B, nz, ny, nx)."""
    tile, k, halo, nzp, _, z_chunk = plan
    dtype = S.dtype
    nz, ny, nx = S.shape[-3:]
    rel = (jnp.asarray(omega, dtype) * spec.relax).astype(dtype)
    W = _stack_planes3(spec, rel, nz, ny, nx, dtype, nzp=nzp)
    if nzp > nz:
        S = jnp.pad(S, ((0, 0), (0, nzp - nz), (0, 0), (0, 0)))

    if z_chunk < nzp:
        ex = _LevChunks3(W, nzp, tile, k, halo, z_chunk, interpret, perm)
    else:
        ex = _OneCall3(W, tile, k, interpret, perm)

    st = ex.split(S)
    if isinstance(n_sweeps, (int, np.integer)):
        # static count: full chunks run the static-trip kernel
        n = int(n_sweeps)
        full, rem = divmod(n, k)
        st = jax.lax.fori_loop(
            0, full, lambda i, s: ex.step(spec, s, k, k), st)
        if rem:
            st = ex.step(spec, st, rem, rem)
    else:
        n = jnp.asarray(n_sweeps, jnp.int32)
        chunks = (n + k - 1) // k
        st = jax.lax.fori_loop(
            0, chunks,
            lambda i, s: ex.step(spec, s, jnp.minimum(k, n - i * k), None),
            st)
    S = ex.join(st)
    return S[:, :nz] if nzp > nz else S


def _permute_zy_spec(spec):
    """Swap the z and y core axes of a 3-D spec (arrays, offsets, bcs) —
    the wide-flat layout where the windowed axis is physical y."""
    import dataclasses

    def p(a):
        a = jnp.asarray(a)
        return jnp.swapaxes(a, -3, -2)

    return dataclasses.replace(
        spec,
        w=p(spec.w), w0=p(spec.w0), g=p(spec.g), relax=p(spec.relax),
        active=p(spec.active),
        offsets=tuple((o[1], o[0], o[2]) for o in spec.offsets),
        bcs=spec.bcs[:-3] + (spec.bcs[-2], spec.bcs[-3], spec.bcs[-1]))


def window3d_plan_any(spec, S_shape):
    """(plan, permuted) — the direct z-windowed plan when feasible, else a
    z<->y permuted plan for wide-flat volumes (large ny*nx per z plane but
    small nz*nx per y plane), else None.

    The permuted layout windows physical y, so it requires non-periodic y
    (windowed-axis wrap garbage must stay outside the dependence cone and
    global y boundaries must be non-updated cells — true for 'fixed' and
    'extend', the only y BCs the reference's 3-D problems use)."""
    plan = window3d_plan(spec, S_shape)
    if plan is not None:
        return plan, False
    if (spec.ndim == 3 and len(S_shape) >= 3
            and spec.bcs[-2] != "periodic"):
        ps = tuple(S_shape[:-3]) + (S_shape[-2], S_shape[-3], S_shape[-1])
        plan = window3d_plan(spec, ps)
        if plan is not None:
            return plan, True
    return None


def _impl(spec, S, omega, n_sweeps, interpret: bool = False):
    if S.ndim != 4:
        # canonical layout is (B, nz, ny, nx)
        out = _impl(spec, S.reshape((-1,) + S.shape[-3:]), omega, n_sweeps,
                    interpret=interpret)
        return out.reshape(S.shape)
    planned = window3d_plan_any(spec, S.shape)
    if planned is None:
        raise ValueError("no feasible 3-D window plan for this problem")
    plan, perm = planned
    if perm:
        spec = _permute_zy_spec(spec)
        S = jnp.swapaxes(S, -3, -2)
        out = _impl_planned(spec, S, omega, n_sweeps, plan, interpret, perm)
        return jnp.swapaxes(out, -3, -2)
    return _impl_planned(spec, S, omega, n_sweeps, plan, interpret, perm)


def _impl_planned(spec, S, omega, n_sweeps, plan, interpret, perm):
    B = S.shape[0]
    b_chunk = plan.b_chunk
    if b_chunk >= B:
        return _run_group(spec, S, omega, n_sweeps, plan, interpret,
                          perm=perm)

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
            n_sweeps, plan, interpret, perm=perm))
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


def make_window3d_stepper(spec, S, omega, check_every: int,
                          interpret: bool = False):
    """Pre-built stepper for CHECKED 3-D solves — the 3-D analog of
    pallas_sor_window.make_window_stepper.

    Builds the plan, the stacked coefficient volume and the executor ONCE
    (loop-invariant operands of the solver's while op) instead of on every
    convergence check, and exposes the executor's split state so the loop
    carry never pays per-check join/split copies.  The convergence norm is
    a plain XLA reduction over the split chunks (one state read per check
    — a few MiB for the omega-class volumes, negligible next to a check
    window of sweeps; the z-padded levels stay exactly zero, so they add
    nothing to the masked-mean-|S| sum).

    Returns ``(split, join, step_full, step_dyn)`` or None when the plan
    needs batch groups (the caller falls back to the per-call path):

    - ``split(S) -> st`` / ``join(st) -> S``;
    - ``step_full(st) -> (st', sumabs)`` — exactly ``check_every`` sweeps;
    - ``step_dyn(st, n) -> (st', sumabs)`` — ``n`` (traced, >= 1) sweeps.
    """
    if S.ndim < 3:
        return None
    planned = window3d_plan_any(spec, S.shape)
    if planned is None:
        return None
    plan, perm = planned
    B = int(np.prod(S.shape[:-3], dtype=np.int64))
    if plan.b_chunk < B:
        return None
    tile, k, halo, nzp, _, z_chunk = plan
    batch_shape = S.shape[:-3]
    dtype = S.dtype
    if perm:
        spec = _permute_zy_spec(spec)
    nz, ny, nx = ((S.shape[-3], S.shape[-2], S.shape[-1]) if not perm
                  else (S.shape[-2], S.shape[-3], S.shape[-1]))
    rel = (jnp.asarray(omega, dtype) * spec.relax).astype(dtype)
    W = _stack_planes3(spec, rel, nz, ny, nx, dtype, nzp=nzp)

    if z_chunk < nzp:
        ex = _LevChunks3(W, nzp, tile, k, halo, z_chunk, interpret, perm)
    else:
        ex = _OneCall3(W, tile, k, interpret, perm)

    def split(Sf):
        Sc = Sf.reshape((B,) + Sf.shape[-3:])
        if perm:
            Sc = jnp.swapaxes(Sc, -3, -2)
        if nzp > nz:
            Sc = jnp.pad(Sc, ((0, 0), (0, nzp - nz), (0, 0), (0, 0)))
        return ex.split(Sc)

    def join(st):
        Sc = ex.join(st)
        if nzp > nz:
            Sc = Sc[:, :nz]
        if perm:
            Sc = jnp.swapaxes(Sc, -3, -2)
        return Sc.reshape(S.shape)

    def sumabs(st):
        leaves = st if isinstance(st, tuple) else (st,)
        tot = sum(jnp.sum(jnp.abs(c), axis=tuple(range(1, c.ndim)))
                  for c in leaves)
        return tot.reshape(batch_shape)

    def step_full(st):
        full, rem = divmod(int(check_every), k)
        if full:
            st = jax.lax.fori_loop(
                0, full, lambda i, s: ex.step(spec, s, k, k), st)
        if rem:
            st = ex.step(spec, st, rem, rem)
        return st, sumabs(st)

    def step_dyn(st, n):
        n = jnp.asarray(n, jnp.int32)
        chunks = (n + k - 1) // k
        st = jax.lax.fori_loop(
            0, chunks,
            lambda i, s: ex.step(spec, s, jnp.minimum(k, n - i * k), None),
            st)
        return st, sumabs(st)

    return WindowStepper(split, join, step_full, step_dyn)
