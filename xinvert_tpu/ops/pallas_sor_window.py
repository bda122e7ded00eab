# -*- coding: utf-8 -*-
"""Windowed communication-avoiding multi-sweep SOR for grids larger than VMEM.

The VMEM-resident kernel (pallas_sor.py) needs the whole problem on-chip;
ocean-scale grids (2048 x 2048 and up) do not fit, and round 1's manual-DMA
tiling (round 1's pallas_sor_tiled.py, since removed) was blocked by the compile stack allocating
pallas RESULTS in scoped VMEM.  This kernel expresses the same ghost-zone
idea through the STANDARD pipelined BlockSpec machinery instead, so the
output streams through ordinary blocked VMEM windows and nothing >VMEM is
ever resident:

- the y axis is tiled; each program's INPUT window is an overlapping
  ``Element``-indexed block of ``tile + 2*halo`` rows with
  ``halo = 2 * radius * k_sweeps`` (one red-black iteration propagates
  information at most ``2*radius`` rows);
- the window start is clamped into the domain, so every window holds only
  genuine data (edge windows simply overlap rows their neighbors own, and
  the k-sweep dependence cone keeps the written tile bit-exact);
- ``k_sweeps`` full iterations run on the window in VMEM, then only the
  tile's own rows are written back through a normal blocked out_spec —
  the write-back offset takes one of three static values (first tile,
  interior, last tile), selected with ``pl.when`` so no dynamic slicing
  of values is needed.

HBM traffic per sweep drops from ~2x(K+5) plane reads (the XLA roll path,
once per color) to ~(K+4) * win / (tile * k_sweeps) plane-equivalents —
about an order of magnitude for the flagship 2048^2 masked Poisson.

x stays unsplit (wrap-around periodic via pltpu.roll); 2-D specs only.
Batch slices (the reference's `loop_noncore` loop) map onto a leading grid
dim.  A single pallas RESULT must fit the raised scoped-VMEM budget
(~64 MiB — the AOT stack stack-allocates it); LARGER problems run as
multiple chunk calls per step: the state lives as a list of row-chunk /
batch-group arrays, each step assembles per-chunk inputs from a chunk plus
``halo`` boundary rows of its neighbors, and every chunk call writes only
its own rows.  Chunk kernels are position-independent (three static
variants: top / interior / bottom), so chunk count does not multiply
compiles — that matters through the slow remote-compile relay.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas import core as pallas_core

from .pallas_sor import _roll2, VMEM_BUDGET

__all__ = ["sor_sweeps_window", "window_applicable", "window_plan",
           "make_window_stepper", "make_window_cheby_stepper"]


def _round8(n):
    return -(-int(n) // 8) * 8


def _radius(offsets):
    return max(max(abs(o) for o in off) for off in offsets)


def _extend_windowed(S, row_g, ny, nx, periodic_x, bih, which="both"):
    """Extend-BC pre-pass on a row window using global row indices.

    Mirrors solver._apply_extend (itself modeled on the reference kernels,
    numbas.py:284-310 and :1299-1343): one ring (two for biharmonic) of
    y-boundary rows copies the nearest interior row, with corner clamping
    when x is not periodic.  Row conditions come from the global row index
    plane so the pass composes with any window of the domain.  ``which``
    gates the ends ('both' | 'top' | 'bot'): a chunk of a row-split domain
    holds at most one true boundary, and the other end's row test would
    misfire on the chunk's own pad rows."""
    col = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    do_top = which in ("both", "top")
    do_bot = which in ("both", "bot")
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
        if do_top:
            S = jnp.where(row_g == 0, colfix(up1, 1), S)
        if do_bot:
            S = jnp.where(row_g == ny - 1, colfix(dn1, 1), S)
        return S

    up2 = _roll2(S, (2, 0))
    dn2 = _roll2(S, (-2, 0))
    if do_top:
        if periodic_x:
            top = up1
        else:
            top = colfix(jnp.where(row_g == 0, up2, up1), 2)
        S = jnp.where(row_g <= 1, top, S)
    if do_bot:
        bot = jnp.where(row_g == ny - 1, dn2, dn1)
        if not periodic_x:
            bot = colfix(bot, 2)
        S = jnp.where(row_g >= ny - 2, bot, S)
    return S


# The AOT compile stack stack-allocates the whole pallas RESULT in scoped
# VMEM regardless of blocked out_specs (the round-1 blocker).  The scoped
# limit is only a compiler default: raising it per-compile makes results up
# to ~RESULT_CAP legal.  96 MiB verified compiling AND running on the v5e.
_SCOPED_VMEM_KIB = 98304
WINDOW_COMPILER_OPTS = {"xla_tpu_scoped_vmem_limit_kib": str(_SCOPED_VMEM_KIB)}
_RESULT_CAP = 64 * 1024 * 1024      # result bytes; leaves room for buffers


# the in-place shifted-load kernel variant for no-cross radius-1 stencils.
# Round 2's pathological timing (~1.5 s per 100 sweeps) traced to the
# center-weight read indexing the size-1 leading block dim out of bounds
# (W_ref[K] for W_ref[0, K]); after the fix it is bit-equal on the v5e and
# ~3% faster than the roll kernel at 2048^2 (tools/tpu_inplace_probe.py:
# 56.6 vs 58.2 ms / 500 sweeps) — within relay jitter, so it stays off by
# default; flip with XINVERT_INPLACE=1 for A/B runs
INPLACE_KERNEL = os.environ.get("XINVERT_INPLACE") == "1"


def _no_cross_r1(spec) -> bool:
    """Nearest-neighbor radius-1 stencil (the standard Poisson family):
    eligible for the in-place shifted-load kernel."""
    return (INPLACE_KERNEL and not spec.bih
            and all(sum(1 for o in off if o != 0) == 1 and
                    max(abs(o) for o in off) == 1 for off in spec.offsets))


class WindowPlan(NamedTuple):
    tile: int
    k_sweeps: int
    halo: int
    y_chunk: int       # rows per chunk call (== ny when unchunked)
    b_chunk: int       # batch slices per call (== B when unchunked)


# per-call result bytes when the full result exceeds _RESULT_CAP and the
# step splits into multiple chunk calls; bounded call count keeps the
# per-step dispatch overhead and trace size sane
_CHUNK_TARGET = 16 * 1024 * 1024
_MAX_CHUNKS = 32


def window_plan(spec, S_shape):
    """Pick a WindowPlan fitting the VMEM budget, or None.

    VMEM model (rows of nx * itemsize bytes): the P = K+3 stacked weight
    planes plus S are double-buffered at window height by the pipeline, and
    the output block is double-buffered at tile height.  When the full
    (B, ny, nx) result exceeds the scoped-VMEM result cap — or squeezes the
    pipeline budget below a good tile — the plan splits the step into
    multiple chunk calls (batch groups, then y-row chunks), each call's
    result at most ``_CHUNK_TARGET`` bytes.
    """
    if spec.ndim != 2:
        return None
    ny, nx = S_shape[-2:]
    B = int(np.prod(S_shape[:-2], dtype=np.int64))
    if ny % 8 or ny < 64:
        return None
    K = len(spec.offsets)
    P = K + 3
    itemsize = np.dtype(spec.w0.dtype).itemsize
    row_bytes = nx * itemsize
    slab = ny * row_bytes                 # one batch slice's result bytes
    result = B * slab
    # the raised scoped-VMEM budget (WINDOW_COMPILER_OPTS) holds the
    # stack-allocated result plus the pipeline buffers; keep 15% headroom
    budget = int(_SCOPED_VMEM_KIB * 1024 * 0.85)
    radius = _radius(spec.offsets)

    # candidate tiles: multiples of 8 dividing ny (the 1-D grid covers ny
    # exactly).  Measured on the v5e (2048^2 Poisson, statically unrolled):
    # tile=128/k=4 runs at 5.1e10 pt-sweeps/s, tile=64/k=8 at 3.8e10,
    # tile>=256 falls off a VMEM-pressure cliff — so prefer the largest
    # tile <= 128 and k=4, shrinking only when the budget demands it.
    tiles = [t for t in range(8, min(ny, 192) + 1, 8) if ny % t == 0]
    tiles.sort(reverse=True)

    for k in (4, 2, 1):
        halo = _round8(2 * radius * k)
        for tile in tiles:
            if tile <= halo:
                # interior windows must stay clear of the domain-edge rows
                # (their extend pre-pass is statically skipped) and the
                # three-case write-back assumes unclamped interior starts —
                # both require tile > halo
                continue
            win = tile + 2 * halo
            if win > ny:
                continue
            # pipeline buffers + output + the in-place kernel's scratch
            need = 2 * (P + 1) * win + 2 * tile + (win + 16) * 2
            if (result <= _RESULT_CAP
                    and need <= (budget - result) // row_bytes):
                return WindowPlan(tile, k, halo, ny, B)
            # chunked multi-call at this (k, tile): per-call result bytes
            # bounded by _CHUNK_TARGET
            if need > (budget - min(result, _CHUNK_TARGET)) // row_bytes:
                continue
            if slab <= _CHUNK_TARGET:
                b_chunk, y_chunk = max(1, min(B, _CHUNK_TARGET // slab)), ny
            else:
                b_chunk = 1
                y_chunk = (_CHUNK_TARGET // row_bytes) // tile * tile
                if y_chunk < tile + halo or y_chunk >= ny:
                    # a chunk must hold a full window beside its one-sided
                    # pad; y_chunk == ny is the unchunked case, which
                    # already failed the budget above
                    continue
                if ny // tile < 2 * -(-ny // y_chunk):
                    continue          # keep every chunk >= 2 tiles
            calls = -(-B // b_chunk) * -(-ny // y_chunk)
            if calls <= 1 or calls > _MAX_CHUNKS:
                continue
            return WindowPlan(tile, k, halo, y_chunk, b_chunk)
    return None


# auto-dispatch gate (measured on the v5e, 2048^2 masked Poisson): the
# statically-unrolled windowed kernel runs ~5e10 pt-sweeps/s vs ~9e9 for
# the XLA roll path, so the solver auto-selects it for eligible problems.
WINDOW_AUTODISPATCH = True


def window_applicable(spec, S_shape, for_dispatch: bool = False) -> bool:
    """True when the windowed >VMEM path applies: 2-D unbatched spec too
    large for the VMEM-resident kernel but with a feasible window plan."""
    if for_dispatch and not WINDOW_AUTODISPATCH:
        return False
    from .pallas_sor import pallas_applicable
    if pallas_applicable(spec, S_shape):
        return False
    return window_plan(spec, S_shape) is not None


def _kernel(n_ref, *refs, K, offsets,
            tile, halo, ny, nx, extend_y, periodic_x, bih, dtype,
            n_static=None, pad_lo=0, has_top=True, has_bot=True,
            pad_x=0, clamp_w=None, clamp_e=None, ext_bot=None,
            cheby=False, with_norm=False):
    """One grid program: k sweeps on an overlapping row window.

    ``ny`` is the (sub-)domain height this call sees.  For a chunk of a
    row-split larger domain, ``pad_lo`` rows of neighbor data precede the
    chunk's own rows and ``has_top`` / ``has_bot`` say whether the
    sub-domain's ends are TRUE domain boundaries — the kernel is otherwise
    position-independent (the red-black parity offset of a chunk is a
    multiple of the 8-aligned tile/halo, hence even), so every interior
    chunk shares one compiled kernel regardless of its row offset.

    ``pad_x`` (x-split domains, parallel/halo_window.py): the block carries
    ``pad_x`` ghost COLUMNS on each side; only the owned columns are
    written back.  x-periodicity is then the caller's ghost exchange, so
    in-kernel x wrap handling is off, and the extend-row corner clamps
    move to ``clamp_w`` / ``clamp_e`` — LOCAL column indices of the true
    domain west/east edges (or -1 when this block touches neither).  The
    128-aligned ``pad_x`` is even, so red-black parity needs no offset.

    ``refs`` unpacks to ``([fac_ref,] W_ref, s_ref, out_ref[, norm_ref])``:
    ``cheby`` adds an SMEM array of per-half-sweep Chebyshev factors
    (``fac[2*i + color]`` scales half-sweep ``color`` of in-launch sweep
    ``i`` — the weight planes then fold relax WITHOUT omega), ``with_norm``
    adds the fused |S| column-sum output.
    """
    # x-split blocks (pad_x > 0) must name their true-edge columns
    # explicitly; the unsplit defaults are the block's own edge columns
    if clamp_w is None:
        clamp_w = -1 if (periodic_x or pad_x) else 0
    if clamp_e is None:
        clamp_e = -1 if (periodic_x or pad_x) else nx - 1
    i0 = 1 if cheby else 0
    fac_ref = refs[0] if cheby else None
    W_ref, s_ref, out_ref = refs[i0], refs[i0 + 1], refs[i0 + 2]
    norm_ref = refs[i0 + 3] if with_norm else None
    win = tile + 2 * halo
    nxo = nx - 2 * pad_x          # owned columns
    t = pl.program_id(1)          # grid = (batch, tiles)
    n_t = pl.num_programs(1)
    start = jnp.clip(pad_lo + t * tile - halo, 0, ny - win)

    # extend rows (domain rows 0 / ny-1) exist only in the first and last
    # windows of edge chunks: interior programs skip the pre-pass entirely
    # (measured ~27% of sweep cost when applied unconditionally)
    is_top = jnp.logical_and(t == 0, has_top)
    is_bot = jnp.logical_and(t == n_t - 1, has_bot)

    row_l = jax.lax.broadcasted_iota(jnp.int32, (win, nx), 0)
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, nx), 1)

    def _fix_row(r):
        """Corner clamp of a single extended row at the true domain west /
        east edge columns (skipped when periodic or off-block)."""
        out = r
        if clamp_w >= 0:
            out = jnp.where(col1 == clamp_w, pltpu.roll(r, nx - 1, 1), out)
        if clamp_e >= 0:
            out = jnp.where(col1 == clamp_e, pltpu.roll(r, 1, 1), out)
        return out

    which = ("both" if (has_top and has_bot)
             else ("top" if has_top else "bot"))

    def one_sweep(it, S):
        # everything below reads the weight refs transiently per use:
        # hoisting value copies of the K+3 planes out of the loop doubles
        # live VMEM and sends Mosaic into spill territory at large tiles
        row_g = jax.lax.broadcasted_iota(jnp.int32, (win, nx), 0) + start
        if extend_y and not bih and ext_bot is None:
            # extend rows via STATIC single-row slices: the clamped window
            # start pins domain row 0 to local row 0 of the first window
            # and domain ny-1 to local win-1 of the last, so no full-window
            # rolls are needed (the values match _extend_windowed exactly)
            if has_top:
                S = jax.lax.cond(
                    t == 0,
                    lambda s: jnp.where(row_l == 0, _fix_row(s[1:2, :]), s),
                    lambda s: s, S)
            if has_bot:
                S = jax.lax.cond(
                    t == n_t - 1,
                    lambda s: jnp.where(row_l == win - 1,
                                        _fix_row(s[win - 2:win - 1, :]), s),
                    lambda s: s, S)
        elif extend_y and (has_top or has_bot):
            # ``ext_bot`` (padded-row blocks): the true bottom extend row
            # sits at a static local index ABOVE the inert pad rows; the
            # plan guarantees only the last window contains it, so the
            # is_bot gate still applies (see halo_window's npad bound)
            ny_ext = ny if ext_bot is None else ext_bot + 1
            S = jax.lax.cond(
                jnp.logical_or(is_top, is_bot),
                lambda s: _extend_windowed(s, row_g, ny_ext, nx, periodic_x,
                                           bih, which),
                lambda s: s, S)
        parity = row_g + jax.lax.broadcasted_iota(jnp.int32, (win, nx), 1)
        for color in (0, 1):
            acc = W_ref[0, K + 1]                  # g
            for k in range(K):
                acc = acc + W_ref[0, k] * _roll2(S, offsets[k])
            # red/black parity in GLOBAL coordinates
            sel = ((parity % 2) == color).astype(dtype)
            r = W_ref[0, K + 2] * sel              # omega * relax * color
            if fac_ref is not None:
                # cyclic-Chebyshev: the per-half-sweep factor scales the
                # relax plane (sel is exactly 0/1, so this association is
                # bit-identical to the XLA path's w * (relax * color))
                r = r * fac_ref[2 * it + color]
            S = S + r * (acc + W_ref[0, K] * S)
        return S

    if n_static is not None:
        # fully unrolled sweep loop: a dynamic (SMEM) trip count defeats
        # Mosaic's scheduling; the fixed-iteration hot path unrolls
        S = s_ref[0]
        for i in range(n_static):
            S = one_sweep(i, S)
    else:
        S = jax.lax.fori_loop(0, n_ref[0], one_sweep, s_ref[0])

    # write back this tile's rows.  The clamped window start leaves the
    # tile at local offset halo for interior tiles, 0 for the first tile
    # of a top-edge chunk and 2*halo for the last tile of a bottom-edge
    # chunk — all static slices under pl.when.
    first = is_top
    last = is_bot

    def store(owned):
        if pad_x:
            owned = owned[:, pad_x:pad_x + nxo]
        out_ref[0] = owned
        if norm_ref is not None:
            # fused convergence-norm partial (SURVEY §7.1 item 2): the
            # owned tile is live in VMEM, so its |S| column sums cost one
            # VPU reduction; each tile writes its own independent (8, nxo)
            # block (no cross-tile accumulator: a revisited block's
            # read-modify-write chain serialised the output pipeline).
            # The (1, nxo) column sum is broadcast over the 8 sublanes
            # (Mosaic's minimum f32 block height) pre-divided by 8 (exact
            # in binary fp), so the host-side sum over all blocks is the
            # true total.
            norm_ref[0] = jnp.broadcast_to(
                jnp.sum(jnp.abs(owned), axis=0, keepdims=True) / 8.0,
                (8, nxo))

    @pl.when(jnp.logical_and(~first, ~last))
    def _():
        store(S[halo:halo + tile, :])

    @pl.when(first)
    def _():
        store(S[0:tile, :])

    @pl.when(jnp.logical_and(last, ~first))
    def _():
        store(S[2 * halo:2 * halo + tile, :])


def _kernel_inplace(n_ref, *refs, K, offsets, tile,
                    halo, ny, nx, extend_y, periodic_x, dtype, n_static,
                    cheby=False, with_norm=False):
    """Shifted-load in-place variant for nearest-neighbor radius-1 stencils.

    ``pltpu.roll`` materializes a rotated copy per neighbor (8 full-array
    writes per sweep); here the window lives in a VMEM scratch with one
    ring of border cells, neighbors are read as direct shifted slices, and
    each color updates the scratch IN PLACE — safe because a color's
    neighbors are all the opposite color, whose stored values are bitwise
    unchanged by the color's own write.  The interior sits at an aligned
    (8, 128) offset so only the +-1 neighbor reads are unaligned.

    ``refs`` unpacks to ``([fac_ref,] W_ref, s_ref, out_ref[, norm_ref],
    sc)`` — same ``cheby`` / ``with_norm`` conventions as ``_kernel``.
    """
    i0 = 1 if cheby else 0
    fac_ref = refs[0] if cheby else None
    W_ref, s_ref, out_ref = refs[i0], refs[i0 + 1], refs[i0 + 2]
    norm_ref = refs[i0 + 3] if with_norm else None
    sc = refs[-1]
    win = tile + 2 * halo
    OY, OX = 8, 128                   # aligned interior origin
    t = pl.program_id(1)              # grid = (batch, tiles)
    n_t = pl.num_programs(1)
    start = jnp.clip(t * tile - halo, 0, ny - win)
    first = t == 0
    last = t == n_t - 1

    # stage the window; border ring zeroed (read by discard-tolerated
    # window-edge updates only — must be finite, never correct)
    sc[:, :] = jnp.zeros_like(sc)
    sc[OY:OY + win, OX:OX + nx] = s_ref[0]

    def refresh_wrap():
        if periodic_x:
            sc[OY:OY + win, OX - 1:OX] = sc[OY:OY + win, OX + nx - 1:OX + nx]
            sc[OY:OY + win, OX + nx:OX + nx + 1] = sc[OY:OY + win, OX:OX + 1]

    refresh_wrap()

    row_g = jax.lax.broadcasted_iota(jnp.int32, (win, nx), 0) + start
    parity = row_g + jax.lax.broadcasted_iota(jnp.int32, (win, nx), 1)

    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, nx), 1)

    def extend_rows():
        # the extend pre-pass touches only global rows 0 / ny-1, which sit
        # at STATIC scratch rows of the first/last windows
        if not extend_y:
            return

        def fix(row):                  # corner clamp for non-periodic x
            if periodic_x:
                return row
            row = jnp.where(col1 == 0, pltpu.roll(row, -1, 1), row)
            return jnp.where(col1 == nx - 1, pltpu.roll(row, 1, 1), row)

        @pl.when(first)
        def _():
            sc[OY:OY + 1, OX:OX + nx] = fix(sc[OY + 1:OY + 2, OX:OX + nx])

        @pl.when(last)
        def _():
            sc[OY + win - 1:OY + win, OX:OX + nx] = fix(
                sc[OY + win - 2:OY + win - 1, OX:OX + nx])

        @pl.when(first | last)
        def _():
            refresh_wrap()

    def one_sweep(it, carry):
        extend_rows()
        for color in (0, 1):
            acc = W_ref[0, K + 1]
            for k in range(K):
                dy, dx = offsets[k]
                acc = acc + W_ref[0, k] * sc[OY + dy:OY + dy + win,
                                             OX + dx:OX + dx + nx]
            sel = ((parity % 2) == color).astype(dtype)
            r = W_ref[0, K + 2] * sel
            if fac_ref is not None:
                r = r * fac_ref[2 * it + color]
            Sv = sc[OY:OY + win, OX:OX + nx]
            sc[OY:OY + win, OX:OX + nx] = Sv + r * (acc + W_ref[0, K] * Sv)
            refresh_wrap()
        return carry

    if n_static is not None:
        for i in range(n_static):
            one_sweep(i, 0)
    else:
        jax.lax.fori_loop(0, n_ref[0], one_sweep, 0)

    def store(owned):
        out_ref[0] = owned
        if norm_ref is not None:
            # fused convergence-norm partial — same independent per-tile
            # block as _kernel's store
            norm_ref[0] = jnp.broadcast_to(
                jnp.sum(jnp.abs(owned), axis=0, keepdims=True) / 8.0,
                (8, nx))

    @pl.when(jnp.logical_and(~first, ~last))
    def _():
        store(sc[OY + halo:OY + halo + tile, OX:OX + nx])

    @pl.when(first)
    def _():
        store(sc[OY:OY + tile, OX:OX + nx])

    @pl.when(jnp.logical_and(last, ~first))
    def _():
        store(sc[OY + 2 * halo:OY + 2 * halo + tile, OX:OX + nx])


# extend-fold trades bit-exactness for speed: (w0 + w_s)*S rounds once
# where the reference's w_s*S0 + w0*S rounds twice, a ~1e-15-relative
# reassociation drift in the boundary-adjacent rows (same fixed point).
# OFF by default: every kernel path stays bit-identical to the XLA sweep;
# flip on for throughput-only workloads.
FOLD_EXTEND = False


def _extend_foldable(spec) -> bool:
    """(extend, periodic) nearest-neighbor radius-1 specs can fold the
    extend-BC row copies into the weights (see _fold_extend)."""
    return (spec.bcs[-2] == "extend" and spec.bcs[-1] == "periodic"
            and not spec.bih
            and all(sum(1 for o in off if o != 0) == 1
                    and max(abs(o) for o in off) == 1
                    for off in spec.offsets))


def _fold_extend(spec):
    """Fold the extend pre-pass into the stencil: rows adjacent to the
    y boundary absorb their boundary-pointing weight into w0.

    With periodic x and no cross couplings, the extend copy makes
    S[0, i] == S[1, i] at the START of every iteration, and row 1's own
    value is unchanged within the half-sweep that reads it (red/black:
    a cell's neighbors are the opposite color, and w0 multiplies the
    cell's own pre-update value either way) — so reading S[0, i] is
    EXACTLY reading S[1, i], i.e. row 1's south weight belongs on its
    diagonal.  The boundary rows themselves are made inert (relax = 0):
    they lag, so callers run all but the LAST iteration folded and the
    last one with the standard extend kernel, after which the state is
    bit-identical to the reference semantics (validated in
    tests/test_pallas_window.py).  The folded spec's bcs drop to
    ('fixed', 'periodic') so the kernel skips the pre-pass entirely —
    measured ~27% of sweep cost on the 2048^2 flagship."""
    import dataclasses
    offs = {tuple(o): i for i, o in enumerate(spec.offsets)}
    iS, iN = offs[(-1, 0)], offs[(1, 0)]
    w, w0, relax = spec.w, spec.w0, spec.relax
    w0 = w0.at[..., 1, :].add(w[iS][..., 1, :])
    w0 = w0.at[..., -2, :].add(w[iN][..., -2, :])
    w = w.at[iS, ..., 1, :].set(0.0)
    w = w.at[iN, ..., -2, :].set(0.0)
    relax = relax.at[..., 0, :].set(0.0)
    relax = relax.at[..., -1, :].set(0.0)
    return dataclasses.replace(spec, w=w, w0=w0, relax=relax,
                               bcs=spec.bcs[:-2] + ("fixed", spec.bcs[-1]))


def _flatten_spec_batch(spec, core_ndim):
    """Collapse any multi-dim batch on the spec arrays to ONE leading axis
    (callers flatten the state's batch dims the same way).  The batch-group
    slicers index the flattened axis directly, so per-slice coefficients
    batched as e.g. (time, member) must flatten with the state; broadcast
    (size-1 or absent) batch dims are left alone and shared across groups.
    Partially-broadcast multi-dim batches (e.g. coefficients batched over
    time but not member) are not supported on any batched path."""
    import dataclasses

    def flat(a, lead):
        a = jnp.asarray(a)
        if a.ndim > lead + core_ndim + 1:
            return a.reshape(a.shape[:lead] + (-1,)
                             + a.shape[a.ndim - core_ndim:])
        return a

    return dataclasses.replace(
        spec, w=flat(spec.w, 1), w0=flat(spec.w0, 0), g=flat(spec.g, 0),
        relax=flat(spec.relax, 0), active=flat(spec.active, 0))


def _bsl(a, b0, nb, axis, base_ndim):
    """Slice one batch group from a (possibly unbatched / broadcast)
    spec array whose batch, if present, is a single axis ``axis``."""
    a = jnp.asarray(a)
    if a.ndim > base_ndim and a.shape[axis] != 1:
        return jax.lax.slice_in_dim(a, b0, b0 + nb, axis=axis)
    return a


def _stack_planes(spec, rel, ny, nx, dtype):
    """The (bW, K+3, ny, nx) stacked coefficient volume the kernel streams.

    Built ONCE per solve call (outside the chunk loop): for per-slice
    batched coefficients the stack is B full plane sets, and rebuilding it
    inside the chunk fori_loop would add ~3x HBM traffic (measured: 4x1024^2
    at 2.2e10 with the in-loop build vs 6.2e10 for the B=1 shape)."""
    K = len(spec.offsets)

    def plane(a):
        """(b, ny, nx) with b in {1, B}."""
        a = jnp.asarray(a, dtype)
        a = a.reshape((-1,) + a.shape[-2:]) if a.ndim > 2 else a[None]
        return jnp.broadcast_to(a, (a.shape[0], ny, nx))

    w = spec.w.astype(dtype)                     # (K, ...) maybe batched
    w = jnp.moveaxis(w.reshape((K, -1) + w.shape[-2:]), 0, 1)
    w0, g, r = plane(spec.w0), plane(spec.g), plane(rel)
    bW = max(w.shape[0], w0.shape[0], g.shape[0], r.shape[0])

    def bcast(a):
        return jnp.broadcast_to(a, (bW,) + a.shape[1:])

    return jnp.concatenate([bcast(w), bcast(w0)[:, None], bcast(g)[:, None],
                            bcast(r)[:, None]], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k_sweeps", "tile", "interpret",
                                    "n_static", "out_rows", "pad_lo",
                                    "has_top", "has_bot", "pad_x",
                                    "clamp_w", "clamp_e", "ext_bot",
                                    "with_norm"))
def _window_chunk(spec, W, S, n, k_sweeps: int, tile: int,
                  interpret: bool = False, n_static=None,
                  out_rows=None, pad_lo: int = 0,
                  has_top: bool = True, has_bot: bool = True,
                  pad_x: int = 0, clamp_w=None, clamp_e=None,
                  ext_bot=None, with_norm: bool = False, fac=None):
    """One pallas launch running ``n`` (<= k_sweeps) full iterations.

    ``n_static`` (<= k_sweeps) unrolls the sweep loop statically — the
    fixed-iteration hot path; ``n`` is then ignored.  ``S`` is (B, ny, nx);
    batch slices map onto the leading grid dim, streaming blocks of the
    prebuilt ``W`` stack (shared or per-slice coefficient planes).

    For a chunk call of a row-split larger domain, ``S`` and ``W`` hold the
    chunk's rows plus its one-sided neighbor pads (``pad_lo`` below, the
    rest above), ``out_rows`` are the rows this call owns and writes, and
    ``has_top`` / ``has_bot`` mark true domain boundaries.

    For an x-SPLIT block (sharded executor), ``pad_x`` ghost columns ride
    each side of ``S``/``W``; only the owned ``nx - 2*pad_x`` columns are
    written, in-kernel x wrap is disabled (the caller's ghost exchange
    carries periodicity), and ``clamp_w`` / ``clamp_e`` give the LOCAL
    column indices of true domain west/east edges for the extend-row
    corner clamps (-1: not on this block).

    ``with_norm`` adds a second output of |S| column-sum partials, shape
    (B, 8, nx) — the fused convergence-norm piece (sum over the last two
    axes gives each slice's total |S| over this call's rows).

    ``fac`` (cyclic Chebyshev) is a traced array of per-half-sweep factors
    delivered to the kernel through SMEM; the ``W`` stack must then fold
    relax WITHOUT omega.  Length 2*n_static for unrolled launches,
    2*k_sweeps for dynamic counts."""
    B, ny, nx = S.shape
    out_rows = ny if out_rows is None else out_rows
    dtype = S.dtype
    radius = _radius(spec.offsets)
    halo = _round8(2 * radius * k_sweeps)
    win = tile + 2 * halo
    K = len(spec.offsets)
    bW = W.shape[0]

    win = tile + 2 * halo
    nxo = nx - 2 * pad_x
    inplace = (_no_cross_r1(spec) and has_top and has_bot and pad_lo == 0
               and out_rows == ny and pad_x == 0
               and clamp_w is None and clamp_e is None and ext_bot is None)
    if inplace:
        kern = functools.partial(
            _kernel_inplace,
            K=K,
            offsets=tuple(tuple(int(x) for x in o) for o in spec.offsets),
            tile=tile, halo=halo, ny=ny, nx=nx,
            extend_y=spec.bcs[-2] == "extend",
            periodic_x=spec.bcs[-1] == "periodic",
            dtype=dtype, n_static=n_static,
            cheby=fac is not None, with_norm=with_norm,
        )
        scratch = [pltpu.VMEM((win + 16, nx + 256), dtype)]
    else:
        kern = functools.partial(
            _kernel,
            K=K,
            offsets=tuple(tuple(int(x) for x in o) for o in spec.offsets),
            tile=tile, halo=halo, ny=ny, nx=nx,
            extend_y=spec.bcs[-2] == "extend",
            # x-split blocks (pad_x > 0) carry periodicity in their ghost
            # columns; in-kernel wrap must then be off
            periodic_x=(spec.bcs[-1] == "periodic" and pad_x == 0),
            bih=spec.bih, dtype=dtype, n_static=n_static,
            pad_lo=pad_lo, has_top=has_top, has_bot=has_bot,
            pad_x=pad_x, clamp_w=clamp_w, clamp_e=clamp_e, ext_bot=ext_bot,
            cheby=fac is not None, with_norm=with_norm,
        )
        scratch = []

    def _start(t):
        # tile, halo, pad_lo, ny and win are all multiples of the (8, 128)
        # sublane tiling, so every clamped window start is too — Mosaic
        # cannot prove that through the clip, hence the explicit hint
        return pl.multiple_of(jnp.clip(pad_lo + t * tile - halo, 0, ny - win),
                              8)

    def wmap(b, t):
        return ((b if bW > 1 else 0), 0, _start(t), 0)

    def smap(b, t):
        return (b, _start(t), 0)

    nS = jnp.reshape(jnp.asarray(n, jnp.int32), (1,))
    Element = pallas_core.Element
    out_specs = pl.BlockSpec((1, tile, nxo), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, out_rows, nxo), dtype)
    if with_norm:
        # independent (8, nxo) block per tile program: tiny extra HBM write
        # (8 rows per tile), summed host-side with the chunk joins
        out_specs = [out_specs,
                     pl.BlockSpec((1, 8, nxo), lambda b, t: (b, t, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, 8 * (out_rows // tile), nxo),
                                          dtype)]
    in_specs = [pl.BlockSpec((1,), lambda b, t: (0,),
                             memory_space=pltpu.SMEM)]
    args = [nS]
    if fac is not None:
        fac = jnp.asarray(fac, dtype)
        in_specs.append(pl.BlockSpec((fac.shape[0],), lambda b, t: (0,),
                                     memory_space=pltpu.SMEM))
        args.append(fac)
    # Mosaic requires all-or-none Element dims within a BlockSpec; the
    # non-windowed dims are full-size (or unit) Elements at their offset
    in_specs += [
        pl.BlockSpec((Element(1), Element(K + 3), Element(win),
                      Element(nx)), wmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((Element(1), Element(win), Element(nx)), smap,
                     memory_space=pltpu.VMEM),
    ]
    args += [W, S]
    return pl.pallas_call(
        kern,
        grid=(B, out_rows // tile),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


class _RowChunks:
    """Step executor for a y-row-split domain.

    The state lives as a tuple of row-chunk arrays; each step assembles a
    per-chunk input from the chunk plus ``halo`` boundary rows of its
    neighbors and launches one position-independent kernel per chunk (the
    full-domain result would exceed the scoped-VMEM result cap).  W slices
    are precomputed (loop-invariant)."""

    def __init__(self, W, ny, tile, k, halo, y_chunk, interpret, rows=None):
        self.tile, self.k, self.halo = tile, k, halo
        self.interpret = interpret
        if rows is None:
            n_chunks = -(-ny // y_chunk)
            base, extra = divmod(ny // tile, n_chunks)
            rows = [(base + (1 if c < extra else 0)) * tile
                    for c in range(n_chunks)]
        n_chunks = len(rows)
        self.rows = rows
        self.bounds = list(np.cumsum([0] + self.rows[:-1]))
        self.Wsub = []
        for c, (y0, r) in enumerate(zip(self.bounds, self.rows)):
            lo = y0 - (halo if c > 0 else 0)
            hi = y0 + r + (halo if c < n_chunks - 1 else 0)
            self.Wsub.append(W[:, :, lo:hi, :])

    def split(self, S):
        return tuple(S[:, y0:y0 + r] for y0, r in zip(self.bounds, self.rows))

    def join(self, chunks):
        return jnp.concatenate(chunks, axis=1)

    def step(self, spec, chunks, n, n_static, with_norm=False, fac=None):
        C = len(chunks)
        h = self.halo
        out = []
        nrm = None
        for c in range(C):
            pieces = ([chunks[c - 1][:, -h:]] if c > 0 else [])
            pieces.append(chunks[c])
            if c < C - 1:
                pieces.append(chunks[c + 1][:, :h])
            sub = pieces[0] if len(pieces) == 1 else jnp.concatenate(
                pieces, axis=1)
            r = _window_chunk(
                spec, self.Wsub[c], sub, n, self.k, self.tile,
                interpret=self.interpret, n_static=n_static,
                out_rows=self.rows[c], pad_lo=0 if c == 0 else h,
                has_top=(c == 0), has_bot=(c == C - 1),
                with_norm=with_norm, fac=fac)
            if with_norm:
                out.append(r[0])
                part = jnp.sum(r[1], axis=(1, 2))
                nrm = part if nrm is None else nrm + part
            else:
                out.append(r)
        return (tuple(out), nrm) if with_norm else tuple(out)


class _OneCall:
    """Trivial executor: the whole domain in one pallas call per step."""

    def __init__(self, W, tile, k, interpret):
        self.W, self.tile, self.k = W, tile, k
        self.interpret = interpret

    def split(self, S):
        return S

    def join(self, S):
        return S

    def step(self, spec, S, n, n_static, with_norm=False, fac=None):
        r = _window_chunk(spec, self.W, S, n, self.k, self.tile,
                          interpret=self.interpret, n_static=n_static,
                          with_norm=with_norm, fac=fac)
        if with_norm:
            return r[0], jnp.sum(r[1], axis=(1, 2))
        return r


# Edge-split: when the extend pre-pass applies, split the one-call domain
# into [top, interior, bottom] chunks so the interior call (the bulk of the
# rows) compiles WITHOUT the per-sweep extend conditionals — bit-exact.
# Measured on the v5e 2048^2 flagship (tools/tpu_edge_split_probe.py): the
# split and the one-call path both median ~5.8e10 pt-sweeps/s within the
# relay's timing jitter (the extend-fold variant, FOLD_EXTEND, measured
# 5.7e10 the same day; round 2's 4.8e10 one-call figure was a jittery
# session).  Kept on: never slower, and it removes the per-sweep extend
# conditionals from the interior programs.
EDGE_SPLIT = True


def _edge_rows(spec, ny, tile, halo):
    """Rows of the [top, mid, bot] edge-split, or None when not profitable.

    Edge chunks need >= tile + halo rows (a full window beside the
    one-sided pad) rounded up to whole tiles; only split when the
    cond-free interior still covers most rows."""
    if spec.bcs[-2] != "extend":
        return None
    e = -(-(tile + halo) // tile) * tile
    if ny < 4 * e:
        return None
    return [e, ny - 2 * e, e]


def _make_executor(spec, W, ny, tile, k, halo, y_chunk, interpret,
                   edge_split=True):
    """The executor-selection rule shared by the fixed path and the
    checked-solve steppers: row chunks when the result must split into
    multiple calls, else the edge-split [top, mid, bot] variant (interior
    programs carry no extend conditionals) when eligible, else one call.
    Keeping this in ONE place guarantees the fixed and checked paths run
    the same executor on the same problem."""
    if y_chunk < ny:
        return _RowChunks(W, ny, tile, k, halo, y_chunk, interpret)
    if edge_split and EDGE_SPLIT and not _no_cross_r1(spec):
        rows = _edge_rows(spec, ny, tile, halo)
        if rows is not None:
            return _RowChunks(W, ny, tile, k, halo, ny, interpret,
                              rows=rows)
    return _OneCall(W, tile, k, interpret)


def _run_group(spec, S, omega, n_sweeps, plan, interpret, fold):
    """Solve one batch group: n_sweeps iterations on (B, ny, nx)."""
    tile, k, halo, y_chunk, _ = plan
    dtype = S.dtype
    ny, nx = S.shape[-2:]
    rel = (jnp.asarray(omega, dtype) * spec.relax).astype(dtype)
    W = _stack_planes(spec, rel, ny, nx, dtype)
    static_n = isinstance(n_sweeps, (int, np.integer))

    def make_ex(Wx):
        # dynamic counts skip the edge split (its chunk kernels unroll)
        return _make_executor(spec, Wx, ny, tile, k, halo, y_chunk,
                              interpret, edge_split=static_n)

    if isinstance(n_sweeps, (int, np.integer)):
        # static count: chunks run the fully unrolled kernel.  For
        # (extend, periodic) nearest-neighbor specs, all but the last
        # iteration run the extend-FOLDED spec (no pre-pass in the kernel,
        # ~27% faster); the final standard iteration restores the boundary
        # rows, leaving the state bit-identical (see _fold_extend).
        n = int(n_sweeps)
        tail = 1 if (fold and n >= 2 and _extend_foldable(spec)) else 0
        if tail:
            fspec = _fold_extend(spec)
            relf = (jnp.asarray(omega, dtype) * fspec.relax).astype(dtype)
            Wf = _stack_planes(fspec, relf, ny, nx, dtype)
            run_spec, run_ex = fspec, make_ex(Wf)
        else:
            run_spec, run_ex = spec, make_ex(W)
        full, rem = divmod(n - tail, k)
        st = run_ex.split(S)
        st = jax.lax.fori_loop(
            0, full,
            lambda i, s: run_ex.step(run_spec, s, k, n_static=k),
            st)
        if rem:
            st = run_ex.step(run_spec, st, rem, n_static=rem)
        if tail:
            tail_ex = make_ex(W)
            st = tail_ex.step(spec, st, 1, n_static=1)
        return run_ex.join(st)

    ex = make_ex(W)
    n = jnp.asarray(n_sweeps, jnp.int32)
    chunks = (n + k - 1) // k
    st = ex.split(S)
    st = jax.lax.fori_loop(
        0, chunks,
        lambda i, s: ex.step(spec, s, jnp.minimum(k, n - i * k), None),
        st)
    return ex.join(st)


def _sor_sweeps_window_impl(spec, S, omega, n_sweeps, interpret: bool = False,
                            fold: bool = False):
    if S.ndim != 3:
        # canonical layout is (B, ny, nx); batch dims flatten, 2-D gains B=1
        out = _sor_sweeps_window_impl(
            spec, S.reshape((-1,) + S.shape[-2:]), omega, n_sweeps,
            interpret=interpret, fold=fold)
        return out.reshape(S.shape)
    plan = window_plan(spec, S.shape)
    if plan is None:
        raise ValueError("no feasible window plan for this problem")
    B = S.shape[0]
    b_chunk = plan.b_chunk
    if b_chunk >= B:
        return _run_group(spec, S, omega, n_sweeps, plan, interpret, fold)

    # batch groups: per-slice weight planes (if any) slice with the state;
    # broadcast (size-1 or absent) batch dims are shared across groups
    import dataclasses

    spec = _flatten_spec_batch(spec, 2)
    outs = []
    for b0 in range(0, B, b_chunk):
        nb = min(b_chunk, B - b0)
        gspec = dataclasses.replace(
            spec,
            w=_bsl(spec.w, b0, nb, 1, 3), w0=_bsl(spec.w0, b0, nb, 0, 2),
            g=_bsl(spec.g, b0, nb, 0, 2),
            relax=_bsl(spec.relax, b0, nb, 0, 2),
            active=_bsl(spec.active, b0, nb, 0, 2))
        outs.append(_run_group(
            gspec, jax.lax.slice_in_dim(S, b0, b0 + nb, axis=0), omega,
            n_sweeps, plan, interpret, fold))
    return jnp.concatenate(outs, axis=0)


_jit_plain = jax.jit(_sor_sweeps_window_impl,
                     static_argnames=("interpret", "fold"))
_jit_tpu = jax.jit(_sor_sweeps_window_impl,
                   static_argnames=("interpret", "fold"),
                   compiler_options=WINDOW_COMPILER_OPTS)
# static sweep-count variants: the kernel unrolls its sweep loop (the
# fixed-iteration hot path; a dynamic SMEM trip count defeats Mosaic's
# scheduling)
_jit_plain_n = jax.jit(_sor_sweeps_window_impl,
                       static_argnames=("n_sweeps", "interpret", "fold"))
_jit_tpu_n = jax.jit(_sor_sweeps_window_impl,
                     static_argnames=("n_sweeps", "interpret", "fold"),
                     compiler_options=WINDOW_COMPILER_OPTS)


def sor_sweeps_window(spec, S, omega, n_sweeps, interpret: bool = False):
    """Run n_sweeps full red-black iterations on a >VMEM 2-D problem.

    Bit-identical to ``solve_fixed``'s XLA path (validated in
    tests/test_pallas_window.py).  ``n_sweeps`` may be traced; iterations
    run in chunks of the planned ``k_sweeps`` per pallas launch, the last
    chunk clamped inside the kernel via its SMEM sweep count.

    On TPU the jit carries the raised scoped-VMEM compiler option (see
    WINDOW_COMPILER_OPTS); elsewhere (CPU tests, interpret mode, or when
    inlined into an outer jit that sets the option itself) the plain jit
    is used — TPU-only options would fail the CPU compiler.
    """
    # compiler_options are only legal on a top-level jit: inside an outer
    # trace (e.g. the solve driver, which carries the option itself) use
    # the plain jit
    nested = isinstance(S, jax.core.Tracer)
    use_tpu_opts = (not interpret and not nested
                    and jax.default_backend() == "tpu")
    static_n = (isinstance(n_sweeps, (int, np.integer))
                and not isinstance(n_sweeps, jax.core.Tracer))
    if static_n:
        fn = _jit_tpu_n if use_tpu_opts else _jit_plain_n
        return fn(spec, S, omega, int(n_sweeps), interpret=interpret,
                  fold=FOLD_EXTEND)
    fn = _jit_tpu if use_tpu_opts else _jit_plain
    return fn(spec, S, omega, n_sweeps, interpret=interpret)


class WindowStepper(NamedTuple):
    """Checked-solve stepper bundle (see :func:`make_window_stepper`).

    ``freeze(st_old, st_new, done) -> st`` is set when the state
    representation needs custom per-batch-element freezing (batch-group
    tuples, whose leaves slice the batch axis); None means the caller's
    generic tree_map-where applies."""
    split: object
    join: object
    step_full: object
    step_dyn: object
    freeze: object = None


def make_window_stepper(spec, S, omega, check_every: int,
                        interpret: bool = False):
    """Pre-built stepper for CHECKED solves (the solver's while-loop body).

    Calling :func:`sor_sweeps_window` inside the convergence while loop
    rebuilds the (K+3)-plane stacked coefficient volume on EVERY check —
    ~(K+3) full-plane HBM writes + reads per check, which dominated the
    measured ~0.5 ms/check at 2048^2 (tools/tpu_cadence_ab.py, round 2:
    cadence 32 ran 1.17x solve_fixed).  This builds the plan and the W
    stack ONCE (loop-invariant operands of the outer while op) and fuses
    the masked-mean-|S| convergence norm into the kernel's tile write-back
    (SURVEY §7.1 item 2), so a check costs only its kernel launches.

    Returns ``(split, join, step_full, step_dyn)`` or None (no plan):

    - ``split(S) -> st`` / ``join(st) -> S`` — convert between the
      caller's array and the executor's state representation (a tuple of
      row-chunk arrays for split executors).  The caller keeps ``st`` as
      its loop carry: edge-split and row-chunk executors then never pay
      per-check split/join full-state copies (the one-call extend-folded
      sweep rate is what makes edge-split worth keeping: dropping it cost
      ~24% of the sweep rate at 2048^2 on the v5e);
    - ``step_full(st) -> (st', sumabs)`` — exactly ``check_every`` sweeps;
    - ``step_dyn(st, n) -> (st', sumabs)`` — ``n`` (traced, >= 1) sweeps
      via the SMEM-count kernel (runs once per solve, at the mxLoop clamp);

    ``sumabs`` is the batch-shaped total |S'| over the core cells
    (divide by ny*nx for the reference's absNorm mean).

    Batch-group plans (b_chunk < B: many moderate slices) carry the FULL
    flattened array as the state, slicing per-group views each window —
    ~2 state passes per check window, sub-1% at group scale — with every
    group's sliced spec / W stack / executor prebuilt once."""
    if S.ndim < 2:
        return None
    plan = window_plan(spec, S.shape)
    if plan is None:
        return None
    B = int(np.prod(S.shape[:-2], dtype=np.int64))
    tile, k, halo, y_chunk, b_chunk = plan
    dtype = S.dtype
    ny, nx = S.shape[-2:]
    batch_shape = S.shape[:-2]

    if b_chunk < B:
        return _make_group_stepper(spec, S, omega, check_every, interpret,
                                   plan)

    rel = (jnp.asarray(omega, dtype) * spec.relax).astype(dtype)
    W = _stack_planes(spec, rel, ny, nx, dtype)

    ex = _make_executor(spec, W, ny, tile, k, halo, y_chunk, interpret)

    def split(Sf):
        return ex.split(Sf.reshape((B, ny, nx)))

    def join(st):
        return ex.join(st).reshape(S.shape)

    # only the LAST launch of a check window carries the norm output: the
    # convergence rule reads the norm once per window, and the with_norm
    # kernel variant measured ~8.5% slower per launch than the plain one
    # (tools/tpu_stepper_probe.py), so earlier launches stay plain
    def step_full(st):
        st, nrm = _window_steps_full(ex, spec, st, check_every, k)
        return st, nrm.reshape(batch_shape)

    def step_dyn(st, n):
        st, nrm = _window_steps_dyn(ex, spec, st, n, k)
        return st, nrm.reshape(batch_shape)

    return WindowStepper(split, join, step_full, step_dyn)


def _window_steps_full(ex, spec, st, check_every, k):
    """check_every sweeps on executor state; norm on the final launch."""
    full, rem = divmod(int(check_every), k)
    if rem == 0:
        if full > 1:
            st = jax.lax.fori_loop(
                0, full - 1, lambda i, s: ex.step(spec, s, k, k), st)
        return ex.step(spec, st, k, k, with_norm=True)
    if full:
        st = jax.lax.fori_loop(
            0, full, lambda i, s: ex.step(spec, s, k, k), st)
    return ex.step(spec, st, rem, rem, with_norm=True)


def _window_steps_dyn(ex, spec, st, n, k):
    """n (traced, >= 1) sweeps: ceil(n/k)-1 plain k-sweep chunks, the final
    clamped chunk carries the norm."""
    n = jnp.asarray(n, jnp.int32)
    chunks = (n + k - 1) // k
    st = jax.lax.fori_loop(
        0, chunks - 1, lambda i, s: ex.step(spec, s, jnp.int32(k), None),
        st)
    return ex.step(spec, st, n - (chunks - 1) * k, None, with_norm=True)


def _make_group_stepper(spec, S, omega, check_every, interpret, plan):
    """Batch-group variant of :func:`make_window_stepper` (see there)."""
    import dataclasses

    tile, k, halo, y_chunk, b_chunk = plan
    dtype = S.dtype
    ny, nx = S.shape[-2:]
    B = int(np.prod(S.shape[:-2], dtype=np.int64))
    batch_shape = S.shape[:-2]
    spec_f = _flatten_spec_batch(spec, 2)

    groups = []
    for b0 in range(0, B, b_chunk):
        nb = min(b_chunk, B - b0)
        gspec = dataclasses.replace(
            spec_f,
            w=_bsl(spec_f.w, b0, nb, 1, 3), w0=_bsl(spec_f.w0, b0, nb, 0, 2),
            g=_bsl(spec_f.g, b0, nb, 0, 2),
            relax=_bsl(spec_f.relax, b0, nb, 0, 2),
            active=_bsl(spec_f.active, b0, nb, 0, 2))
        rel = (jnp.asarray(omega, dtype) * gspec.relax).astype(dtype)
        Wg = _stack_planes(gspec, rel, ny, nx, dtype)
        ex = _make_executor(gspec, Wg, ny, tile, k, halo, y_chunk, interpret)
        groups.append((b0, nb, gspec, ex))

    def split(Sf):
        Sf = Sf.reshape((B, ny, nx))
        return tuple(
            ex.split(jax.lax.slice_in_dim(Sf, b0, b0 + nb, axis=0))
            for b0, nb, gspec, ex in groups)

    def join(st):
        return jnp.concatenate(
            [ex.join(sg) for sg, (b0, nb, gspec, ex) in zip(st, groups)],
            axis=0).reshape(S.shape)

    def _run(st, stepper):
        outs, sums = [], []
        for sg, (b0, nb, gspec, ex) in zip(st, groups):
            sg, nrm = stepper(ex, gspec, sg)
            outs.append(sg)
            sums.append(nrm)
        return (tuple(outs),
                jnp.concatenate(sums, axis=0).reshape(batch_shape))

    def step_full(st):
        return _run(st, lambda ex, gs, sg: _window_steps_full(
            ex, gs, sg, check_every, k))

    def step_dyn(st, n):
        return _run(st, lambda ex, gs, sg: _window_steps_dyn(
            ex, gs, sg, n, k))

    def freeze(st_old, st_new, done):
        done = done.reshape((B,))
        out = []
        for so, sn, (b0, nb, gspec, ex) in zip(st_old, st_new, groups):
            d = jax.lax.slice_in_dim(done, b0, b0 + nb)[:, None, None]
            out.append(jax.tree_util.tree_map(
                lambda o, n_: jnp.where(d, o, n_), so, sn))
        return tuple(out)

    return WindowStepper(split, join, step_full, step_dyn, freeze)


def make_window_cheby_stepper(spec, S, omega, check_every: int,
                              interpret: bool = False):
    """Checked-solve stepper for the cyclic-Chebyshev scheme on the
    windowed kernel (round 2's scheme='cheby' forced the XLA roll path —
    solver.py's note that the fused kernels "bake a constant omega into
    their weight planes" stops being true here: the weight stack folds
    relax WITHOUT omega, and the per-half-sweep factors of the Golub-Varga
    recurrence ride into the kernel through SMEM, fac[2*i + color]).

    Returns ``(split, join, step_full, step_dyn)`` or None (no plan /
    batch groups).  Unlike the SOR stepper the steps also thread the
    recurrence state:

    - ``step_full(st, m, w) -> (st', m', w', sumabs)`` — check_every sweeps;
    - ``step_dyn(st, m, w, n) -> (st', m', w', sumabs)`` — n (traced) sweeps;

    where ``m`` (int32) counts half-sweeps done and ``w`` is the previous
    factor.  ``sumabs`` is the batch-shaped total |S'| (XLA reduction over
    the split chunks — one state read per check)."""
    from ..solver import _cheby_next, rho2_from_omega

    if S.ndim < 2:
        return None
    plan = window_plan(spec, S.shape)
    if plan is None:
        return None
    B = int(np.prod(S.shape[:-2], dtype=np.int64))
    if plan.b_chunk < B:
        return None
    tile, k, halo, y_chunk, _ = plan
    dtype = S.dtype
    ny, nx = S.shape[-2:]
    batch_shape = S.shape[:-2]
    rho2 = rho2_from_omega(jnp.asarray(omega, dtype)).astype(dtype)
    # relax WITHOUT omega: the factor arrives per half-sweep
    W = _stack_planes(spec, spec.relax.astype(dtype), ny, nx, dtype)

    ex = _make_executor(spec, W, ny, tile, k, halo, y_chunk, interpret)

    def split(Sf):
        return ex.split(Sf.reshape((B, ny, nx)))

    def join(st):
        return ex.join(st).reshape(S.shape)

    def sumabs(st):
        leaves = st if isinstance(st, tuple) else (st,)
        tot = sum(jnp.sum(jnp.abs(c), axis=(1, 2)) for c in leaves)
        return tot.reshape(batch_shape)

    def gen(m, w, count):
        """The next ``count`` factors of w(m+1) = 1/(1 - rho2*w(m)/4)."""
        def body(c, _):
            m, w = c
            w2 = _cheby_next(m, w, rho2).astype(dtype)
            return (m + 1, w2), w2
        (m, w), fac = jax.lax.scan(body, (m, w), None, length=count)
        return fac, m, w

    def step_full(st, m, w):
        full, rem = divmod(int(check_every), k)

        def body(i, c):
            st, m, w = c
            fac, m, w = gen(m, w, 2 * k)
            st = ex.step(spec, st, k, k, fac=fac)
            return (st, m, w)

        if full:
            st, m, w = jax.lax.fori_loop(0, full, body, (st, m, w))
        if rem:
            fac, m, w = gen(m, w, 2 * rem)
            st = ex.step(spec, st, rem, rem, fac=fac)
        return st, m, w, sumabs(st)

    def step_dyn(st, m, w, n):
        n = jnp.asarray(n, jnp.int32)
        chunks = (n + k - 1) // k

        def body(i, c):
            st, m, w = c
            # generate a full 2k window of factors, run only the clamped
            # count, and advance (m, w) by the half-sweeps actually run
            fac, _, _ = gen(m, w, 2 * k)
            kk = jnp.minimum(k, n - i * k)
            st = ex.step(spec, st, kk, None, fac=fac)
            steps = 2 * kk
            return (st, m + steps, fac[steps - 1])

        st, m, w = jax.lax.fori_loop(
            0, chunks, body, (st, jnp.asarray(m, jnp.int32), w))
        return st, m, w, sumabs(st)

    return WindowStepper(split, join, step_full, step_dyn)
