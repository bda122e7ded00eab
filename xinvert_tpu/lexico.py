# -*- coding: utf-8 -*-
"""Lexicographic Gauss-Seidel executor: the reference's exact iterate
sequence, TPU-parallelised.

The red-black engine (solver.py) reaches the same fixed point as the
reference but along a different transient, so fixed-ITERATION comparisons
against xinvert differ.  This executor reproduces the reference's
lexicographic in-place sweep (numbas.py:216-416) exactly — same values after
every iteration — by exploiting that the within-row update is a first-order
linear recurrence:

    S_new[i] = S_old[i] + r_i (g_i + sum_offrow w S_ctx
                               + w_xp[i] S_old[i+1] + w0_i S_old[i])
               + r_i w_xm[i] S_new[i-1]
             = A_i S_new[i-1] + B_i

which evaluates in O(log nx) with ``lax.associative_scan``; rows run
top-to-bottom under ``lax.scan`` (row j reads already-updated row j-1 from
the carry and old rows j+1 naturally).  Periodic-x follows the reference's
stanza order: west column first (old east value), interior recurrence, east
column last (new west/interior values).

Supports the radius-1-in-x 2-D families (standard, standard+E, general);
use it for fixed-iteration parity validation — the red-black engine remains
the throughput path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .solver import _apply_extend

__all__ = ["solve_fixed_lexicographic", "solve_fixed_lexicographic_3d"]


def _w_at(spec, k, j):
    return spec.w[k][..., j, :]


def _scan_linear(A, B):
    """y_i = A_i y_{i-1} + B_i with y_{-1} = 0, via associative scan."""
    A, B = jnp.broadcast_arrays(A, B)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    Acum, Bcum = jax.lax.associative_scan(combine, (A, B), axis=-1)
    return Bcum


@partial(jax.jit, static_argnames=("n_iters",))
def solve_fixed_lexicographic(spec, S, omega, n_iters: int):
    """Run n_iters reference-ordered sweeps (lexicographic in-place GS/SOR).

    Matches the reference kernels' per-iteration values (validated against
    the numpy oracle in tests/oracle.py).  2-D specs with |dx| <= 1 only.
    """
    if spec.ndim != 2:
        raise ValueError("lexicographic executor supports 2-D specs")
    if any(abs(off[1]) > 1 for off in spec.offsets):
        raise ValueError("within-row radius must be 1 (no biharmonic)")
    offs = {tuple(o): k for k, o in enumerate(spec.offsets)}
    kxp = offs.get((0, 1))
    kxm = offs.get((0, -1))
    periodic = spec.bcs[-1] == "periodic"
    ny = spec.w0.shape[-2]
    nx = spec.w0.shape[-1]
    omega = jnp.asarray(omega, S.dtype)

    # rows must be processed with static j for the j+dy indexing: use a
    # scan over traced j with dynamic_slice instead
    def offrow_acc_dyn(Scur, j):
        acc = jax.lax.dynamic_slice_in_dim(spec.g, j, 1, -2)[..., 0, :]
        for k, off in enumerate(spec.offsets):
            dy, dx = off
            if dy == 0:
                continue
            row = jax.lax.dynamic_slice_in_dim(Scur, j + dy, 1, -2)[..., 0, :]
            if dx:
                row = jnp.roll(row, -dx, axis=-1)
            wk = jax.lax.dynamic_slice_in_dim(spec.w[k], j, 1, -2)[..., 0, :]
            acc = acc + wk * row
        return acc

    def row_slice(a, j):
        return jax.lax.dynamic_slice_in_dim(a, j, 1, -2)[..., 0, :]

    def sweep_row_dyn(Scur, j):
        row_old = row_slice(Scur, j)
        ctx = offrow_acc_dyn(Scur, j)
        r = omega * row_slice(spec.relax, j)
        w0j = row_slice(spec.w0, j)
        wxp = row_slice(spec.w[kxp], j) if kxp is not None else 0.0
        wxm = row_slice(spec.w[kxm], j) if kxm is not None else 0.0

        if periodic:
            accw = ctx[..., 0] + (wxp[..., 0] * row_old[..., 1] if kxp is not None else 0.0) \
                + (wxm[..., 0] * row_old[..., nx - 1] if kxm is not None else 0.0)
            west = row_old[..., 0] + r[..., 0] * (accw + w0j[..., 0] * row_old[..., 0])
            row_w = row_old.at[..., 0].set(west)
        else:
            row_w = row_old

        Sop = jnp.roll(row_w, -1, axis=-1)
        base = row_w + r * (ctx + wxp * Sop + w0j * row_w)
        A = r * wxm if kxm is not None else jnp.zeros_like(row_w)
        Aseg = A[..., 1:nx - 1]
        Bseg = base[..., 1:nx - 1]
        Bseg = Bseg.at[..., 0].add(Aseg[..., 0] * row_w[..., 0])
        Aseg = Aseg.at[..., 0].set(0.0)
        interior = _scan_linear(Aseg, Bseg)
        row_new = row_w.at[..., 1:nx - 1].set(interior)

        if periodic:
            acce = ctx[..., nx - 1] \
                + (wxp[..., nx - 1] * row_new[..., 0] if kxp is not None else 0.0) \
                + (wxm[..., nx - 1] * row_new[..., nx - 2] if kxm is not None else 0.0)
            east = row_new[..., nx - 1] + r[..., nx - 1] * (
                acce + w0j[..., nx - 1] * row_new[..., nx - 1])
            row_new = row_new.at[..., nx - 1].set(east)

        nd = Scur.ndim
        return jax.lax.dynamic_update_slice_in_dim(
            Scur, row_new[..., None, :], j, nd - 2)

    def one_iter_dyn(_, Scur):
        Scur = _apply_extend(spec, Scur)

        def body(S, j):
            return sweep_row_dyn(S, j), None

        Scur, _ = jax.lax.scan(body, Scur, jnp.arange(1, ny - 1))
        return Scur

    return jax.lax.fori_loop(0, n_iters, one_iter_dyn, jnp.asarray(S))


@partial(jax.jit, static_argnames=("n_iters",))
def solve_fixed_lexicographic_3d(spec, S, omega, n_iters: int):
    """3-D reference-ordered sweeps (numbas.py:16-212 ordering: k outer,
    j middle, i inner).  Rows are (k, j) pairs scanned in lexicographic
    order; the within-row update uses the same associative-scan recurrence
    as the 2-D executor.  Unbatched 3-D states only (a parity tool)."""
    if spec.ndim != 3:
        raise ValueError("use solve_fixed_lexicographic for 2-D specs")
    if jnp.ndim(S) != 3:
        raise ValueError("unbatched 3-D state required")
    if any(abs(off[2]) > 1 for off in spec.offsets):
        raise ValueError("within-row radius must be 1")
    offs = {tuple(o): k for k, o in enumerate(spec.offsets)}
    kxp = offs.get((0, 0, 1))
    kxm = offs.get((0, 0, -1))
    periodic = spec.bcs[-1] == "periodic"
    nz, ny, nx = spec.w0.shape[-3:]
    omega = jnp.asarray(omega, S.dtype)

    def row(a, k, j):
        a1 = jax.lax.dynamic_slice_in_dim(a, k, 1, a.ndim - 3)
        a2 = jax.lax.dynamic_slice_in_dim(a1, j, 1, a.ndim - 2)
        return a2[..., 0, 0, :]

    def ctx(Scur, k, j):
        acc = row(spec.g, k, j)
        for m, off in enumerate(spec.offsets):
            dz, dy, dx = off
            if dz == 0 and dy == 0:
                continue
            r = row(Scur, k + dz, j + dy)
            if dx:
                r = jnp.roll(r, -dx, -1)
            acc = acc + row(spec.w[m], k, j) * r
        return acc

    def sweep_row(Scur, kj):
        k = 1 + kj // (ny - 2)
        j = 1 + kj % (ny - 2)
        row_old = row(Scur, k, j)
        c = ctx(Scur, k, j)
        r = omega * row(spec.relax, k, j)
        w0r = row(spec.w0, k, j)
        wxp = row(spec.w[kxp], k, j) if kxp is not None else 0.0
        wxm = row(spec.w[kxm], k, j) if kxm is not None else 0.0

        if periodic:
            accw = c[0] + (wxp[0] * row_old[1] if kxp is not None else 0.0) \
                + (wxm[0] * row_old[nx - 1] if kxm is not None else 0.0)
            west = row_old[0] + r[0] * (accw + w0r[0] * row_old[0])
            row_w = row_old.at[0].set(west)
        else:
            row_w = row_old

        Sop = jnp.roll(row_w, -1, -1)
        base = row_w + r * (c + wxp * Sop + w0r * row_w)
        A = r * wxm if kxm is not None else jnp.zeros_like(row_w)
        Aseg = A[1:nx - 1]
        Bseg = base[1:nx - 1]
        Bseg = Bseg.at[0].add(Aseg[0] * row_w[0])
        Aseg = Aseg.at[0].set(0.0)
        interior = _scan_linear(Aseg, Bseg)
        row_new = row_w.at[1:nx - 1].set(interior)

        if periodic:
            acce = c[nx - 1] \
                + (wxp[nx - 1] * row_new[0] if kxp is not None else 0.0) \
                + (wxm[nx - 1] * row_new[nx - 2] if kxm is not None else 0.0)
            east = row_new[nx - 1] + r[nx - 1] * (
                acce + w0r[nx - 1] * row_new[nx - 1])
            row_new = row_new.at[nx - 1].set(east)

        return jax.lax.dynamic_update_slice(
            Scur, row_new[None, None, :], (k, j, 0))

    def one_iter(_, Scur):
        Scur = _apply_extend(spec, Scur)

        def body(Sc, kj):
            return sweep_row(Sc, kj), None

        Scur, _ = jax.lax.scan(body, Scur,
                               jnp.arange((nz - 2) * (ny - 2)))
        return Scur

    return jax.lax.fori_loop(0, n_iters, one_iter, jnp.asarray(S))
