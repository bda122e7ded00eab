# -*- coding: utf-8 -*-
"""Explicit halo-exchange SOR executor: ``shard_map`` over a ('y','x') mesh
with ``lax.ppermute`` ring shifts of the block edges.

The GSPMD path (mesh.py) lets the partitioner derive the halo traffic from
sharding annotations.  This module is the hand-scheduled equivalent — the
collective pattern the BASELINE targets name explicitly: per sweep, each
device ppermutes its edge rings to its mesh neighbors, pads its local block,
and runs the red-black update on the padded block.  Periodic x wraps
naturally around the ring; non-periodic global edges receive a wrapped ring
whose values are never used (the global boundary cells there are inactive,
their relax weight is zero).

Correctness requires the red/black parity and the extend-BC pre-pass to be
computed in GLOBAL coordinates; both are derived from the device's block
offset (`lax.axis_index` x local block shape) inside the mapped function.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map            # jax >= 0.8
except ImportError:                      # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..stencil import StencilSpec

__all__ = ["solve_fixed_halo"]


def _ring_halo(local, axis_name, width, axis, n):
    """Gather `width` rows/cols from both mesh neighbors along `axis`.

    Returns (lo_halo, hi_halo): the neighbor data adjacent to this block's
    low/high edge (wrap-around ring; callers mask or ignore invalid use).
    `n` is the static mesh extent along `axis_name`.
    """
    def take(sl):
        return jax.lax.slice_in_dim(local, *sl, axis=axis)

    size = local.shape[axis]
    hi_edge = (size - width, size)    # my top rows -> neighbor below me
    lo_edge = (0, width)

    if n == 1:
        # single device on this axis: ring neighbor is myself (periodic wrap)
        return take(hi_edge), take(lo_edge)

    fwd = [(i, (i + 1) % n) for i in range(n)]     # send toward +axis
    bwd = [(i, (i - 1) % n) for i in range(n)]
    lo_halo = jax.lax.ppermute(take(hi_edge), axis_name, fwd)
    hi_halo = jax.lax.ppermute(take(lo_edge), axis_name, bwd)
    return lo_halo, hi_halo


def _pad_with_halos(local, ring, mesh_yx):
    """Pad the 2 trailing axes of the local block with exchanged halos."""
    my_, mx_ = mesh_yx
    lo_y, hi_y = _ring_halo(local, "y", ring, local.ndim - 2, my_)
    local = jnp.concatenate([lo_y, local, hi_y], axis=local.ndim - 2)
    lo_x, hi_x = _ring_halo(local, "x", ring, local.ndim - 1, mx_)
    return jnp.concatenate([lo_x, local, hi_x], axis=local.ndim - 1)


def solve_fixed_halo(spec: StencilSpec, S, omega, n_iters: int,
                     mesh: Optional[Mesh] = None):
    """Fixed-iteration sharded solve with explicit ppermute halo exchange.

    Equivalent to ``solve_fixed`` for 2-D specs; batch dims are supported
    and stay unsharded (shard over 'batch' with the GSPMD path if needed).
    """
    if spec.ndim != 2:
        raise ValueError("halo executor supports 2-D problems")
    for name in ("w0", "g", "relax"):
        a = getattr(spec, name)
        if a.ndim > jnp.ndim(S):
            raise ValueError(
                f"spec.{name} has batch dims beyond S (shape {a.shape} vs "
                f"{jnp.shape(S)}); pass a matching batched S or an "
                "unbatched spec")
    if mesh is None:
        from .mesh import make_grid_mesh
        mesh = make_grid_mesh()
    ring = 2 if spec.bih else 1
    ny, nx = S.shape[-2:]
    my_, mx_ = mesh.shape["y"], mesh.shape["x"]
    if ny % my_ or nx % mx_:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {my_}x{mx_}")
    by, bx = ny // my_, nx // mx_
    if by < ring or bx < ring:
        raise ValueError("block smaller than halo ring")

    omega = jnp.asarray(omega, S.dtype)
    from ..solver import _color_relax
    rr, rb = _color_relax(spec, omega)

    grid_spec = P(*((None,) * (S.ndim - 2) + ("y", "x")))

    def plane_spec(a):
        return P(*((None,) * (a.ndim - 2) + ("y", "x")))

    extend_y = spec.bcs[-2] == "extend"
    periodic_x = spec.bcs[-1] == "periodic"
    offsets = spec.offsets
    nd = S.ndim

    def crop(a):
        return a[..., ring:-ring, ring:-ring]

    def local_step(w, w0, g, rrl, rbl, Sl):
        iy = jax.lax.axis_index("y")
        ix = jax.lax.axis_index("x")
        y0 = iy * by
        x0 = ix * bx

        # global red/black parity of the local block origin
        row = jax.lax.broadcasted_iota(jnp.int32, (by, bx), 0) + y0
        col = jax.lax.broadcasted_iota(jnp.int32, (by, bx), 1) + x0
        red = ((row + col) % 2 == 0).astype(Sl.dtype)
        rr_loc = rrl * red
        rb_loc = rbl * (1.0 - red)

        first_y = iy == 0
        last_y = iy == my_ - 1

        def apply_extend(Sp):
            """Extend-BC pre-pass on the PADDED block: boundary rows copy the
            adjacent interior row(s), with corner clamping for non-periodic
            x.  Shift sources are at most `ring` rows/cols away, so the halo
            padding guarantees they are present even when the source row
            lives on a neighboring device.  Mirrors solver._apply_extend."""
            shp = Sp.shape[-2:]
            grow = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + y0 - ring
            gcol = jax.lax.broadcasted_iota(jnp.int32, shp, 1) + x0 - ring
            up1 = jnp.roll(Sp, -1, nd - 2)
            dn1 = jnp.roll(Sp, 1, nd - 2)

            def colfix(a, width):
                if periodic_x:
                    return a
                # clamp the outermost columns to the nearest interior column
                out = a
                for w in range(1, width + 1):
                    out = jnp.where(gcol == w - 1,
                                    jnp.roll(a, -(width - w + 1), nd - 1), out)
                    out = jnp.where(gcol == nx - w,
                                    jnp.roll(a, width - w + 1, nd - 1), out)
                return out

            if not spec.bih:
                top = colfix(up1, 1)
                bot = colfix(dn1, 1)
                Sp = jnp.where(jnp.logical_and(first_y, grow == 0), top, Sp)
                Sp = jnp.where(jnp.logical_and(last_y, grow == ny - 1), bot, Sp)
                return Sp

            up2 = jnp.roll(Sp, -2, nd - 2)
            dn2 = jnp.roll(Sp, 2, nd - 2)
            if periodic_x:
                top = up1                       # row0<-S[1], row1<-S[2]
            else:
                top = jnp.where(grow == 0, up2, up1)   # both rows <- S[2]
                top = colfix(top, 2)
            bot = jnp.where(grow == ny - 1, dn2, dn1)  # both rows <- S[-3]
            if not periodic_x:
                bot = colfix(bot, 2)
            Sp = jnp.where(jnp.logical_and(first_y, grow <= 1), top, Sp)
            Sp = jnp.where(jnp.logical_and(last_y, grow >= ny - 2), bot, Sp)
            return Sp

        def one_iter(_, S):
            # pad with fresh halos, then (optionally) extend rows; re-pad so
            # neighbors of the edge devices see the extended values
            Sp = _pad_with_halos(S, ring, (my_, mx_))
            if extend_y:
                Sp = _pad_with_halos(crop(apply_extend(Sp)), ring, (my_, mx_))
            for rel in (rr_loc, rb_loc):
                acc = g
                for k, off in enumerate(offsets):
                    dy, dx = off
                    acc = acc + w[k] * jax.lax.dynamic_slice_in_dim(
                        jax.lax.dynamic_slice_in_dim(
                            Sp, ring + dy, by, nd - 2),
                        ring + dx, bx, nd - 1)
                Sl_c = crop(Sp)
                Snew = Sl_c + rel * (acc + w0 * Sl_c)
                Sp = _pad_with_halos(Snew, ring, (my_, mx_))
            return crop(Sp)

        return jax.lax.fori_loop(0, n_iters, one_iter, Sl)

    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(plane_spec(spec.w), plane_spec(spec.w0), plane_spec(spec.g),
                  plane_spec(rr), plane_spec(rb), grid_spec),
        out_specs=grid_spec,
    )
    return mapped(spec.w, spec.w0, spec.g, rr, rb, jnp.asarray(S))
