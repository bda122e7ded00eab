# -*- coding: utf-8 -*-
"""Dispatch-level API: one ``inv_*`` per stencil family, taking coefficient
fields directly (mirrors /root/reference/xinvert/core.py:20-532).

These are the mid-level entry points the reference exports publicly: the
application layer builds coefficients and calls these; power users call them
directly with custom coefficients.  Unlike the reference — which loops
non-core dims sequentially and mutates numpy slices in place — the batch
dims here ride through one vectorised on-device solve.

Coefficient semantics per family (staggering, units) follow the reference
kernels exactly; see the stencil module for the folded forms.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .field import Field, as_field
from .grid import Grid
from .solver import solve
from . import stencil
from .models.params import default_iParams, merge_params

__all__ = [
    "inv_standard1D", "inv_standard2D", "inv_standard2D_test",
    "inv_standard3D", "inv_general2D", "inv_general2D_bih", "inv_general3D",
]


def _undef_mask(vals, undef):
    import math
    if isinstance(undef, float) and math.isnan(undef):
        return ~np.isnan(vals)
    return (vals != undef) & ~np.isnan(vals)


def _run(family, coeffs, F, dims, coords, iParams, ndim, icbc=None):
    iP = merge_params(default_iParams, iParams)
    f = as_field(F)
    dims = [dims] if isinstance(dims, str) else list(dims)
    if len(dims) != ndim:
        raise ValueError(f"{ndim:2d} dimensional forcing are needed")
    batch = tuple(d for d in f.dims if d not in dims)
    order = batch + tuple(dims)
    ft = f.transpose(*order) if f.dims != order else f
    vals = np.asarray(ft.values, np.float64)
    Fdef = _undef_mask(vals, iP["undef"])

    bcs_all = list(iP["BCs"])
    if ndim > 1 and len(bcs_all) < ndim:
        raise ValueError(
            f"iParams['BCs'] needs {ndim} entries (one per dim in {dims}), "
            f"got {bcs_all}")
    bcs = tuple(bcs_all[:ndim]) if ndim > 1 else (bcs_all[0],)
    grid = Grid.make(dims, [ft.coords[d] for d in dims], coords, bcs)

    # align coefficient fields to the core grid
    cs = []
    for c in coeffs:
        if np.isscalar(c):
            cs.append(jnp.full(grid.shape, float(c)))
            continue
        cf = as_field(c) if hasattr(c, "dims") else Field(np.asarray(c), dims)
        cdims = [d for d in dims if d in cf.dims]
        if tuple(cdims) != cf.dims:
            cf = cf.transpose(*cdims)
        shape = [1] * ndim
        for d in cf.dims:
            shape[dims.index(d)] = cf.shape[cf.dims.index(d)]
        cs.append(jnp.asarray(np.broadcast_to(
            np.asarray(cf.values, np.float64).reshape(shape), grid.shape)))

    Fm = jnp.where(jnp.asarray(Fdef), jnp.asarray(vals), 0.0)
    if Fdef.ndim == ndim:
        Fdef_core = Fdef
    else:
        flat = Fdef.reshape((-1,) + Fdef.shape[-ndim:])
        Fdef_core = flat[0] if bool(np.all(flat == flat[0])) else Fdef
    spec = family(*cs, Fm, jnp.asarray(Fdef_core), grid.deltas, grid.bcs)

    S0 = np.zeros_like(vals)
    if icbc is not None:
        fi = as_field(icbc)
        ic = np.broadcast_to(np.asarray(fi.values, np.float64), vals.shape)
        mask = ~Fdef
        for ax_core, bc in enumerate(grid.bcs):
            if bc == "periodic":
                continue
            ax = vals.ndim - ndim + ax_core
            edge = np.zeros(vals.shape[ax], bool)
            edge[0] = edge[-1] = True
            mask = mask | edge.reshape([-1 if i == ax else 1
                                        for i in range(vals.ndim)])
        S0 = np.where(mask, ic, 0.0)

    omega = iP["optArg"] if iP["optArg"] is not None else grid.omega_opt
    res = solve(spec, jnp.asarray(S0), omega=omega, tol=iP["tolerance"],
                max_iters=iP["mxLoop"])
    S = np.asarray(res.S)
    if icbc is None:
        S = np.where(Fdef, S, iP["undef"])
    out = Field(S, ft.dims, ft.coords, name="inverted")
    return out.transpose(*f.dims) if out.dims != f.dims else out


def inv_standard2D(A, B, C, F, dims, coords="lat-lon", icbc=None,
                   iParams=None):
    """d/dy(A Sy + B Sx) + d/dx(B Sy + C Sx) = F (core.py:88-155)."""
    def fam(A_, B_, C_, Fm, Fdef, deltas, bcs):
        return stencil.standard_2d(A_, B_, C_, Fm, Fdef, deltas, bcs)
    return _run(fam, (A, B, C), F, dims, coords, iParams, 2, icbc)


def inv_standard2D_test(A, B, C, D, E, F, dims, coords="lat-lon", icbc=None,
                        iParams=None):
    """Standard 2D + separate cross coefficients + linear E S term
    (core.py:159-230)."""
    def fam(A_, B_, C_, D_, E_, Fm, Fdef, deltas, bcs):
        return stencil.standard_2d_e(A_, B_, C_, D_, E_, Fm, Fdef, deltas, bcs)
    return _run(fam, (A, B, C, D, E), F, dims, coords, iParams, 2, icbc)


def inv_standard1D(A, B, F, dims, coords="lat", icbc=None, iParams=None):
    """d/dx(A Sx) + B S = F (core.py:234-290)."""
    def fam(A_, B_, Fm, Fdef, deltas, bcs):
        return stencil.standard_1d(A_, B_, Fm, Fdef, deltas, bcs)
    return _run(fam, (A, B), F, dims, coords, iParams, 1, icbc)


def inv_standard3D(A, B, C, F, dims, coords="lat-lon", icbc=None,
                   iParams=None):
    """d/dz(A Sz) + d/dy(B Sy) + d/dx(C Sx) = F (core.py:20-85)."""
    def fam(A_, B_, C_, Fm, Fdef, deltas, bcs):
        return stencil.standard_3d(A_, B_, C_, Fm, Fdef, deltas, bcs)
    return _run(fam, (A, B, C), F, dims, coords, iParams, 3, icbc)


def inv_general2D(A, B, C, D, E, F, G, dims, coords="lat-lon", icbc=None,
                  iParams=None):
    """A Syy + B Syx + C Sxx + D Sy + E Sx + F S = G (core.py:374-443)."""
    def fam(A_, B_, C_, D_, E_, F_, Gm, Fdef, deltas, bcs):
        return stencil.general_2d(A_, B_, C_, D_, E_, F_, Gm, Fdef, deltas, bcs)
    return _run(fam, (A, B, C, D, E, F), G, dims, coords, iParams, 2, icbc)


def inv_general2D_bih(A, B, C, D, E, F, G, H, I, J, dims, coords="lat-lon",
                      icbc=None, iParams=None):
    """Biharmonic general 2D, 13/17-point stencil (core.py:447-532)."""
    def fam(A_, B_, C_, D_, E_, F_, G_, H_, I_, Jm, Fdef, deltas, bcs):
        return stencil.general_2d_bih(A_, B_, C_, D_, E_, F_, G_, H_, I_, Jm,
                                      Fdef, deltas, bcs)
    return _run(fam, (A, B, C, D, E, F, G, H, I), J, dims, coords, iParams,
                2, icbc)


def inv_general3D(A, B, C, D, E, F, G, H, dims, coords="lat-lon", icbc=None,
                  iParams=None):
    """A Szz + B Syy + C Sxx + D Sz + E Sy + F Sx + G S = H
    (core.py:294-370)."""
    def fam(A_, B_, C_, D_, E_, F_, G_, Hm, Fdef, deltas, bcs):
        return stencil.general_3d(A_, B_, C_, D_, E_, F_, G_, Hm, Fdef,
                                  deltas, bcs)
    return _run(fam, (A, B, C, D, E, F, G), H, dims, coords, iParams, 3, icbc)
