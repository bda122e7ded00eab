# -*- coding: utf-8 -*-
"""Coefficient builders: physics problem -> compiled StencilSpec.

Each ``build_*`` replicates one reference coefficient builder
(/root/reference/xinvert/apps.py:1397-2109) as plain array math — spherical
metrics, half-grid staggering, Coriolis profiles — and compiles the result
with the matching stencil family from :mod:`xinvert_tpu.stencil`.

Inputs are raw arrays: ``F`` the forcing with arbitrary leading batch dims and
the core grid trailing; ``Fdef`` a boolean defined-mask of the same (or core)
shape; ``grid`` a :class:`~xinvert_tpu.grid.Grid`; ``mp`` the model-parameter
dict.  Parameters that are fields must already be broadcastable to the core
shape (the API layer handles named-dim alignment).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import stencil
from ..grid import Grid
from .params import UNDEFTMP

__all__ = [
    "build_poisson", "build_refstate", "build_geoadjustment",
    "build_refstate_swm", "build_pv2d", "build_eliassen",
    "build_gillmatsuno", "build_gillmatsuno_test", "build_stommel",
    "build_stommel_test", "build_stommelmunk", "build_stommelarons",
    "build_geostrophic", "build_bretherton", "build_fofonoff",
    "build_omega", "build_ocean3d", "BUILDERS",
]


# ------------------------------------------------------------------ helpers

def _bcast(profile, core_ndim, axis):
    """Lift a coordinate profile / parameter to core rank.

    1-D profiles reshape onto core axis ``axis``; scalars become all-ones
    rank; arrays already at core rank (Field-valued mParams aligned by
    ``_resolve_mp``) pass through unchanged — so profile*param products
    broadcast correctly whatever the parameter's rank (the reference gets
    this for free from xarray named-dim broadcasting)."""
    p = np.asarray(profile, dtype=np.float64)
    if p.ndim == core_ndim:
        return p
    if p.ndim == 0:
        return p.reshape((1,) * core_ndim)
    shape = [1] * core_ndim
    shape[axis] = p.size
    return p.reshape(shape)


def _half(profile):
    """Half-grid average: h[j] = (p[j] + p[j-1]) / 2, NaN at j=0.

    Matches the reference's ``(lats + lats.shift(1)) / 2`` staggering
    (e.g. apps.py:1404); the NaN leading entry only ever feeds rows that the
    sweep never updates, and is zeroed out during stencil finalisation.
    """
    p = np.asarray(profile, dtype=np.float64)
    h = np.empty_like(p)
    h[0] = np.nan
    h[1:] = 0.5 * (p[1:] + p[:-1])
    return h


def _fill(F, Fdef, value=0.0):
    return jnp.where(Fdef, F, value)


def _grad_coord(vals, coord, axis=0):
    """d(vals)/d(coord) via central differences (xarray.differentiate);
    ``axis`` locates the coordinate axis when ``vals`` is core-rank."""
    vals = np.asarray(vals, np.float64)
    coord = np.asarray(coord, np.float64)
    if vals.ndim <= 1:
        return np.gradient(vals, coord)
    return np.gradient(vals, coord, axis=axis)


def _deg2m(rearth):
    return rearth / 180.0 * np.pi


def _coriolis_profiles(grid: Grid, mp, axis):
    """(f at grid, f at half grid, cos, cosH, lat_rad) along core `axis`."""
    lat = grid.coords[axis]
    latr = np.deg2rad(lat)
    f = 2.0 * mp["Omega"] * np.sin(latr)
    fH = 2.0 * mp["Omega"] * np.sin(_half(latr))
    return f, fH, np.cos(latr), np.cos(_half(latr)), latr


# ----------------------------------------------------------------- builders

def poisson_coeffs(F, Fdef, grid: Grid):
    """The Poisson A/C planes and scaled forcing (apps.py:1397-1437);
    shared by the SOR builder and the multigrid entry point."""
    nd = grid.ndim
    shape = grid.shape
    ct = grid.coord_type
    if ct == "lat-lon":
        latr = np.deg2rad(grid.coords[0])
        cosG = _bcast(np.cos(latr), nd, 0)
        cosH = _bcast(np.cos(_half(latr)), nd, 0)
        A = np.broadcast_to(cosH, shape)
        C = np.broadcast_to(1.0 / cosG, shape)
        Fs = _fill(F, Fdef) * jnp.asarray(cosG)
    elif ct == "z-lat":
        cosG = _bcast(np.cos(np.deg2rad(grid.coords[1])), nd, 1)
        A = np.ones(shape)
        C = np.ones(shape)
        Fs = _fill(F, Fdef) * jnp.asarray(cosG)
    elif ct in ("z-lon", "cartesian"):
        A = np.ones(shape)
        C = np.ones(shape)
        Fs = _fill(F, Fdef)
    else:
        raise ValueError(f"unsupported coords {ct} for Poisson")
    return A, C, Fs


def build_poisson(F, Fdef, grid: Grid, mp):
    """Poisson equation (apps.py:1397-1437)."""
    A, C, Fs = poisson_coeffs(F, Fdef, grid)
    return stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(C), Fs, Fdef,
                               grid.deltas, grid.bcs, include_cross=False)


def refstate_std_coeffs(Q, Qdef, grid: Grid, mp):
    """The RefState A/C planes and filled forcing (apps.py:1440-1467);
    shared by the SOR builder and the multigrid entry point.

    Note the reference divides by the *sentinel-filled* PV and by the raw
    second coordinate (degrees for z-lat) — replicated as-is.  C depends
    on the PV field itself, so batched inputs give batched planes (the MG
    driver requires the batch-invariant single-slice case).
    """
    nd = grid.ndim
    shape = grid.shape
    Gamma = np.asarray(mp["Gamma"], np.float64)
    g = mp["g"]
    Q_sent = _fill(Q, Qdef, UNDEFTMP)
    x = _bcast(grid.coords[1], nd, 1)
    if grid.coord_type == "z-lat":
        A = np.broadcast_to(_bcast(np.sin(np.deg2rad(grid.coords[1])), nd, 1), shape)
        C = jnp.asarray(Gamma) * g / Q_sent / jnp.asarray(x)
    elif grid.coord_type == "cartesian":
        ang0 = mp.get("Ang0", mp.get("ang0"))
        A = np.broadcast_to(2.0 * ang0 / x ** 3, shape)
        C = jnp.asarray(Gamma) * g / Q_sent / jnp.asarray(x)
    else:
        raise ValueError("refstate supports z-lat or cartesian")
    Fs = _fill(Q, Qdef)
    return jnp.asarray(A), 0.0, C, Fs


def build_refstate(Q, Qdef, grid: Grid, mp):
    """Balanced symmetric-vortex PV inversion (apps.py:1440-1467)."""
    A, B, C, Fs = refstate_std_coeffs(Q, Qdef, grid, mp)
    return stencil.standard_2d(A, B, C, Fs, Qdef,
                               grid.deltas, grid.bcs, include_cross=False)


def build_geoadjustment(h0, hdef, grid: Grid, mp):
    """Geostrophic adjustment, 1-D standard form (apps.py:1527-1552)."""
    if grid.coord_type != "lat":
        raise ValueError("geoadjustment supports coords='lat' only")
    g = mp["g"]
    f, fH, cosG, cosH, _ = _coriolis_profiles(grid, mp, 0)
    A = jnp.asarray(cosH / fH)
    B = -jnp.asarray(f * cosG) / g / _fill(h0, hdef, UNDEFTMP)
    Fs = jnp.broadcast_to(jnp.asarray(-f * cosG / g), jnp.shape(h0))
    return stencil.standard_1d(A, B, Fs, hdef, grid.deltas, grid.bcs)


def build_refstate_swm(Q, Qdef, grid: Grid, mp):
    """Shallow-water reference state, 1-D (apps.py:1470-1524)."""
    if grid.coord_type != "lat":
        raise ValueError("refstate_swm supports coords='lat' only")
    g, Re, Om = mp["g"], mp["Rearth"], mp["Omega"]
    M0 = np.asarray(mp["M0"], np.float64)
    C0 = np.asarray(mp["C0"], np.float64)
    latr = np.deg2rad(grid.coords[0])
    cosG, cosH, sinG = np.cos(latr), np.cos(_half(latr)), np.sin(latr)
    asin = Re * sinG
    acos = Re * cosG
    acos = np.where(acos < 0, -acos * 0.1, acos)  # positive near poles
    delY = abs(latr[0] - latr[1]) * Re
    # diff = d/dy((1/cosH) dM0/dy): the reference's local numba diff_2nd
    # (apps.py:1482-1493), zero at the end points.
    diff = np.zeros_like(M0)
    dM = np.diff(M0)  # M[j+1] - M[j]
    diff[1:-1] = (dM[1:] / cosH[2:] - dM[:-1] / cosH[1:-1]) / delY ** 2
    A = jnp.asarray(1.0 / cosH)
    B = -C0 * _fill(Q, Qdef, UNDEFTMP) * jnp.asarray(asin / (np.pi * g * acos ** 3))
    Fs = jnp.asarray(-(asin * C0 ** 2 / (2.0 * np.pi * g * acos ** 3))
                     + (2.0 * np.pi * Om ** 2 * asin * acos) / g - diff)
    Fs = jnp.broadcast_to(Fs, jnp.shape(Q))
    return stencil.standard_1d(A, B, Fs, Qdef, grid.deltas, grid.bcs)


def pv2d_std_coeffs(PV, PVdef, grid: Grid, mp):
    """The PV2D A/B/C planes and scaled forcing (apps.py:1556-1579);
    shared by the SOR builder and the multigrid entry point."""
    shape = grid.shape
    A = np.broadcast_to(np.asarray(mp["f0"], np.float64) ** 2
                        / np.asarray(mp["N2"], np.float64), shape)
    C = np.ones(shape)
    return jnp.asarray(A), 0.0, jnp.asarray(C), _fill(PV, PVdef)


def build_pv2d(PV, PVdef, grid: Grid, mp):
    """QG PV inversion in (p, y) (apps.py:1556-1579)."""
    A, B, C, Fs = pv2d_std_coeffs(PV, PVdef, grid, mp)
    return stencil.standard_2d(A, B, C, Fs, PVdef,
                               grid.deltas, grid.bcs, include_cross=False)


def eliassen_std_coeffs(F, Fdef, grid: Grid, mp):
    """The Eliassen A/B/C planes and scaled forcing (apps.py:1582-1606)."""
    shape = grid.shape
    dt = jnp.asarray(F).dtype
    A = jnp.broadcast_to(jnp.asarray(mp["A"], dt), shape)
    B = jnp.broadcast_to(jnp.asarray(mp["B"], dt), shape)
    C = jnp.broadcast_to(jnp.asarray(mp["C"], dt), shape)
    return A, B, C, _fill(F, Fdef)


def build_eliassen(F, Fdef, grid: Grid, mp):
    """Sawyer-Eliassen overturning with full cross terms (apps.py:1582-1606)."""
    A, B, C, Fs = eliassen_std_coeffs(F, Fdef, grid, mp)
    return stencil.standard_2d(A, B, C, Fs, Fdef, grid.deltas, grid.bcs,
                               include_cross=True)


def _gm_c1c2(grid: Grid, mp):
    """The Gill-Matsuno c1/c2 profiles and metric pieces along y (axis 0),
    all lifted to core rank so Field-valued parameters (e.g. a 2-D epsilon)
    broadcast correctly against them."""
    nd = grid.ndim
    eps = _bcast(mp["epsilon"], nd, 0)
    if grid.coord_type == "lat-lon":
        lat = grid.coords[0]
        latr = _bcast(np.deg2rad(lat), nd, 0)
        f = 2.0 * mp["Omega"] * np.sin(latr)
        c1 = eps / (eps ** 2 + f ** 2)
        c2 = f / (eps ** 2 + f ** 2)
        deg2m = _deg2m(mp["Rearth"])
        dc1 = _grad_coord(c1, lat, axis=0) / deg2m
        dc2 = _grad_coord(c2, lat, axis=0) / deg2m
        return f, c1, c2, dc1, dc2, latr
    ydef = grid.coords[0]
    # lift the coordinate BEFORE the param product (a core-rank Field
    # beta against a raw 1-D y would trailing-dim mis-broadcast)
    f = mp["f0"] + mp["beta"] * _bcast(ydef, nd, 0)
    c1 = eps / (eps ** 2 + f ** 2)
    c2 = f / (eps ** 2 + f ** 2)
    dc1 = _grad_coord(c1, ydef, axis=0)
    dc2 = _grad_coord(c2, ydef, axis=0)
    return f, c1, c2, dc1, dc2, None


def gillmatsuno_coeffs(Q, Qdef, grid: Grid, mp):
    """Gill-Matsuno general-2D coefficient planes (A..F) and filled forcing
    G (apps.py:1609-1657); shared by the SOR builder and the multigrid
    entry point."""
    nd, shape = grid.ndim, grid.shape
    Phi = mp["Phi"]
    f, c1, c2, dc1, dc2, latr = _gm_c1c2(grid, mp)
    if grid.coord_type == "lat-lon":
        cosL = np.cos(latr)
        A = c1 * Phi
        C = c1 * Phi / cosL ** 2
        D = Phi * (dc1 + c1 * np.tan(latr) / mp["Rearth"])
        E = -Phi * dc2 / cosL
    else:
        A = c1 * Phi
        C = c1 * Phi
        D = Phi * dc1
        E = -Phi * dc2
    b = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    Fc = jnp.asarray(np.broadcast_to(
        _bcast(-np.asarray(mp["epsilon"], np.float64), nd, 0), shape),
        jnp.asarray(Q).dtype)
    G = _fill(Q, Qdef)
    return b(A), jnp.zeros(shape), b(C), b(D), b(E), Fc, G


def build_gillmatsuno(Q, Qdef, grid: Grid, mp):
    """Gill-Matsuno heat-induced circulation, general 2D (apps.py:1609-1657)."""
    A, B, C, D, E, Fc, G = gillmatsuno_coeffs(Q, Qdef, grid, mp)
    return stencil.general_2d(A, B, C, D, E, Fc, G,
                              Qdef, grid.deltas, grid.bcs)


def gillmatsuno_test_e_coeffs(Q, Qdef, grid: Grid, mp):
    """Gill-Matsuno standardised-form +Eψ planes (apps.py:1660-1709);
    shared by the SOR builder and the multigrid entry point."""
    nd, shape = grid.ndim, grid.shape
    Phi, eps = mp["Phi"], _bcast(mp["epsilon"], nd, 0)
    pr = lambda p: _bcast(p, nd, 0)      # profiles to core rank (Field mp)
    if grid.coord_type == "lat-lon":
        lat = grid.coords[0]
        latr = np.deg2rad(lat)
        cosG, cosH = pr(np.cos(latr)), pr(np.cos(_half(latr)))
        # lift the sin profiles BEFORE the Omega product (Field Omega)
        fG = 2.0 * mp["Omega"] * pr(np.sin(latr))
        fH = 2.0 * mp["Omega"] * pr(np.sin(_half(latr)))
        scaleF = cosG
    else:
        y = np.asarray(grid.coords[0], np.float64)
        fG = mp["f0"] + mp["beta"] * pr(y)
        fH = mp["f0"] + mp["beta"] * pr(_half(y))
        cosG = np.ones(pr(y).shape)
        cosH = np.ones(pr(y).shape)
        scaleF = None
    c1G = eps / (eps ** 2 + fG ** 2)
    c1H = eps / (eps ** 2 + fH ** 2)
    c2G = fG / (eps ** 2 + fG ** 2)
    b = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    A = b(c1H * Phi * cosH)
    B = b(-c2G * Phi)
    C = b(c2G * Phi)
    D = b(c1G * Phi / cosG)
    E = b(-eps * cosG)
    Fs = _fill(Q, Qdef)
    if scaleF is not None:
        Fs = Fs * jnp.asarray(_bcast(scaleF, nd, 0))
    return A, B, C, D, E, Fs


def build_gillmatsuno_test(Q, Qdef, grid: Grid, mp):
    """Gill-Matsuno in standardised (flux) form (apps.py:1660-1709)."""
    A, B, C, D, E, Fs = gillmatsuno_test_e_coeffs(Q, Qdef, grid, mp)
    return stencil.standard_2d_e(A, B, C, D, E, Fs, Qdef, grid.deltas,
                                 grid.bcs)


def stommel_coeffs(curl, cdef, grid: Grid, mp):
    """Stommel general-2D coefficient planes (apps.py:1712-1748); shared by
    the SOR builder and the multigrid entry point."""
    nd, shape = grid.ndim, grid.shape
    R = _bcast(mp["R"], nd, 0)
    depth, rho0 = _bcast(mp["D"], nd, 0), _bcast(mp["rho0"], nd, 0)
    zero = jnp.zeros(shape)
    b = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    if grid.coord_type == "lat-lon":
        latr = np.deg2rad(grid.coords[0])
        cosL = _bcast(np.cos(latr), nd, 0)
        A = b(-R / depth)
        C = b(-R / depth / cosL ** 2)
        E = b(-2.0 * np.asarray(mp["Omega"], np.float64)
              / np.asarray(mp["Rearth"], np.float64))
    else:
        A = b(-R / depth)
        C = b(-R / depth)
        E = b(-np.asarray(mp["beta"], np.float64))
    G = -_fill(curl, cdef) / jnp.asarray(depth * rho0)
    return A, zero, C, zero, E, zero, G


def build_stommel(curl, cdef, grid: Grid, mp):
    """Stommel wind-driven gyre, general 2D (apps.py:1712-1748)."""
    A, B, C, D, E, Fc, G = stommel_coeffs(curl, cdef, grid, mp)
    return stencil.general_2d(A, B, C, D, E, Fc, G, cdef,
                              grid.deltas, grid.bcs)


def stommel_test_e_coeffs(curl, cdef, grid: Grid, mp):
    """Stommel standardised-form +Eψ planes (apps.py:1751-1790); shared
    by the SOR builder and the multigrid entry point."""
    nd, shape = grid.ndim, grid.shape
    R = _bcast(mp["R"], nd, 0)
    depth, rho0 = _bcast(mp["D"], nd, 0), _bcast(mp["rho0"], nd, 0)
    b = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    pr = lambda p: _bcast(p, nd, 0)
    if grid.coord_type == "lat-lon":
        latr = np.deg2rad(grid.coords[0])
        cosG, cosH = pr(np.cos(latr)), pr(np.cos(_half(latr)))
        f = 2.0 * mp["Omega"] * pr(np.sin(latr))
        A = b(-R / depth * cosH)
        B = b(-f)
        C = b(f)
        D = b(-R / depth / cosG)
        E = jnp.zeros(shape)
        Fs = -_fill(curl, cdef) / jnp.asarray(depth * rho0) * b(cosG)
    else:
        y = np.asarray(grid.coords[0], np.float64)
        f = mp["f0"] + mp["beta"] * pr(y)
        A = b(-R / depth)
        B = b(-f)
        C = b(f)
        D = b(-R / depth)
        E = jnp.zeros(shape)
        Fs = -_fill(curl, cdef) / jnp.asarray(depth * rho0)
    return A, B, C, D, E, Fs


def build_stommel_test(curl, cdef, grid: Grid, mp):
    """Stommel in standardised form (apps.py:1751-1790)."""
    A, B, C, D, E, Fs = stommel_test_e_coeffs(curl, cdef, grid, mp)
    return stencil.standard_2d_e(A, B, C, D, E, Fs, cdef, grid.deltas,
                                 grid.bcs)


def stommelmunk_coeffs(curl, cdef, grid: Grid, mp):
    """The Stommel-Munk A..I planes and forcing J (apps.py:1793-1836);
    shared by the SOR builder and the multigrid entry point."""
    nd, shape = grid.ndim, grid.shape
    A4, R = _bcast(mp["A4"], nd, 0), _bcast(mp["R"], nd, 0)
    depth, rho0 = _bcast(mp["D"], nd, 0), _bcast(mp["rho0"], nd, 0)
    zero = jnp.zeros(shape)
    b = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    if grid.coord_type == "lat-lon":
        latr = np.deg2rad(grid.coords[0])
        icos2 = _bcast(1.0 / np.cos(latr) ** 2, nd, 0)
        A = b(A4)
        C = b(A4 * icos2)
        D = b(-R / depth)
        Fc = b(-R / depth * icos2)
        H = b(-2.0 * np.asarray(mp["Omega"], np.float64)
              / np.asarray(mp["Rearth"], np.float64))
    else:
        A = b(A4)
        C = b(A4)
        D = b(-R / depth)
        Fc = b(-R / depth)
        H = b(-np.asarray(mp["beta"], np.float64))
    J = -_fill(curl, cdef) / jnp.asarray(depth * rho0)
    return (A, zero, C, D, zero, Fc, zero, H, zero), J


def build_stommelmunk(curl, cdef, grid: Grid, mp):
    """Stommel-Munk gyre with biharmonic viscosity (apps.py:1793-1836)."""
    coeffs, J = stommelmunk_coeffs(curl, cdef, grid, mp)
    return stencil.general_2d_bih(*coeffs, J, cdef, grid.deltas, grid.bcs)


def stommelarons_coeffs(Q, Qdef, grid: Grid, mp):
    """Stommel-Arons general-2D coefficient planes (apps.py:1839-1886);
    shared by the SOR builder and the multigrid entry point."""
    nd, shape = grid.ndim, grid.shape
    f, c1, c2, dc1, dc2, latr = _gm_c1c2(grid, mp)
    if grid.coord_type == "lat-lon":
        cosL = np.cos(latr)
        A = c1
        C = c1 / cosL ** 2
        D = dc1 + c1 * np.tan(latr) / mp["Rearth"]
        E = -dc2 / cosL
    else:
        A, C, D, E = c1, c1, dc1, -dc2
    b = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    zero = jnp.zeros(shape)
    G = _fill(Q, Qdef)
    return b(A), zero, b(C), b(D), b(E), zero, G


def build_stommelarons(Q, Qdef, grid: Grid, mp):
    """Stommel-Arons abyssal circulation, general 2D (apps.py:1839-1886)."""
    A, B, C, D, E, Fc, G = stommelarons_coeffs(Q, Qdef, grid, mp)
    return stencil.general_2d(A, B, C, D, E, Fc, G, Qdef,
                              grid.deltas, grid.bcs)


def geostrophic_std_coeffs(lapPhi, Fdef, grid: Grid, mp):
    """The geostrophic A/C planes and scaled forcing (apps.py:1889-1931),
    with the near-equator f regularisation; shared by the SOR builder and
    the multigrid entry point."""
    nd, shape = grid.ndim, grid.shape
    b = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    pr = lambda p: _bcast(p, nd, 0)
    if grid.coord_type == "lat-lon":
        latr = np.deg2rad(grid.coords[0])
        sinG, sinH = pr(np.sin(latr)), pr(np.sin(_half(latr)))
        cosG, cosH = pr(np.cos(latr)), pr(np.cos(_half(latr)))
        fH = 2.0 * mp["Omega"] * sinH
        fG = 2.0 * mp["Omega"] * sinG
        fH = np.where(np.abs(fH) < 2e-5, fH * 1.5, fH)   # apps.py:1909-1910
        fG = np.where(np.abs(fG) < 2e-5, fG * 1.5, fG)
        A = b(fH * cosH)
        C = b(fG / cosG)
        Fs = _fill(lapPhi, Fdef) * b(cosG)
    else:
        y = np.asarray(grid.coords[0], np.float64)
        fG = mp["f0"] + mp["beta"] * pr(y)
        fH = mp["f0"] + mp["beta"] * pr(_half(y))
        A = b(fH)
        C = b(fG)
        Fs = _fill(lapPhi, Fdef)
    return A, 0.0, C, Fs


def build_geostrophic(lapPhi, Fdef, grid: Grid, mp):
    """Geostrophic streamfunction from Laplacian of geopotential
    (apps.py:1889-1931), with the near-equator f regularisation."""
    A, B, C, Fs = geostrophic_std_coeffs(lapPhi, Fdef, grid, mp)
    return stencil.standard_2d(A, B, C, Fs, Fdef, grid.deltas, grid.bcs,
                               include_cross=False)


def bretherton_e_coeffs(h, hdef, grid: Grid, mp):
    """Bretherton-Haidvogel +Eψ planes (apps.py:1934-1972); shared by the
    SOR builder and the multigrid entry point."""
    nd, shape = grid.ndim, grid.shape
    depth, lamb = _bcast(mp["D"], nd, 0), _bcast(mp["lambda"], nd, 0)
    b = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    pr = lambda p: _bcast(p, nd, 0)
    zero = jnp.zeros(shape)
    if grid.coord_type == "lat-lon":
        latr = np.deg2rad(grid.coords[0])
        cosG, cosH = pr(np.cos(latr)), pr(np.cos(_half(latr)))
        f = 2.0 * mp["Omega"] * pr(np.sin(latr))
        A = b(cosH)
        D = b(1.0 / cosG)
        E = b(-lamb * depth * cosG)
        Fs = -_fill(h, hdef) * jnp.asarray(f / depth * cosG)
    else:
        y = np.asarray(grid.coords[0], np.float64)
        f = mp["f0"] + mp["beta"] * pr(y)
        A = jnp.ones(shape)
        D = jnp.ones(shape)
        E = b(-lamb * depth)
        Fs = -_fill(h, hdef) * jnp.asarray(f / depth)
    return A, zero, zero, D, E, Fs


def build_bretherton(h, hdef, grid: Grid, mp):
    """Bretherton-Haidvogel flow over topography (apps.py:1934-1972)."""
    A, B, C, D, E, Fs = bretherton_e_coeffs(h, hdef, grid, mp)
    return stencil.standard_2d_e(A, B, C, D, E, Fs, hdef,
                                 grid.deltas, grid.bcs)


def fofonoff_e_coeffs(F, Fdef, grid: Grid, mp):
    """Fofonoff +Eψ planes (apps.py:1975-2013); forcing synthesised from
    the Coriolis profile, the input F contributes only its mask.  Shared
    by the SOR builder and the multigrid entry point."""
    nd, shape = grid.ndim, grid.shape
    c0, c1 = _bcast(mp["c0"], nd, 0), _bcast(mp["c1"], nd, 0)
    b = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    pr = lambda p: _bcast(p, nd, 0)
    zero = jnp.zeros(shape)
    if grid.coord_type == "lat-lon":
        latr = np.deg2rad(grid.coords[0])
        cosG, cosH = pr(np.cos(latr)), pr(np.cos(_half(latr)))
        f = 2.0 * mp["Omega"] * pr(np.sin(latr))
        A = b(cosH)
        D = b(1.0 / cosG)
        E = b(-c0 * cosG)
        Fs = b((c1 - f) * cosG)
    else:
        y = np.asarray(grid.coords[0], np.float64)
        f = mp["f0"] + mp["beta"] * pr(y)
        A = jnp.ones(shape)
        D = jnp.ones(shape)
        E = b(-c0)
        Fs = b(c1 - f)
    Fs = jnp.broadcast_to(Fs, jnp.shape(F))
    return A, zero, zero, D, E, Fs


def build_fofonoff(F, Fdef, grid: Grid, mp):
    """Fofonoff inviscid free mode (apps.py:1975-2013)."""
    A, B, C, D, E, Fs = fofonoff_e_coeffs(F, Fdef, grid, mp)
    return stencil.standard_2d_e(A, B, C, D, E, Fs, Fdef,
                                 grid.deltas, grid.bcs)


def omega_coeffs(F, Fdef, grid: Grid, mp):
    """The omega-equation A/B/C planes and scaled forcing (apps.py:
    2016-2052); shared by the SOR builder and the multigrid entry point."""
    nd, shape = grid.ndim, grid.shape
    N2 = np.asarray(mp["N2"], np.float64)
    if grid.coord_type == "lat-lon":
        latr = np.deg2rad(grid.coords[1])
        cosG = _bcast(np.cos(latr), nd, 1)
        cosH = _bcast(np.cos(_half(latr)), nd, 1)
        f = 2.0 * mp["Omega"] * _bcast(np.sin(latr), nd, 1)
        A = np.broadcast_to(f ** 2 * cosG, shape)
        B = np.broadcast_to(N2 * cosH, shape)
        C = np.broadcast_to(N2 / cosG, shape)
        Fs = _fill(F, Fdef) * jnp.asarray(cosG)
    else:
        y = grid.coords[1]
        f = mp["f0"] + mp["beta"] * _bcast(y, nd, 1)
        A = np.broadcast_to(f ** 2, shape)
        B = np.broadcast_to(N2 * np.ones(shape), shape)
        C = np.broadcast_to(N2 * np.ones(shape), shape)
        Fs = _fill(F, Fdef)
    return A, B, C, Fs


def build_omega(F, Fdef, grid: Grid, mp):
    """QG omega equation, standard 3D (apps.py:2016-2052)."""
    A, B, C, Fs = omega_coeffs(F, Fdef, grid, mp)
    return stencil.standard_3d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               Fs, Fdef, grid.deltas, grid.bcs)


def ocean3d_coeffs(F, Fdef, grid: Grid, mp):
    """3-D damped ocean flow general-3D coefficient planes
    (apps.py:2055-2109); shared by the SOR builder and the multigrid
    entry point."""
    nd, shape = grid.ndim, grid.shape
    eps, k, N2 = mp["epsilon"], mp["k"], np.asarray(mp["N2"], np.float64)
    lev = grid.coords[0]
    # N2 may be a scalar, a 1-D lev profile, or (via _resolve_mp) a
    # Field profile already broadcast to core rank, e.g. (nz, 1, 1)
    c3 = np.asarray(k / N2, np.float64)
    if c3.ndim == 0:
        c3 = np.full(lev.shape, c3)
    if c3.ndim <= 1:
        dc3 = _grad_coord(c3, lev)
    else:
        dc3 = np.gradient(c3, np.asarray(lev, np.float64), axis=0)
    eps = _bcast(eps, nd, 1)
    if grid.coord_type == "lat-lon":
        lat = grid.coords[1]
        latr = _bcast(np.deg2rad(lat), nd, 1)
        cosL = np.cos(latr)
        f = 2.0 * mp["Omega"] * np.sin(latr)
        c1 = eps / (eps ** 2 + f ** 2)
        c2 = f / (eps ** 2 + f ** 2)
        deg2m = _deg2m(mp["Rearth"])
        dc1 = _grad_coord(c1, lat, axis=1) / deg2m
        dc2 = _grad_coord(c2, lat, axis=1) / deg2m
        E = dc1 - c1 * np.tan(latr) / mp["Rearth"]
        Fc = -dc2 / cosL
        C = c1 / cosL ** 2
    else:
        y = grid.coords[1]
        f = mp["f0"] + mp["beta"] * _bcast(np.asarray(y, np.float64), nd, 1)
        c1 = eps / (eps ** 2 + f ** 2)
        c2 = f / (eps ** 2 + f ** 2)
        dc1 = _grad_coord(c1, y, axis=1)
        dc2 = _grad_coord(c2, y, axis=1)
        E = dc1
        Fc = -dc2
        C = c1
    bz = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 0), shape))
    by = lambda p: jnp.asarray(np.broadcast_to(_bcast(p, nd, 1), shape))
    zero = jnp.zeros(shape)
    H = _fill(F, Fdef)
    return bz(c3), by(c1), by(C), bz(dc3), by(E), by(Fc), zero, H


def build_ocean3d(F, Fdef, grid: Grid, mp):
    """3-D damped ocean flow, general 3D (apps.py:2055-2109)."""
    A, B, C, D, E, Fc, G, H = ocean3d_coeffs(F, Fdef, grid, mp)
    return stencil.general_3d(A, B, C, D, E, Fc, G, H, Fdef,
                              grid.deltas, grid.bcs)


BUILDERS = {
    "poisson": build_poisson,
    "refstate": build_refstate,
    "geoadjustment": build_geoadjustment,
    "refstateswm": build_refstate_swm,
    "pv2d": build_pv2d,
    "eliassen": build_eliassen,
    "gillmatsuno": build_gillmatsuno,
    "gillmatsuno_test": build_gillmatsuno_test,
    "stommel": build_stommel,
    "stommel_test": build_stommel_test,
    "stommelmunk": build_stommelmunk,
    "stommelarons": build_stommelarons,
    "geostrophic": build_geostrophic,
    "brethertonhaidvogel": build_bretherton,
    "fofonoff": build_fofonoff,
    "omega": build_omega,
    "3docean": build_ocean3d,
}
