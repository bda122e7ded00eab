# -*- coding: utf-8 -*-
"""Boundary-condition-aware finite-difference operators on Arakawa-A grids.

Functional rebuild of the reference FD layer
(/root/reference/xinvert/finitediffs.py): ``padBCs``/``deriv``/``deriv2`` free
functions and the :class:`FiniteDiff` operator collection (grad, divg, vort,
curl, Laplacian with spherical metric terms, strains, Okubo-Weiss).  Operates
on :class:`~xinvert_tpu.field.Field` (or duck-typed xarray) at the API edge;
all array math is numpy/jnp underneath.

Known reference defects intentionally fixed rather than replicated:
``deformation_rate`` called ``np.hypot`` with one argument
(finitediffs.py:516) and ``shear_strain``/``Okubo_Weiss`` passed invalid
arguments to ``vort`` (finitediffs.py:488, :542); here they compute the
documented quantities.
"""
from __future__ import annotations

import numpy as np

from .field import Field, as_field

__all__ = ["FiniteDiff", "padBCs", "deriv", "deriv2"]

_R_EARTH = 6371200.0


def _norm_bcs(BCs):
    if isinstance(BCs, str):
        return (BCs, BCs)
    return tuple(BCs)


def padBCs(v, dim, BCs, fill=(0, 0)):
    """Pad one ring along `dim` according to per-end BCs
    (finitediffs.py:548-606).  Padded coordinates extrapolate linearly."""
    v = as_field(v)
    BCs = _norm_bcs(BCs)
    if not isinstance(fill, (tuple, list)):
        fill = (fill, fill)
    if "periodic" in BCs:
        if BCs[0] != BCs[1]:
            raise ValueError("'periodic' cannot be mixed with other BCs")
        return v.pad({dim: (1, 1)}, mode="wrap")
    p = v
    for B, shp, f in zip(BCs, [(1, 0), (0, 1)], fill):
        if B == "fixed":
            p = p.pad({dim: shp}, mode="constant", constant_values=f)
        elif B == "extend":
            p = p.pad({dim: shp}, mode="edge")
        elif B == "reflect":
            p = p.pad({dim: shp}, mode="reflect")
        else:
            raise ValueError(f"unsupported BC: {B}")
    return p


def deriv(v, dim, BCs=("extend", "extend"), fill=(0, 0), scale=1, scheme="center"):
    """First derivative along `dim` with BC-aware padding
    (finitediffs.py:609-659)."""
    v = as_field(v)
    if scheme == "center":
        pad = padBCs(v, dim, BCs, fill)
        grd = pad.differentiate(dim).isel({dim: slice(1, -1)})
        # restore exact original coords (padding extrapolated them)
        grd.coords[dim] = v.coords[dim]
    elif scheme == "forward":
        num = v - v.shift({dim: -1})
        den = v[dim] - v[dim].shift({dim: -1})
        grd = num / den
    elif scheme == "backward":
        num = v.shift({dim: 1}) - v
        den = v[dim].shift({dim: 1}) - v[dim]
        grd = num / den
    else:
        raise ValueError(f"unsupported scheme: {scheme}")
    return grd / scale


def deriv2(v, dim, BCs=("extend", "extend"), fill=(0, 0), scale=1):
    """Second derivative along `dim` with BC-aware padding
    (finitediffs.py:662-700); uniform spacing assumed, as enforced by the
    solver layer."""
    v = as_field(v)
    p = padBCs(v, dim, BCs, fill)
    ax = p.dims.index(dim)
    vals = p.values
    sl = [slice(None)] * vals.ndim

    def take(s):
        sl2 = list(sl)
        sl2[ax] = s
        return vals[tuple(sl2)]

    c = p.coords[dim]
    step = np.diff(c).reshape([-1 if i == ax else 1 for i in range(vals.ndim)])
    d2 = (take(slice(2, None)) - 2.0 * take(slice(1, -1)) + take(slice(0, -2)))
    d2 = d2 / (step[tuple(slice(0, 1) if i == ax else slice(None) for i in range(vals.ndim))] ** 2)
    out = Field(d2, v.dims, v.coords, v.name)
    return out / (scale ** 2) if not np.isscalar(scale) or scale != 1 else out


class FiniteDiff:
    """BC-aware differential operators (finitediffs.py:13-545).

    Parameters mirror the reference: `dim_mapping` maps axis roles
    {'T','Z','Y','X'} to actual dim names; `BCs` a str or per-role dict of
    (left, right) BCs; `coords` 'lat-lon' or 'cartesian'.
    """

    def __init__(self, dim_mapping, BCs="extend", coords="lat-lon", fill=0,
                 R=_R_EARTH):
        if coords not in ("lat-lon", "cartesian"):
            raise ValueError(f"unsupported coords: {coords}")
        self.dmap = dict(dim_mapping)
        self.coords = coords
        self.R = R
        if BCs is None:
            BCs = {}
        if isinstance(BCs, str):
            BCs = {d: (BCs, BCs) for d in self.dmap}
        else:
            BCs = {d: _norm_bcs(BCs.get(d, ("extend", "extend"))) for d in self.dmap}
        self.BCs = BCs
        if fill is None:
            fill = 0
        if isinstance(fill, (int, float)):
            fill = {d: (fill, fill) for d in self.dmap}
        else:
            fill = {d: fill.get(d, (0, 0)) for d in self.dmap}
        self.fill = fill

    # ------------------------------------------------------------- internals
    def _bcs(self, BCs):
        if BCs is None:
            return self.BCs
        out = dict(self.BCs)
        if isinstance(BCs, str):
            return {d: (BCs, BCs) for d in out}
        for d, b in BCs.items():
            if d in out:
                out[d] = _norm_bcs(b)
        return out

    def _fills(self, fill):
        if fill is None:
            return self.fill
        out = dict(self.fill)
        if isinstance(fill, (int, float)):
            return {d: (fill, fill) for d in out}
        for d, f in fill.items():
            if d in out:
                out[d] = f
        return out

    def _coslat(self, v):
        yname = self.dmap.get("Y")
        if yname is not None and yname in v.dims:
            return np.cos(np.deg2rad(v.coords[yname])), yname
        return 1.0, yname

    # -------------------------------------------------------------- operators
    def grad(self, v, dims=("X", "Y"), BCs=None, fill=None):
        """Gradient components along the requested axis roles
        (finitediffs.py:151-207)."""
        v = as_field(v)
        BCs = self._bcs(BCs)
        fill = self._fills(fill)
        llc = self.coords == "lat-lon"
        out = []
        for dim in dims:
            name = self.dmap[dim]
            if dim == "Y" and llc:
                scale = np.pi * self.R / 180.0
            elif dim == "X" and llc:
                cos, yname = self._coslat(v)
                if not np.isscalar(cos):
                    cos = Field(cos, (yname,), {yname: v.coords[yname]})
                scale = np.pi * self.R / 180.0 * cos
            else:
                scale = 1
            out.append(deriv(v, name, BCs[dim], fill[dim], scale))
        return out[0] if len(out) == 1 else out

    def divg(self, vector, dims, BCs=None, fill=None):
        """Divergence sum over components (finitediffs.py:209-282)."""
        BCs = self._bcs(BCs)
        fill = self._fills(fill)
        llc = self.coords == "lat-lon"
        if isinstance(dims, str):
            dims = [dims]
        if isinstance(vector, Field) or hasattr(vector, "dims"):
            vector = [vector]
        vector = [as_field(c) for c in vector]
        if len(vector) != len(dims):
            raise ValueError("lengths of vector and dims are not equal")
        total = None
        for comp, dim in zip(vector, dims):
            name = self.dmap[dim]
            if llc and dim in ("Y", "X"):
                cosv, yname = self._coslat(comp)
                cos = (Field(cosv, (yname,), {yname: comp.coords[yname]})
                       if not np.isscalar(cosv) else cosv)
                scale = np.pi * self.R / 180.0 * cos
                tmp = comp * cos if dim == "Y" else comp
            else:
                scale = 1
                tmp = comp
            d = deriv(tmp, name, BCs[dim], fill[dim], scale)
            total = d if total is None else total + d
        return total

    def vort(self, u=None, v=None, w=None, components="k", BCs=None, fill=None):
        """Vorticity components, right-hand rule (finitediffs.py:284-369)."""
        BCs = self._bcs(BCs)
        fill = self._fills(fill)
        llc = self.coords == "lat-lon"
        dims = self.dmap
        if isinstance(components, str):
            components = [components]
        fields = {k: as_field(x) if x is not None else None
                  for k, x in zip("uvw", (u, v, w))}
        ref = next(x for x in fields.values() if x is not None)
        if llc:
            cosv, yname = self._coslat(ref)
            cos = (Field(cosv, (yname,), {yname: ref.coords[yname]})
                   if not np.isscalar(cosv) else cosv)
            scale = np.deg2rad(1.0) * self.R * cos
        else:
            cos, scale = 1.0, 1.0
        out = []
        for comp in components:
            if comp == "i":       # dw/dy - dv/dz
                t = fields["w"] * cos if llc else fields["w"]
                c1 = deriv(t, dims["Y"], BCs["Y"], fill["Y"], scale)
                c2 = deriv(fields["v"], dims["Z"], BCs["Z"], fill["Z"], 1.0)
                out.append(c1 - c2)
            elif comp == "j":     # du/dz - dw/dx
                c1 = deriv(fields["u"], dims["Z"], BCs["Z"], fill["Z"], 1.0)
                c2 = deriv(fields["w"], dims["X"], BCs["X"], fill["X"], scale)
                out.append(c1 - c2)
            elif comp == "k":     # dv/dx - du/dy
                t = fields["u"] * cos if llc else fields["u"]
                c1 = deriv(fields["v"], dims["X"], BCs["X"], fill["X"], scale)
                c2 = deriv(t, dims["Y"], BCs["Y"], fill["Y"], scale)
                out.append(c1 - c2)
            else:
                raise ValueError(f"invalid component {comp}, only [i, j, k]")
        return out[0] if len(out) == 1 else out

    def curl(self, u, v, BCs=None, fill=None):
        """Vertical (k) vorticity (finitediffs.py:371-385)."""
        return self.vort(u=u, v=v, components="k", BCs=BCs, fill=fill)

    def Laplacian(self, v, dims=("X", "Y"), BCs=None, fill=None):
        """Laplacian with the spherical tan(lat) metric term and pole masking
        (finitediffs.py:387-436)."""
        v = as_field(v)
        BCs = self._bcs(BCs)
        fill = self._fills(fill)
        llc = self.coords == "lat-lon"
        dmap = self.dmap
        total = None
        for dim in dims:
            if llc and dim in ("X", "Y"):
                yname = dmap["Y"]
                latr = np.deg2rad(v.coords[yname])
                cosL = Field(np.cos(latr), (yname,), {yname: v.coords[yname]})
                if dim == "Y":
                    scale = np.pi * self.R / 180.0
                    tanL = Field(np.tan(latr), (yname,), {yname: v.coords[yname]})
                    metric = deriv(v, dmap["Y"], BCs["Y"], fill["Y"], scale) \
                        * tanL * (-1.0 / self.R)
                else:
                    scale = np.pi * self.R / 180.0 * cosL
                    metric = 0
            else:
                scale = 1.0
                metric = 0
            term = deriv2(v, dmap[dim], BCs[dim], fill[dim], scale)
            term = term + metric if not np.isscalar(metric) else term
            total = term if total is None else total + term
        if llc and "Y" in dims:
            yname = dmap["Y"]
            lat = Field(v.coords[yname], (yname,), {yname: v.coords[yname]})
            return total.where(abs(lat) != 90, other=0)
        return total

    def tension_strain(self, u, v, dims=("X", "Y"), BCs=None, fill=None):
        """du/dx - dv/dy (finitediffs.py:438-462)."""
        return self.divg((as_field(u), -as_field(v)), list(dims), BCs, fill)

    def shear_strain(self, u, v, dims=("X", "Y"), BCs=None, fill=None):
        """dv/dx + du/dy (finitediffs.py:464-488, with the vort-call defect
        fixed: computed directly)."""
        BCs = self._bcs(BCs)
        fill = self._fills(fill)
        llc = self.coords == "lat-lon"
        u, v = as_field(u), as_field(v)
        if llc:
            cosv, yname = self._coslat(u)
            cos = (Field(cosv, (yname,), {yname: u.coords[yname]})
                   if not np.isscalar(cosv) else cosv)
            scale = np.deg2rad(1.0) * self.R * cos
            t = u * cos
        else:
            scale, t = 1.0, u
        c1 = deriv(v, self.dmap["X"], BCs["X"], fill["X"], scale)
        c2 = deriv(t, self.dmap["Y"], BCs["Y"], fill["Y"], scale)
        return c1 + c2

    def deformation_rate(self, u, v, dims=("X", "Y"), BCs=None, fill=None):
        """sqrt(tension^2 + shear^2) (finitediffs.py:490-516, hypot fixed)."""
        tension = self.tension_strain(u, v, dims, BCs, fill)
        shear = self.shear_strain(u, v, dims, BCs, fill)
        return Field(np.hypot(tension.values, shear.values),
                     tension.dims, tension.coords)

    def Okubo_Weiss(self, u, v, dims=("X", "Y"), BCs=None, fill=None):
        """deformation^2 - vorticity^2 (finitediffs.py:518-544, corrected to
        use the vertical vorticity component)."""
        deform = self.deformation_rate(u, v, dims, BCs, fill)
        curlZ = self.curl(u, v, BCs=BCs, fill=fill)
        return deform ** 2.0 - curlZ ** 2.0
