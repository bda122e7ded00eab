# -*- coding: utf-8 -*-
"""One-shot direct spectral inversion (iParams scheme='direct').

For 2-D problems whose coefficients do not vary along a periodic x — the
global streamfunction / velocity-potential Poisson problems, Gill-Matsuno,
geostrophic balance — the folded stencil system block-diagonalises under a
real FFT in x into one complex tridiagonal system in y per zonal
wavenumber.  `scheme='direct'` solves those EXACTLY in a single call
(ops/direct.py): no iteration, machine-precision residual, and the result
certifies itself (`rel_change` reports the true relative discrete
residual).  The reference explored and abandoned FFT solvers in comments
(tests/test_LLC4320Poisson.py:108-217); masked/x-varying problems stay on
the SOR/multigrid paths by design (the solver raises a descriptive error).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import xinvert_tpu as xv

ds = xv.open_dataset("/root/reference/Data/Helmholtz_atmos.nc")
iP = {"BCs": ["extend", "periodic"], "undef": np.nan}

# classic iterative solve (the reference's path: ~236 sweeps to 1e-11)
sf_sor = xv.invert_Poisson(ds.vor, dims=["lat", "lon"],
                           iParams={**iP, "mxLoop": 5000,
                                    "tolerance": 1e-11})

# one-shot direct solve; gauge = zero-mean like the SOR cold start
sf_dir = xv.invert_Poisson(ds.vor, dims=["lat", "lon"],
                           iParams={**iP, "scheme": "direct"})

a, b = np.asarray(sf_sor.values), np.asarray(sf_dir.values)
d = a - b
d -= d.mean(axis=(-2, -1), keepdims=True)       # singular problem: gauge
print("direct vs 236-sweep SOR (gauge-free) max rel:",
      float(np.abs(d).max() / np.abs(a).max()))
print("certified relative residual:",
      float(np.max(np.asarray(xv.models.api.LAST_SOLVE.rel_change))))

# Gill-Matsuno: the general-2D family with advective terms gives complex
# spectral symbols — still one tridiagonal pass per mode
lat = np.linspace(-90, 90, 73)
lon = np.linspace(0, 357.5, 144)
Q = -0.1 * np.exp(-(lat[:, None] ** 2 / 100 + (lon[None, :] - 120) ** 2
                    / 400))
F = xv.Field(Q, ("lat", "lon"), {"lat": lat, "lon": lon})
h = xv.invert_GillMatsuno(
    F, ["lat", "lon"], mParams={"epsilon": 7e-6, "Phi": 5000.0},
    iParams={"BCs": ["fixed", "periodic"], "scheme": "direct"})
print("Gill-Matsuno direct: mass-field extrema",
      float(np.nanmin(h.values)), float(np.nanmax(h.values)))

# non-periodic x (the symmetric eigenbasis branch): the reference
# notebook-02 vertical-plane overturning Poisson, BCs ['fixed','fixed'] —
# 5,000 sweeps in the reference, one exact call here
zm = xv.open_dataset("/root/reference/Data/ZonalMean.nc")
vor2 = xv.deriv(zm.vm, dim="LEV") - xv.deriv(zm.wm, dim="lat")
sf_ov = xv.invert_Poisson(vor2, dims=["LEV", "lat"], coords="z-lat",
                          iParams={"BCs": ["fixed", "fixed"],
                                   "scheme": "direct"})
print("overturning direct: certified residual",
      float(np.max(np.asarray(xv.models.api.LAST_SOLVE.rel_change))),
      "range", float(sf_ov.values.min()), float(sf_ov.values.max()))

# 1-D geostrophic adjustment: pure tridiagonal, any coefficients
yc = 501
alat = np.linspace(-75, -25, yc)
h0v = np.full(yc, 1500.0)
h0v[yc // 2:] = 1520.0
h0 = xv.Field(h0v, ("lat",), {"lat": alat})
hadj = xv.invert_GeoAdjustment(h0, dims=["lat"], coords="lat",
                               iParams={"BCs": ["extend"], "undef": -9999,
                                        "scheme": "direct"})
print("geostrophic adjustment direct: range",
      float(hadj.values.min()), float(hadj.values.max()))
