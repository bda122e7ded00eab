# -*- coding: utf-8 -*-
"""Field-valued model parameters through every public inverter.

The reference accepts xarray.DataArray values for any numeric mParam and
broadcasts them by named dim (apps.py coefficient builders operate on
xarray objects throughout).  Here `_resolve_mp` aligns Field params to
core rank; the builders must combine them correctly with 1-D coordinate
profiles.  Oracle: a CONSTANT-valued Field (profile over the first core
dim, and full-field) must give bitwise the same answer as the scalar.
Regression for the rank-broadcasting bug class found via invert_3DOcean.
"""
import numpy as np
import pytest

import xinvert_tpu as xv
from xinvert_tpu import Field


NY, NX = 20, 30
LAT = np.linspace(-60.0, 60.0, NY)
LON = np.linspace(0.0, 360.0 - 360.0 / NX, NX)
RNG = np.random.default_rng(11)
FORC = RNG.normal(0.0, 1e-6, (NY, NX))

IP = {"BCs": ["fixed", "periodic"], "undef": np.nan, "mxLoop": 60,
      "tolerance": 1e-12, "printInfo": False}


def _field2d(v):
    return Field(np.full((NY, NX), float(v)), ("lat", "lon"),
                 {"lat": LAT, "lon": LON})


def _profile(v, dim="lat"):
    n = NY if dim == "lat" else NX
    co = LAT if dim == "lat" else LON
    return Field(np.full(n, float(v)), (dim,), {dim: co})


# (api function, scalar mParams, which keys to vary as Fields, extra iP)
CASES = {
    "gillmatsuno": (xv.invert_GillMatsuno,
                    {"epsilon": 1e-5, "Phi": 5000.0},
                    ["Phi", "epsilon"], {"optArg": 1.4}),
    "gillmatsuno_test": (xv.invert_GillMatsuno_test,
                         {"epsilon": 1e-5, "Phi": 5000.0},
                         ["Phi", "epsilon"], {"optArg": 1.4}),
    "stommel": (xv.invert_Stommel,
                {"R": 8e-4, "D": 200.0, "rho0": 1027.0},
                ["R", "D", "rho0"], {}),
    "stommel_test": (xv.invert_Stommel_test,
                     {"f0": 1e-4, "R": 8e-4, "D": 200.0, "rho0": 1027.0},
                     ["R", "D"], {}),
    "stommelmunk": (xv.invert_StommelMunk,
                    {"A4": 5e3, "R": 1e-4, "D": 200.0, "rho0": 1027.0},
                    ["A4", "R", "D"], {"optArg": 1.0}),
    "brethertonhaidvogel": (xv.invert_BrethertonHaidvogel,
                            {"f0": 1e-4, "D": 1000.0, "lambda": 1e-15},
                            ["D", "lambda"], {}),
    "fofonoff": (xv.invert_Fofonoff,
                 {"f0": 1e-4, "beta": 2e-11, "c0": 8e-9, "c1": 1e-4},
                 ["c0", "c1"], {}),
    "pv2d": (xv.invert_PV2D, {"f0": 1e-4, "N2": 2e-4}, ["N2"], {}),
}


@pytest.mark.parametrize("key", sorted(CASES))
@pytest.mark.parametrize("kind", ["profile", "full"])
def test_constant_field_mparam_matches_scalar(key, kind):
    fn, mp, vary, extra = CASES[key]
    iP = dict(IP, **extra)
    dims = ["lat", "lon"]
    Ff = Field(FORC, ("lat", "lon"), {"lat": LAT, "lon": LON})
    ref = fn(Ff, dims=dims, iParams=iP, mParams=dict(mp))
    refv = np.asarray(ref.values)
    assert np.isfinite(refv).all()

    mk = _profile if kind == "profile" else _field2d
    for k in vary:
        mpk = dict(mp)
        mpk[k] = mk(mp[k])
        out = fn(Ff, dims=dims, iParams=iP, mParams=mpk)
        np.testing.assert_array_equal(
            np.asarray(out.values), refv,
            err_msg=f"{key}: Field-valued {k} ({kind}) != scalar")


NYC, NXC = 18, 26
YC = np.linspace(-2e6, 2e6, NYC)
XC = np.linspace(0.0, 4e6, NXC)
FORC_C = RNG.normal(0.0, 1e-6, (NYC, NXC))
IPC = {"BCs": ["fixed", "fixed"], "undef": np.nan, "mxLoop": 60,
       "tolerance": 1e-12, "printInfo": False}

# cartesian-branch cases: f0/beta multiply the raw y coordinate there, the
# exact pattern the first Field-mParams pass missed (rectangular grid so a
# trailing-dim mis-broadcast CRASHES rather than silently transposing)
CART_CASES = {
    "gillmatsuno": (xv.invert_GillMatsuno,
                    {"f0": 1e-5, "beta": 2e-11, "epsilon": 1e-5,
                     "Phi": 5000.0}, ["f0", "beta"], {"optArg": 1.4}),
    "gillmatsuno_test": (xv.invert_GillMatsuno_test,
                         {"f0": 1e-5, "beta": 2e-11, "epsilon": 1e-5,
                          "Phi": 5000.0}, ["f0", "beta"], {"optArg": 1.4}),
    "stommel_test": (xv.invert_Stommel_test,
                     {"f0": 1e-4, "beta": 1.8e-11, "R": 8e-4, "D": 200.0},
                     ["f0", "beta"], {}),
    "geostrophic": (xv.invert_geostrophic,
                    {"f0": 1e-4, "beta": 1e-11}, ["f0", "beta"], {}),
    "brethertonhaidvogel": (xv.invert_BrethertonHaidvogel,
                            {"f0": 1e-4, "beta": 2e-11, "D": 1000.0,
                             "lambda": 1e-15}, ["f0", "beta"], {}),
    "fofonoff": (xv.invert_Fofonoff,
                 {"f0": 1e-4, "beta": 2e-11, "c0": 8e-9, "c1": 1e-4},
                 ["f0", "beta"], {}),
}


@pytest.mark.parametrize("key", sorted(CART_CASES))
@pytest.mark.parametrize("kind", ["profile", "full"])
def test_cartesian_field_f0_beta_matches_scalar(key, kind):
    fn, mp, vary, extra = CART_CASES[key]
    iP = dict(IPC, **extra)
    Ff = Field(FORC_C, ("y", "x"), {"y": YC, "x": XC})
    ref = fn(Ff, dims=["y", "x"], coords="cartesian", iParams=iP,
             mParams=dict(mp))
    refv = np.asarray(ref.values)
    assert np.isfinite(refv).all()
    for k in vary:
        mpk = dict(mp)
        if kind == "profile":
            mpk[k] = Field(np.full(NYC, mp[k]), ("y",), {"y": YC})
        else:
            mpk[k] = Field(np.full((NYC, NXC), mp[k]), ("y", "x"),
                           {"y": YC, "x": XC})
        out = fn(Ff, dims=["y", "x"], coords="cartesian", iParams=iP,
                 mParams=mpk)
        np.testing.assert_array_equal(
            np.asarray(out.values), refv,
            err_msg=f"{key}: Field-valued {k} ({kind}) != scalar")


def test_latlon_field_omega_matches_scalar():
    """Field-valued Omega through the lat-lon Coriolis products (the
    sin-profile lift must happen before the Omega multiply)."""
    fn, mp, _, extra = CASES["gillmatsuno_test"]
    iP = dict(IP, **extra)
    Ff = Field(FORC, ("lat", "lon"), {"lat": LAT, "lon": LON})
    om_val = 7.292e-5
    ref = fn(Ff, dims=["lat", "lon"], iParams=iP,
             mParams=dict(mp, Omega=om_val))
    for om in (Field(np.full(NY, om_val), ("lat",), {"lat": LAT}),
               Field(np.full((NY, NX), om_val), ("lat", "lon"),
                     {"lat": LAT, "lon": LON})):
        out = fn(Ff, dims=["lat", "lon"], iParams=iP,
                 mParams=dict(mp, Omega=om))
        np.testing.assert_array_equal(np.asarray(out.values),
                                      np.asarray(ref.values))


def test_varying_field_phi_changes_solution():
    """A genuinely varying Field parameter must flow into the stencil,
    not be silently collapsed."""
    fn, mp, _, extra = CASES["gillmatsuno"]
    iP = dict(IP, **extra)
    Ff = Field(FORC, ("lat", "lon"), {"lat": LAT, "lon": LON})
    ref = fn(Ff, dims=["lat", "lon"], iParams=iP, mParams=dict(mp))
    phi = Field(5000.0 * (1.0 + 0.3 * np.cos(np.deg2rad(LAT))), ("lat",),
                {"lat": LAT})
    out = fn(Ff, dims=["lat", "lon"], iParams=iP,
             mParams=dict(mp, Phi=phi))
    assert not np.allclose(np.asarray(out.values), np.asarray(ref.values))
    assert np.isfinite(np.asarray(out.values)).all()


def test_field_n2_omega_profile():
    """3-D: invert_omega with N2 as a Field lev-profile equals the raw
    1-D-array N2 (both routes reach omega_coeffs broadcast-aligned)."""
    nz = 6
    lev = np.linspace(1000e2, 200e2, nz)
    F3 = RNG.normal(0.0, 1e-12, (nz, NY, NX))
    Ff = Field(F3, ("lev", "lat", "lon"),
               {"lev": lev, "lat": LAT, "lon": LON})
    N2 = 1e-4 * np.exp(lev / lev[0])
    iP = {"BCs": ["fixed", "fixed", "periodic"], "undef": np.nan,
          "mxLoop": 40, "tolerance": 1e-12, "printInfo": False}
    Wf = xv.invert_omega(Ff, dims=["lev", "lat", "lon"], iParams=iP,
                         mParams={"N2": Field(N2, ("lev",), {"lev": lev})})
    Wa = xv.invert_omega(Ff, dims=["lev", "lat", "lon"], iParams=iP,
                         mParams={"N2": N2[:, None, None]})
    np.testing.assert_array_equal(np.asarray(Wf.values),
                                  np.asarray(Wa.values))
