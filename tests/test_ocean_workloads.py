# -*- coding: utf-8 -*-
"""Global masked-ocean workloads at the reference's SODA shapes (0.5 deg,
330x720, continent land masks).

The reference runs these on its stripped SODA_curl.nc / Helmholtz_ocean.nc
fixtures (tests/test_StommelArons.py:14-58, test_StommelWBC.py:82-121,
test_MunkWBC.py:66-84, test_Poisson.py:44-65); the synthesized equivalents
(tools/make_fixtures.py) reproduce the same grid class, masking conventions
(NaN land / exact-zero land) and workload parameters.  Golden extrema are
frozen from the f64 CPU runs (round 2) — the same regression-oracle role the
reference's hard-coded numbers play."""
import os
import subprocess
import sys

import numpy as np
import pytest

from xinvert_tpu import (open_dataset, invert_Stommel, invert_StommelMunk,
                         invert_Poisson, cal_flow, Field, FiniteDiff)
from xinvert_tpu.models import api


@pytest.fixture(scope="module")
def soda(tmp_path_factory):
    if not os.path.exists("Data/soda_curl_like.nc"):
        subprocess.run([sys.executable, "tools/make_fixtures.py"], check=True)
    return open_dataset("Data/soda_curl_like.nc")


@pytest.fixture(scope="module")
def helm_ocean():
    if not os.path.exists("Data/helmholtz_ocean_like.nc"):
        subprocess.run([sys.executable, "tools/make_fixtures.py"], check=True)
    return open_dataset("Data/helmholtz_ocean_like.nc")


def test_stommel_arons_global(soda):
    """Abyssal circulation driven by high-latitude mass sources and a
    uniform upwelling sink over the global masked ocean (reference
    tests/test_StommelArons.py:14-58 scenario)."""
    lat = soda.curl.coords["lat"]
    lon = soda.curl.coords["lon"]
    msrc = np.where(np.isfinite(soda.curl.values[0]), 0.0, np.nan)

    def add_source(m, olon, olat, amp, rad):
        m += amp * np.exp(-((lat[:, None] - olat) ** 2 / rad
                            + (lon[None, :] - olon) ** 2 / rad / 4))

    add_source(msrc, 330, 63, -1e-3, 30)    # North Atlantic
    add_source(msrc, 350, 67, -1e-3, 30)    # North Atlantic
    add_source(msrc, 189, -70, -1e-3, 30)   # Ross Sea

    # uniform upwelling closes the mass budget
    cosw = np.cos(np.deg2rad(lat))[:, None]
    tot = np.nansum(msrc * cosw)
    area = np.nansum(np.where(np.isfinite(msrc), cosw, 0.0))
    msrc = msrc - tot / area
    assert abs(np.nansum(msrc * cosw)) < 1e-12

    msrcF = Field(msrc, ("lat", "lon"), {"lat": lat, "lon": lon})
    iP = {"BCs": ["extend", "periodic"], "mxLoop": 5000, "optArg": 1.8,
          "tolerance": 1e-12, "undef": np.nan, "printInfo": False}

    h1 = invert_Stommel(msrcF, dims=["lat", "lon"], iParams=iP,
                        mParams={"R": 1e-1, "D": 500})
    r1 = api.LAST_SOLVE
    # like the reference workload, the strongly damped Stommel solve is
    # capped at mxLoop; the extrema are the oracle
    assert int(r1.iters) == 5000 and not bool(np.any(np.asarray(r1.overflow)))
    assert np.isclose(np.nanmin(h1.values), -7.664446e5, rtol=1e-4)
    assert np.isclose(np.nanmax(h1.values), 1.143308e6, rtol=1e-4)

    h2 = invert_StommelMunk(msrcF, dims=["lat", "lon"], iParams=iP,
                            mParams={"R": 1e-2, "D": 500, "A4": 5e3})
    r2 = api.LAST_SOLVE
    assert int(r2.iters) < 5000      # biharmonic version converges to 1e-12
    assert float(r2.rel_change) < 1e-12
    assert np.isclose(np.nanmin(h2.values), -4.915904e6, rtol=1e-4)
    assert np.isclose(np.nanmax(h2.values), 1.122539e7, rtol=1e-4)

    # flows recoverable on the masked domain
    u1, v1 = cal_flow(h1, dims=["lat", "lon"], BCs=["extend", "periodic"])
    ocean = np.isfinite(h1.values)
    assert np.isfinite(u1.values[ocean]).mean() > 0.95


def test_stommel_munk_real_curl(soda):
    """Wind-driven gyres from the monthly curl climatology (reference
    tests/test_StommelWBC.py:82-121 and test_MunkWBC.py:66-84 scenarios:
    January Stommel, July Stommel-Munk)."""
    iP = {"BCs": ["extend", "periodic"], "mxLoop": 5000, "optArg": 1,
          "tolerance": 1e-12, "undef": np.nan, "printInfo": False}

    h1 = invert_Stommel(soda.curl.isel(time=0), dims=["lat", "lon"],
                        iParams=iP, mParams={"R": 2e-4, "D": 100})
    assert h1.shape == soda.curl.shape[1:]
    assert np.isclose(np.nanmin(h1.values), -7.366537e5, rtol=1e-4)
    assert np.isclose(np.nanmax(h1.values), 5.603654e5, rtol=1e-4)

    h2 = invert_StommelMunk(soda.curl.isel(time=6), dims=["lat", "lon"],
                            iParams=iP,
                            mParams={"R": 2e-4, "D": 100, "A4": 5e3})
    assert np.isclose(np.nanmin(h2.values), -4.093541e5, rtol=1e-4)
    assert np.isclose(np.nanmax(h2.values), 2.860538e5, rtol=1e-4)


def test_poisson_ocean_roundtrip(helm_ocean):
    """Masked Helmholtz decomposition with ocean-model conventions
    (undef=0 land, reference tests/test_Poisson.py:44-65): invert, recover
    the flow, and verify the rotational flow is divergence-free."""
    vor = helm_ocean.vor.isel(time=0)
    iP = {"BCs": ["extend", "periodic"], "undef": 0, "tolerance": 1e-9,
          "printInfo": False}

    sf = invert_Poisson(vor, dims=["YG", "XG"], iParams=iP)
    r = api.LAST_SOLVE
    assert int(r.iters) < 2000 and float(r.rel_change) < 1e-9
    assert np.isclose(np.nanmin(sf.values), -1.717813e7, rtol=1e-4)
    assert np.isclose(np.nanmax(sf.values), 2.094518e7, rtol=1e-4)

    us, vs = cal_flow(sf, dims=["YG", "XG"], BCs=iP["BCs"],
                      vtype="streamfunction")
    fd = FiniteDiff({"X": "XG", "Y": "YG", "T": "time"},
                    BCs={"X": "periodic", "Y": "extend"}, fill=0,
                    coords="lat-lon")
    div0 = fd.divg((us, vs), ["X", "Y"])
    scale = np.nanmax(np.abs(vor.values))
    assert np.nanmax(np.abs(div0.values[1:-1])) < 1e-10 * scale


def test_3docean_field_n2_profile():
    """`invert_3DOcean` with N2 as a Field lev-profile (the reference's
    N2-DataArray convention, apps.py:830-888): _resolve_mp aligns it to
    core rank (nz,1,1), which build_ocean3d must accept — regression for
    the np.gradient rank bug — and the result must be identical to
    passing the same profile as a raw 1-D array."""
    from xinvert_tpu import invert_3DOcean

    rng = np.random.default_rng(3)
    nz, ny, nx = 8, 20, 30
    lev = np.linspace(0.0, 2100.0, nz)
    lat = np.linspace(-60.0, 60.0, ny)
    lon = np.linspace(0.0, 360.0 - 360.0 / nx, nx)
    F = rng.normal(0.0, 1e-11, (nz, ny, nx))
    mask = np.ones((nz, ny, nx), bool)
    mask[:, 8:12, 10:16] = False
    Ff = Field(np.where(mask, F, np.nan), ("LEV", "lat", "lon"),
               {"LEV": lev, "lat": lat, "lon": lon})
    N2 = 1e-5 * np.exp(-lev / 800.0) + 1e-7
    iP = {"BCs": ["fixed", "extend", "periodic"], "undef": np.nan,
          "tolerance": 1e-8, "mxLoop": 300, "printInfo": False}

    Wf = invert_3DOcean(Ff, dims=["LEV", "lat", "lon"], iParams=iP,
                        mParams={"epsilon": 7e-6, "k": 1e-5,
                                 "N2": Field(N2, ("LEV",), {"LEV": lev})})
    Wa = invert_3DOcean(Ff, dims=["LEV", "lat", "lon"], iParams=iP,
                        mParams={"epsilon": 7e-6, "k": 1e-5, "N2": N2})
    vf, va = np.asarray(Wf.values), np.asarray(Wa.values)
    assert np.isfinite(vf[mask]).all() and np.isnan(vf[~mask]).all()
    np.testing.assert_array_equal(vf, va)
