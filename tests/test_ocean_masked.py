# -*- coding: utf-8 -*-
"""Masked-ocean inversions on the synthesized global ocean fixture — the
BASELINE "ocean Poisson with irregular land/sea mask" and "SODA curl"
configurations (original SODA/Helmholtz_ocean fixtures are stripped from the
reference mount; Data/ocean_masked.nc regenerates the structure via
tools/make_fixtures.py)."""
import numpy as np
import pytest

from xinvert_tpu import open_dataset, invert_Poisson, invert_Stommel, \
    invert_StommelMunk, cal_flow

DATA = "Data/ocean_masked.nc"


@pytest.fixture(scope="module")
def ocean():
    import os
    if not os.path.exists(DATA):
        import subprocess, sys
        subprocess.run([sys.executable, "tools/make_fixtures.py"], check=True)
    return open_dataset(DATA)


def test_masked_ocean_poisson(ocean):
    vor = ocean.vor
    iP = {"BCs": ["extend", "periodic"], "undef": np.nan,
          "mxLoop": 5000, "tolerance": 1e-11, "printInfo": False}
    sf = invert_Poisson(vor, dims=["lat", "lon"], iParams=iP)

    land = np.isnan(vor.values)
    # land stays undef; ocean is finite
    assert np.isnan(sf.values[land]).all()
    assert np.isfinite(sf.values[~land]).all()

    # round-trip: Laplacian of psi returns the vorticity over the open ocean
    # away from coasts (where the masked stencil differs from the plain FD)
    from xinvert_tpu import FiniteDiff
    from scipy import ndimage
    fd = FiniteDiff({"X": "lon", "Y": "lat"},
                    BCs={"X": "periodic", "Y": "extend"}, coords="lat-lon")
    lap = fd.Laplacian(sf.fillna(0.0), ["X", "Y"])
    interior = ~ndimage.binary_dilation(land, iterations=3)
    interior[:10] = interior[-10:] = False     # polar metric degeneracy
    err = np.abs(lap.values - vor.values)[interior]
    scale = np.abs(vor.values[interior]).max()
    assert err.max() < 5e-2 * scale


def test_masked_ocean_stommel(ocean):
    curl = ocean.curl
    iP = {"BCs": ["extend", "periodic"], "mxLoop": 5000, "optArg": 1.0,
          "tolerance": 1e-12, "undef": np.nan, "printInfo": False}
    h1 = invert_Stommel(curl, dims=["lat", "lon"], iParams=iP,
                        mParams={"R": 2e-4, "D": 100})
    h2 = invert_StommelMunk(curl, dims=["lat", "lon"], iParams=iP,
                            mParams={"R": 2e-4, "D": 100, "A4": 5e3})
    land = np.isnan(curl.values)
    for h in (h1, h2):
        assert np.isnan(h.values[land]).all()
        assert np.isfinite(h.values[~land]).all()
    u, v = cal_flow(h1.fillna(0.0), dims=["lat", "lon"],
                    BCs=["extend", "periodic"])
    assert np.isfinite(u.values[1:-1]).all()
