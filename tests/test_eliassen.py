# -*- coding: utf-8 -*-
"""Sawyer-Eliassen inversion on the TC2D typhoon fixture — exercises the full
cross-derivative (B) stencil (reference tests/test_Eliassen.py:203-232)."""
import numpy as np
import pytest

from xinvert_tpu import open_dataset, invert_Eliassen, Field


@pytest.fixture(scope="module")
def tc(data_dir):
    return open_dataset(f"{data_dir}/TC2D.nc")


UNDEF = 9.99e20


def _masked(f):
    return f.where(abs(f) < UNDEF * 0.99)


def test_real_TC(tc):
    A = _masked(tc.Aa)
    B = _masked(tc.Bb)
    C = _masked(tc.Cc)
    F = _masked(tc.faf)

    assert F.dims == ("lev", "lat")
    assert F.shape == (37, 50)

    iParams = {
        "BCs": ["fixed", "fixed"],
        "mxLoop": 600,
        "tolerance": 1e-12,
        "optArg": 1.4,
        "undef": np.nan,
        "printInfo": False,
    }
    mParams = {"A": A, "B": B, "C": C}

    sf = invert_Eliassen(F, dims=["lev", "lat"], coords="z-lat",
                         iParams=iParams, mParams=mParams)

    assert sf.dims == F.dims
    assert sf.shape == F.shape
    # defined interior away from the NaN coefficient halo stays finite
    good = np.isfinite(F.values) & np.isfinite(A.values) & \
        np.isfinite(B.values) & np.isfinite(C.values)
    assert np.isfinite(sf.values[good]).any()


def test_hadley_zonalmean(data_dir):
    """Hadley-cell Eliassen inversion from the precomputed zonal-mean
    coefficients (reference tests/test_Eliassen.py:135-148; the fixture is
    the dsnew the reference saves at :130)."""
    zm = open_dataset(f"{data_dir}/ZonalMean.nc")
    A, B, C = zm.Acoef, zm.Bcoef, zm.Ccoef
    F = zm.EHF + zm.EAF

    iParams = {"BCs": ["fixed", "fixed"], "mxLoop": 600,
               "tolerance": 1e-10, "printInfo": False}
    sf = invert_Eliassen(F, dims=["LEV", "lat"], coords="z-lat",
                         iParams=iParams, mParams={"A": A, "B": B, "C": C})

    assert sf.dims == zm.um.dims
    assert sf.shape == zm.um.shape


def test_ideal_impulse_TC(tc):
    """Idealized impulse forcing in the TC coefficient field: the response is
    a dipole-like overturning centred on the impulses."""
    A = _masked(tc.Aa).fillna(0.0)
    B = _masked(tc.Bb).fillna(0.0)
    C = _masked(tc.Cc).fillna(0.0)

    Fv = np.zeros((37, 50))
    Fv[27, 22] = 1e-11
    Fv[27, 23] = -1e-11
    Fv[10, 22] = 1e-11
    Fv[10, 23] = -1e-11
    F = Field(Fv, tc.faf.dims, tc.faf.coords)

    iParams = {
        "BCs": ["fixed", "fixed"],
        "mxLoop": 600,
        "tolerance": 1e-12,
        "optArg": 1.14,
        "printInfo": False,
    }
    sf = invert_Eliassen(F, dims=["lev", "lat"], coords="z-lat",
                         iParams=iParams,
                         mParams={"A": A, "B": B, "C": C})
    assert sf.shape == F.shape
    v = sf.values
    assert np.isfinite(v).all()
    # response is strongest near the impulse column
    j = np.unravel_index(np.argmax(np.abs(v)), v.shape)[1]
    assert 15 <= j <= 30
