# -*- coding: utf-8 -*-
"""Poisson inversion on the global atmosphere fixture — the reference's
canonical end-to-end case (tests/test_Poisson.py:14-41), plus stronger
oracles: Laplacian round-trip and agreement with the stored solutions."""
import numpy as np
import pytest

from xinvert_tpu import (open_dataset, invert_Poisson, cal_flow, FiniteDiff)


@pytest.fixture(scope="module")
def atmos(data_dir):
    return open_dataset(f"{data_dir}/Helmholtz_atmos.nc")


def test_poisson_atmos_roundtrip(atmos):
    vor = atmos["vor"]
    div = atmos["div"]

    iParams = {
        "BCs": ["extend", "periodic"],
        "undef": np.nan,
        "mxLoop": 5000,
        "tolerance": 1e-11,
        "printInfo": False,
    }

    vp = invert_Poisson(div, dims=["lat", "lon"], iParams=iParams)
    sf = invert_Poisson(vor, dims=["lat", "lon"], iParams=iParams)

    ux, vx = cal_flow(vp, dims=["lat", "lon"], BCs=iParams["BCs"],
                      vtype="velocitypotential")
    us, vs = cal_flow(sf, dims=["lat", "lon"], BCs=iParams["BCs"],
                      vtype="streamfunction")

    fd = FiniteDiff({"X": "lon", "Y": "lat", "T": "time"},
                    BCs={"X": "periodic", "Y": "extend"}, fill=0,
                    coords="lat-lon")

    div0 = fd.divg((us, vs), ["X", "Y"])
    vor0 = fd.curl(ux, vx)

    # rotational flow is non-divergent; divergent flow is irrotational
    assert np.isclose(div0.values[:, 1:-1], 0).all()
    assert np.isclose(vor0.values[:, 1:-1], 0).all()

    # solver oracle: Laplacian of the inverted streamfunction returns the
    # forcing (away from the poles where the metric degenerates)
    lap = fd.Laplacian(sf, ["X", "Y"])
    j = slice(8, -8)
    err = np.abs(lap.values[:, j] - vor.values[:, j])
    scale = np.abs(vor.values[:, j]).max()
    assert err.max() < 2e-2 * scale


def test_poisson_atmos_vs_stored_solution(atmos):
    """The fixture carries the author-computed sf/vp; agreement modulo the
    arbitrary harmonic constant."""
    vor = atmos["vor"]
    sf_ref = atmos["sf"]

    iParams = {"BCs": ["extend", "periodic"], "undef": np.nan,
               "mxLoop": 5000, "tolerance": 1e-11, "printInfo": False}
    sf = invert_Poisson(vor, dims=["lat", "lon"], iParams=iParams)

    a = sf.values
    b = sf_ref.values
    a = a - a.mean(axis=(-2, -1), keepdims=True)
    b = b - b.mean(axis=(-2, -1), keepdims=True)
    scale = np.abs(b).max()
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.999
    # stored solution differs near the poles (different pole/BC treatment in
    # the data provenance); compare away from them
    assert np.abs(a - b)[:, 8:-8].max() < 0.05 * scale


def test_poisson_masked_ocean_like(atmos):
    """Masked-domain Poisson: land/sea mask with undef=NaN; masked cells must
    return NaN, defined cells must satisfy the equation."""
    vor = atmos["vor"].isel({"time": 0})
    vals = vor.values.copy()
    # carve an idealised continent
    vals[30:50, 40:80] = np.nan
    vor_m = type(vor)(vals, vor.dims, vor.coords)

    iParams = {"BCs": ["extend", "periodic"], "undef": np.nan,
               "mxLoop": 3000, "tolerance": 1e-10, "printInfo": False}
    sf = invert_Poisson(vor_m, dims=["lat", "lon"], iParams=iParams)

    assert np.isnan(sf.values[35, 50])
    assert np.isfinite(sf.values[10, 10])
    # masked cells act as zero-Dirichlet boundaries: solution bounded
    assert np.abs(np.nan_to_num(sf.values)).max() < 1e10


def test_poisson_batched_equals_per_slice(atmos):
    vor = atmos["vor"]
    iParams = {"BCs": ["extend", "periodic"], "undef": np.nan,
               "mxLoop": 800, "tolerance": 1e-11, "printInfo": False}
    sf_all = invert_Poisson(vor, dims=["lat", "lon"], iParams=iParams)
    sf_0 = invert_Poisson(vor.isel({"time": 0}), dims=["lat", "lon"],
                          iParams=iParams)
    assert np.allclose(sf_all.values[0], sf_0.values, equal_nan=True)
