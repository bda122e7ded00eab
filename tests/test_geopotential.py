# -*- coding: utf-8 -*-
"""Superposition linearity with inhomogeneous Dirichlet boundary (icbc):
sum of per-forcing solutions + boundary part equals solution of the summed
forcing (reference tests/test_Geopotential.py:92-104, adapted to the
Helmholtz fixture since atmos3D.nc is not bundled)."""
import numpy as np
import pytest

from xinvert_tpu import open_dataset, invert_Poisson, Field


def test_superposition_with_icbc(data_dir):
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    vor = ds.vor.isel(time=0)
    hbc = ds.sf.isel(time=0)          # observed field as Dirichlet boundary

    lat = vor.coords["lat"]
    lon = vor.coords["lon"]
    w = 0.5 * (1.0 + np.sin(np.deg2rad(lon)))[None, :] * np.ones((lat.size, 1))

    frc_a = Field(vor.values * w, vor.dims, vor.coords)
    frc_b = Field(vor.values * (1.0 - w), vor.dims, vor.coords)
    zeros = Field(np.zeros_like(vor.values), vor.dims, vor.coords)

    iParams = {"BCs": ["fixed", "fixed"], "mxLoop": 5000,
               "tolerance": 1e-11, "printInfo": False}

    sfa = invert_Poisson(frc_a, dims=["lat", "lon"], iParams=iParams)
    sfb = invert_Poisson(frc_b, dims=["lat", "lon"], iParams=iParams)
    sfc = invert_Poisson(zeros, dims=["lat", "lon"], icbc=hbc, iParams=iParams)
    sf = invert_Poisson(vor, dims=["lat", "lon"], icbc=hbc, iParams=iParams)

    total = sfa.values + sfb.values + sfc.values
    scale = np.abs(sf.values).max()
    assert np.abs(sf.values - total).max() < 5e-5 * scale

    # boundary rows hold the Dirichlet values exactly
    assert np.allclose(sf.values[0], hbc.values[0])
    assert np.allclose(sf.values[-1], hbc.values[-1])
    assert np.allclose(sf.values[:, 0], hbc.values[:, 0])
    assert np.allclose(sf.values[:, -1], hbc.values[:, -1])
