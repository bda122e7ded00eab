# -*- coding: utf-8 -*-
"""cal_flow branches: z-lat / z-lon / cartesian vtypes and the Gill-Matsuno
wind algebra (apps.py:1181-1317)."""
import numpy as np
import pytest

from xinvert_tpu import Field, cal_flow


def _vertical(dims, coords2):
    z = np.linspace(100000, 10000, 19)
    y = coords2
    Z, Y = np.meshgrid(z, y, indexing="ij")
    vals = np.sin(Z / 2e4) * np.cos(np.deg2rad(Y))
    name2 = "lat" if abs(coords2).max() <= 90 else "lon"
    return Field(vals, dims, {dims[0]: z, dims[1]: coords2})


def test_cal_flow_zlat():
    S = _vertical(("lev", "lat"), np.linspace(-80, 80, 33))
    u, v = cal_flow(S, dims=["lev", "lat"], coords="z-lat",
                    vtype="streamfunction")
    assert u.shape == S.shape and v.shape == S.shape
    assert np.isfinite(u.values).all()
    # poles handling: grdy zeroed where |lat| == 90 (none here)
    u2, v2 = cal_flow(S, dims=["lev", "lat"], coords="z-lat",
                      vtype="velocitypotential")
    assert np.isfinite(v2.values).all()


def test_cal_flow_zlon():
    S = _vertical(("lev", "lon"), np.linspace(0, 350, 36))
    u, v = cal_flow(S, dims=["lev", "lon"], coords="z-lon",
                    BCs=("fixed", "periodic"), vtype="streamfunction")
    assert u.shape == S.shape and np.isfinite(u.values).all()


def test_cal_flow_cartesian_identities():
    y = np.linspace(0, 1e6, 41)
    x = np.linspace(0, 1e6, 51)
    Y, X = np.meshgrid(y, x, indexing="ij")
    psi = Field(np.sin(2 * np.pi * X / 1e6) * np.sin(2 * np.pi * Y / 1e6),
                ("y", "x"), {"y": y, "x": x})
    u, v = cal_flow(psi, dims=["y", "x"], coords="cartesian",
                    vtype="streamfunction")
    # u = -dpsi/dy, v = +dpsi/dx
    assert np.allclose(u.values[1:-1, 1:-1],
                       -np.gradient(psi.values, y, axis=0)[1:-1, 1:-1],
                       rtol=1e-6)
    assert np.allclose(v.values[1:-1, 1:-1],
                       np.gradient(psi.values, x, axis=1)[1:-1, 1:-1],
                       rtol=1e-6)


def test_cal_flow_gillmatsuno_cartesian():
    y = np.linspace(-2e6, 2e6, 41)
    x = np.linspace(0, 4e6, 51)
    Y, X = np.meshgrid(y, x, indexing="ij")
    phi = Field(-300 * np.exp(-((X - 2e6) ** 2 + Y ** 2) / 1e12),
                ("y", "x"), {"y": y, "x": x})
    u, v = cal_flow(phi, dims=["y", "x"], coords="cartesian",
                    vtype="GillMatsuno",
                    mParams={"f0": 0.0, "beta": 2e-11, "epsilon": 1e-5})
    assert np.isfinite(u.values).all() and np.isfinite(v.values).all()
    # at the equator (f=0): u = -c1 dphi/dx, toward the low from both sides
    jeq = np.argmin(np.abs(y))
    assert u.values[jeq, 10] * u.values[jeq, -10] <= 0


def test_cal_flow_bad_vtype():
    S = _vertical(("lev", "lat"), np.linspace(-80, 80, 33))
    with pytest.raises(ValueError):
        cal_flow(S, dims=["lev", "lat"], coords="z-lat", vtype="nope")
