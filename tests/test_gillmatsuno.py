# -*- coding: utf-8 -*-
"""Gill-Matsuno idealized heating — golden KE regressions
(reference tests/test_GillMatsuno.py:14-58)."""
import numpy as np
import pytest

from xinvert_tpu import Field, invert_GillMatsuno, invert_GillMatsuno_test, cal_flow


def _setup():
    lon = np.linspace(0, 360, 144)
    lat = np.linspace(-90, 90, 73)
    L, Lo = np.meshgrid(lat, lon, indexing="ij")

    def f(vals):
        return Field(vals, ("lat", "lon"), {"lat": lat, "lon": lon})

    Q1 = f(0.05 * np.exp(-((L - 0) ** 2 + (Lo - 120) ** 2) / 100.0))
    Q2 = f(0.05 * np.exp(-((L - 10) ** 2 + (Lo - 120) ** 2) / 100.0)
           - 0.05 * np.exp(-((L + 10) ** 2 + (Lo - 120) ** 2) / 100.0))
    Q3 = f(0.05 * np.exp(-((L - 10) ** 2 + (Lo - 120) ** 2) / 100.0))
    return Q1, Q2, Q3


IPARAMS = {
    "BCs": ["fixed", "periodic"],
    "mxLoop": 2000,
    "tolerance": 1e-8,
    "optArg": 1.4,
    "printInfo": False,
}
MPARAMS = {"epsilon": 1e-5, "Phi": 5000}


def test_gillmatsuno_idealized():
    Q1, Q2, Q3 = _setup()
    hs = [invert_GillMatsuno(Q, dims=["lat", "lon"], iParams=IPARAMS,
                             mParams=MPARAMS) for Q in (Q1, Q2, Q3)]
    h1, h2, h3 = hs
    flows = [cal_flow(h, dims=["lat", "lon"], BCs=["fixed", "periodic"],
                      mParams=MPARAMS, vtype="GillMatsuno") for h in hs]
    (u1, v1), (u2, v2), (u3, v3) = flows

    assert (h1.values <= 0).all()
    assert (np.abs(h2.values) <= 370).all()
    assert (h3.values <= 0).all()
    # golden KE sums from the reference suite; small tolerance widening
    # covers the red-black vs lexicographic iterate difference at tol 1e-8
    assert np.isclose(float(((u1 ** 2 + v1 ** 2) / 2).sum()),
                      4351.62244687, rtol=2e-3)
    assert np.isclose(float(((u2 ** 2 + v2 ** 2) / 2).sum()),
                      5833.33192343, rtol=2e-3)
    assert np.isclose(float(((u3 ** 2 + v3 ** 2) / 2).sum()),
                      5100.85325027, rtol=2e-3)


def test_gillmatsuno_real_mjo(data_dir):
    """MJO OLR forcing — golden KE sums (tests/test_GillMatsuno.py:60-94)."""
    from xinvert_tpu import open_dataset, Field
    ds = open_dataset(f"{data_dir}/MJO.nc")
    lat = ds.ol.coords["lat"]
    latF = Field(lat, ("lat",), {"lat": lat})
    Q = (ds.ol * -0.0015).where(abs(latF) < 60, other=0)

    iP = {"BCs": ["fixed", "periodic"], "mxLoop": 2000, "tolerance": 1e-12,
          "optArg": 1.4, "printInfo": False}
    cases = [({"epsilon": 1e-5, "Phi": 5000}, 1200, 137039.11),
             ({"epsilon": 7e-6, "Phi": 8000}, 1200, 110614.41),
             ({"epsilon": 7e-6, "Phi": 10000}, 1000, 77191.09)]
    for mP, bound, ke_gold in cases:
        h = invert_GillMatsuno(Q, dims=["lat", "lon"], iParams=iP, mParams=mP)
        u, v = cal_flow(h, dims=["lat", "lon"], BCs=["fixed", "periodic"],
                        mParams=mP, vtype="GillMatsuno")
        assert (np.abs(h.values) <= bound).all()
        ke = float(((u ** 2 + v ** 2) / 2).sum())
        assert np.isclose(ke, ke_gold, rtol=2e-3)


def test_gillmatsuno_test_form_agrees():
    """The general-2D and standardised (flux-form) discretisations solve the
    same PDE; solutions agree away from the poles."""
    Q1, _, _ = _setup()
    hA = invert_GillMatsuno(Q1, dims=["lat", "lon"], iParams=IPARAMS,
                            mParams=MPARAMS)
    hB = invert_GillMatsuno_test(Q1, dims=["lat", "lon"], iParams=IPARAMS,
                                 mParams=MPARAMS)
    a = hA.values[10:-10]
    b = hB.values[10:-10]
    scale = np.abs(a).max()
    assert scale > 0
    # the two discretisations (central-difference general form vs staggered
    # flux form) differ at truncation level on the 2.5-degree grid
    assert np.abs(a - b).max() < 0.10 * scale
    ca = (a - a.mean()).ravel()
    cb = (b - b.mean()).ravel()
    corr = (ca @ cb) / np.sqrt((ca @ ca) * (cb @ cb))
    assert corr > 0.99


def test_gillmatsuno_auto_omega_converges():
    """With optArg=None the grid-optimal Laplacian omega diverges for this
    family; the API substitutes the family default (1.4) so the default
    call converges instead of overflowing."""
    Q1, _, _ = _setup()
    h = invert_GillMatsuno(Q1, dims=["lat", "lon"],
                           iParams={"BCs": ["fixed", "periodic"],
                                    "mxLoop": 2000, "tolerance": 1e-8,
                                    "printInfo": False},
                           mParams=MPARAMS)
    assert np.isfinite(h.values).all()
    assert (h.values <= 0).all()
