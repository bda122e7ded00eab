# -*- coding: utf-8 -*-
"""End-to-end parity with the reference's published notebook runs.

Every tutorial notebook (/root/reference/docs/source/notebooks/) prints
per-slice convergence records ``loops N and tolerance is X``.  These tests
reproduce the notebooks' workloads through OUR public API with
``iParams['scheme']='lexico'`` (the reference's exact iterate sequence,
lexico.py) at float64 and assert the records.

Loop-count convention: the reference's counter starts at 0 and increments
AFTER the break test (numbas.py:278-414), so its printed ``loops L`` means
L+1 sweeps executed; our ``iters`` counts sweeps.  We therefore call with
``mxLoop = ref_mxLoop + 1`` and expect ``iters == L + 1``.

Oracle hierarchy (see tools/make_notebook_truth.py):

* PUBLISHED values — asserted where the shipped fixtures still reproduce
  them: the Gill-Matsuno synthetic-heating cases match to ALL printed
  digits; the MJO and Bretherton cases match loop counts (tolerances to
  the f32-coordinate / fixed-point-noise limits documented below).
* DIRECT-DRIVEN values (tests/notebook_truth.json) — the reference
  kernels run on the shipped fixtures at f64, for the notebooks whose
  fixtures have since changed (ZonalMean/TC2D) or whose published run
  was float32 (Helmholtz_atmos).
"""
import json
import os

import numpy as np
import pytest

from xinvert_tpu import (invert_Poisson, invert_Eliassen, invert_Fofonoff,
                         invert_GillMatsuno, invert_BrethertonHaidvogel)
from xinvert_tpu.field import Field
from xinvert_tpu.fd import FiniteDiff
from xinvert_tpu.io import open_dataset
from xinvert_tpu.models import api

TRUTH = os.path.join(os.path.dirname(__file__), "notebook_truth.json")


@pytest.fixture(scope="module")
def truth():
    if not os.path.exists(TRUTH):
        pytest.skip("tests/notebook_truth.json not generated")
    with open(TRUTH) as fh:
        return json.load(fh)


def _last(n=None):
    """(iters, rel_change) per batch slice of the last solve."""
    res = api.LAST_SOLVE
    it = np.atleast_1d(np.asarray(res.iters))
    rel = np.atleast_1d(np.asarray(res.rel_change))
    return it, rel


def _scalar(a):
    return np.asarray(a).reshape(-1)[0]


def _check(truth_rec, it, rel, rtol=0.05):
    assert int(_scalar(it)) == truth_rec["sweeps"]
    assert float(_scalar(rel)) == pytest.approx(truth_rec["tolerance"],
                                                rel=rtol)


def test_nb01_poisson_helmholtz(data_dir, truth):
    """Notebook 01 (Poisson, global atmos).  Published (f32 run):
    1000/5.164704e-09 and 1000/6.395749e-09 — the f32 noise floor; the
    f64 trajectory certified here converges past it."""
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    iP = {"BCs": ["extend", "periodic"], "mxLoop": 1001,
          "tolerance": 1e-12, "scheme": "lexico", "printInfo": False}
    invert_Poisson(ds["vor"], dims=["lat", "lon"], iParams=iP)
    it, rel = _last()
    for t in range(2):
        _check(truth[f"nb01_poisson_t{t}"], it[t], rel[t], rtol=1e-3)
    # both f64 records sit below the published f32 floor
    assert rel[0] < 5.164704e-09 and rel[1] < 6.395749e-09


def test_nb02_vertical_poisson(data_dir, truth):
    """Notebook 02 (z-lat overturning Poisson from vm/wm vorticity).
    Published: 5000/7.339510e-09 (earlier ZonalMean.nc vintage)."""
    zm = open_dataset(f"{data_dir}/ZonalMean.nc")
    fd = FiniteDiff({"Z": "LEV", "Y": "lat"},
                    BCs={"Z": "fixed", "Y": "fixed"}, coords="lat-lon")
    vor = fd.vort(v=zm["vm"], w=zm["wm"], components="i")
    iP = {"BCs": ["fixed", "extend"], "undef": np.nan, "mxLoop": 5001,
          "tolerance": 1e-13, "scheme": "lexico", "printInfo": False}
    invert_Poisson(vor, dims=["LEV", "lat"], coords="z-lat", iParams=iP)
    it, rel = _last()
    _check(truth["nb02_vertical_poisson"], it[0], rel[0])


def _ideal_coeffs(zm):
    A, C = zm["Acoef"], zm["Ccoef"]
    lat = np.asarray(A.coords["lat"], np.float64)
    cos = np.cos(np.deg2rad(lat))
    Ai = Field(np.broadcast_to(np.nanmean(A.values * cos) / cos,
                               A.shape).copy(), A.dims, A.coords)
    Ci = Field(np.broadcast_to(np.nanmean(C.values * cos) / cos,
                               C.shape).copy(), C.dims, C.coords)
    Bi = Field(np.zeros(A.shape), A.dims, A.coords)
    return Ai, Bi, Ci


def test_nb04_eliassen_zonalmean(data_dir, truth):
    """Notebook 04 (Sawyer-Eliassen, zonal-mean atmosphere): real and
    idealized coefficients with the point forcing, then the eddy-flux
    forcing.  The EHF case still matches the PUBLISHED record
    (168+1 sweeps, 6.859964e-13); the F_ideal cases assert the
    direct-driven truth (fixture skew, see tools/make_notebook_truth.py)."""
    zm = open_dataset(f"{data_dir}/ZonalMean.nc")
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 1001, "tolerance": 1e-12,
          "scheme": "lexico", "printInfo": False}
    mp_real = {"A": zm["Acoef"], "B": zm["Bcoef"], "C": zm["Ccoef"]}
    Ai, Bi, Ci = _ideal_coeffs(zm)

    invert_Eliassen(zm["F_ideal"], dims=["LEV", "lat"], coords="z-lat",
                    mParams=mp_real, iParams=iP)
    _check(truth["nb04_eliassen_real"], *_last())

    invert_Eliassen(zm["F_ideal"], dims=["LEV", "lat"], coords="z-lat",
                    mParams={"A": Ai, "B": Bi, "C": Ci}, iParams=iP)
    _check(truth["nb04_eliassen_ideal"], *_last())

    invert_Eliassen(zm["EHF"] + zm["EAF"], dims=["LEV", "lat"],
                    coords="z-lat", mParams=mp_real, iParams=iP)
    it, rel = _last()
    _check(truth["nb04_eliassen_ehf"], it, rel)
    assert int(_scalar(it)) == 168 + 1              # published record
    assert float(_scalar(rel)) == pytest.approx(6.859964e-13, rel=5e-3)


def test_nb04_eliassen_tc2d(data_dir, truth):
    """Notebook 04, typhoon case (TC2D.nc)."""
    tc = open_dataset(f"{data_dir}/TC2D.nc")
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 1001, "tolerance": 1e-12,
          "scheme": "lexico", "printInfo": False}
    invert_Eliassen(tc["faf"], dims=["lev", "lat"], coords="z-lat",
                    mParams={"A": tc["Aa"], "B": tc["Bb"], "C": tc["Cc"]},
                    iParams=iP)
    _check(truth["nb04_eliassen_tc2d"], *_last())


def test_nb07_gillmatsuno_synthetic():
    """Notebook 07, part 1: three synthetic heating patterns.  Pure-f64
    workload — OUR runs reproduce the PUBLISHED records to all printed
    digits (the strongest end-to-end parity statement in the suite)."""
    lon = np.linspace(0, 360, 144)
    lat = np.linspace(-90, 90, 73)
    L, N = np.meshgrid(lat, lon, indexing="ij")

    def mk(a):
        return Field(a, ("lat", "lon"), {"lat": lat, "lon": lon})

    Q1 = mk(0.05 * np.exp(-((L - 0) ** 2 + (N - 120) ** 2) / 100.0))
    Q2 = mk(0.05 * np.exp(-((L - 10) ** 2 + (N - 120) ** 2) / 100.0)
            - 0.05 * np.exp(-((L + 10) ** 2 + (N - 120) ** 2) / 100.0))
    Q3 = mk(0.05 * np.exp(-((L - 10) ** 2 + (N - 120) ** 2) / 100.0))
    iP = {"BCs": ["fixed", "periodic"], "mxLoop": 601, "tolerance": 1e-5,
          "optArg": 1.4, "scheme": "lexico", "printInfo": False}
    mP = {"epsilon": 1e-5, "Phi": 5000}
    published = [(600, 5.608964e-05), (87, 4.905623e-06),
                 (600, 5.174635e-05)]
    for Q, (L_ref, tol_ref) in zip((Q1, Q2, Q3), published):
        invert_GillMatsuno(Q, dims=["lat", "lon"], mParams=mP, iParams=iP)
        it, rel = _last()
        assert int(_scalar(it)) == L_ref + 1
        assert float(_scalar(rel)) == pytest.approx(tol_ref, rel=1e-5)


def test_nb07_gillmatsuno_mjo(data_dir):
    """Notebook 07, part 2: observed MJO heating, three parameter sets.
    Published loop counts reproduce exactly; tolerances to ~1e-4 (the
    fixture's float32 lat/lon coordinates round the reference's metric
    scalars, ours are f64)."""
    mj = open_dataset(f"{data_dir}/MJO.nc")
    lat = np.asarray(mj["ol"].coords["lat"])
    Q = (mj["ol"] * -0.0015).where(np.abs(lat)[:, None] < 60, 0)
    iP = {"BCs": ["fixed", "periodic"], "mxLoop": 801, "tolerance": 1e-5,
          "optArg": 1.4, "scheme": "lexico", "printInfo": False}
    published = [((355, 9.991392e-06), {"epsilon": 1e-5, "Phi": 5000}),
                 ((387, 9.715559e-06), {"epsilon": 7e-6, "Phi": 8000}),
                 ((412, 9.791216e-06), {"epsilon": 7e-6, "Phi": 10000})]
    for (L_ref, tol_ref), mP in published:
        invert_GillMatsuno(Q, dims=["lat", "lon"], mParams=mP, iParams=iP)
        it, rel = _last()
        assert int(_scalar(it)) == L_ref + 1
        assert float(_scalar(rel)) == pytest.approx(tol_ref, rel=5e-4)


def test_nb09_fofonoff(truth):
    """Notebook 09, part 1: cartesian Fofonoff free mode.  Published
    1174/9.362824e-15 — the stopping change sits at the f64
    reorder-noise scale, so loop counts carry a few-sweep slack."""
    xc = np.linspace(0, 600000, 301)
    yc = np.linspace(0, 500000, 251)
    F = Field(yc[:, None] - xc[None, :], ("y", "x"), {"y": yc, "x": xc})
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 4001, "tolerance": 1e-14,
          "optArg": 1.2, "scheme": "lexico", "printInfo": False}
    invert_Fofonoff(F, dims=["y", "x"], coords="cartesian", iParams=iP,
                    mParams={"f0": 1e-4, "beta": 2e-11,
                             "c0": 8e-9, "c1": 1e-4})
    it, rel = _last()
    rec = truth["nb09_fofonoff"]
    assert abs(int(_scalar(it)) - rec["sweeps"]) <= 10
    assert float(_scalar(rel)) < 1.1e-14


def test_nb10_bretherton(data_dir):
    """Notebook 10: flow over topography, four lambda values.  Published
    loops (1136, 1157, 1133, 1116) with change EXACTLY 0.0 — the runs
    terminate at the f64 fixed point, where our reordered (associative
    scan) arithmetic rattles at ~1e-17 relative instead of hitting exact
    zero; loop counts agree within the resulting slack and the final
    change sits below the notebook's 1e-16 threshold."""
    topo = open_dataset(f"{data_dir}/topo.nc")["topo"]
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 3001, "tolerance": 1e-16,
          "undef": np.nan, "scheme": "lexico", "printInfo": False}
    for lm, L_ref in zip((1e-14, 3e-14, 1e-13, 3e-13),
                         (1136, 1157, 1133, 1116)):
        invert_BrethertonHaidvogel(
            topo, dims=["y", "x"], coords="cartesian",
            mParams={"f0": 1e-4, "D": 1000, "lambda": lm}, iParams=iP)
        it, rel = _last()
        assert abs(int(_scalar(it)) - (L_ref + 1)) <= 100
        assert float(_scalar(rel)) < 1e-16
