# -*- coding: utf-8 -*-
"""Shared definitions of the reference notebooks' workloads.

Single source of truth for the notebook-parity matrix: each entry holds
the published per-slice records, the direct-driven-truth key
(tests/notebook_truth.json, regenerate with tools/make_notebook_truth.py)
and a ``run(data_dir)`` callable that performs the inversion through the
public API with ``scheme='lexico'`` at float64.  Consumed by BOTH
tests/test_notebook_parity.py (assertions) and tools/e2e_notebooks.py
(the E2E.json artifact) so the two cannot drift apart.

Loop convention: a published ``loops L`` means L+1 sweeps executed (the
reference counter increments after its break test, numbas.py:278-414);
``run`` therefore passes ``mxLoop = ref_mxLoop + 1``.
"""
import numpy as np

from xinvert_tpu import (invert_Poisson, invert_Eliassen, invert_Fofonoff,
                         invert_GillMatsuno, invert_BrethertonHaidvogel)
from xinvert_tpu.field import Field
from xinvert_tpu.fd import FiniteDiff
from xinvert_tpu.io import open_dataset
from xinvert_tpu.models import api

LEX = {"scheme": "lexico", "printInfo": False}


def last_solve():
    """Per-slice (sweeps, rel_change) arrays of the last API solve."""
    res = api.LAST_SOLVE
    return (np.atleast_1d(np.asarray(res.iters)),
            np.atleast_1d(np.asarray(res.rel_change)))


# ---------------------------------------------------------------- NB01
def run_nb01(data_dir):
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    iP = {"BCs": ["extend", "periodic"], "mxLoop": 1001,
          "tolerance": 1e-12, **LEX}
    invert_Poisson(ds["vor"], dims=["lat", "lon"], iParams=iP)


# ---------------------------------------------------------------- NB02a
def run_nb02(data_dir):
    zm = open_dataset(f"{data_dir}/ZonalMean.nc")
    fd = FiniteDiff({"Z": "LEV", "Y": "lat"},
                    BCs={"Z": "fixed", "Y": "fixed"}, coords="lat-lon")
    vor = fd.vort(v=zm["vm"], w=zm["wm"], components="i")
    iP = {"BCs": ["fixed", "extend"], "undef": np.nan, "mxLoop": 5001,
          "tolerance": 1e-13, **LEX}
    invert_Poisson(vor, dims=["LEV", "lat"], coords="z-lat", iParams=iP)


# ---------------------------------------------------------------- NB04
def ideal_eliassen_coeffs(zm):
    """Aideal/Bideal/Cideal of notebook 04 (xarray .mean() skips NaN)."""
    A, C = zm["Acoef"], zm["Ccoef"]
    lat = np.asarray(A.coords["lat"], np.float64)
    cos = np.cos(np.deg2rad(lat))
    Ai = Field(np.broadcast_to(np.nanmean(A.values * cos) / cos,
                               A.shape).copy(), A.dims, A.coords)
    Ci = Field(np.broadcast_to(np.nanmean(C.values * cos) / cos,
                               C.shape).copy(), C.dims, C.coords)
    Bi = Field(np.zeros(A.shape), A.dims, A.coords)
    return Ai, Bi, Ci


def _run_nb04(data_dir, which):
    zm = open_dataset(f"{data_dir}/ZonalMean.nc")
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 1001, "tolerance": 1e-12,
          **LEX}
    mp_real = {"A": zm["Acoef"], "B": zm["Bcoef"], "C": zm["Ccoef"]}
    if which == "real":
        invert_Eliassen(zm["F_ideal"], dims=["LEV", "lat"], coords="z-lat",
                        mParams=mp_real, iParams=iP)
    elif which == "ideal":
        Ai, Bi, Ci = ideal_eliassen_coeffs(zm)
        invert_Eliassen(zm["F_ideal"], dims=["LEV", "lat"], coords="z-lat",
                        mParams={"A": Ai, "B": Bi, "C": Ci}, iParams=iP)
    else:
        invert_Eliassen(zm["EHF"] + zm["EAF"], dims=["LEV", "lat"],
                        coords="z-lat", mParams=mp_real, iParams=iP)


def run_nb04_tc2d(data_dir):
    tc = open_dataset(f"{data_dir}/TC2D.nc")
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 1001, "tolerance": 1e-12,
          **LEX}
    invert_Eliassen(tc["faf"], dims=["lev", "lat"], coords="z-lat",
                    mParams={"A": tc["Aa"], "B": tc["Bb"], "C": tc["Cc"]},
                    iParams=iP)


# ---------------------------------------------------------------- NB07
def nb07_synthetic_heatings():
    lon = np.linspace(0, 360, 144)
    lat = np.linspace(-90, 90, 73)
    L, N = np.meshgrid(lat, lon, indexing="ij")

    def mk(a):
        return Field(a, ("lat", "lon"), {"lat": lat, "lon": lon})

    return [mk(0.05 * np.exp(-((L - 0) ** 2 + (N - 120) ** 2) / 100.0)),
            mk(0.05 * np.exp(-((L - 10) ** 2 + (N - 120) ** 2) / 100.0)
               - 0.05 * np.exp(-((L + 10) ** 2 + (N - 120) ** 2) / 100.0)),
            mk(0.05 * np.exp(-((L - 10) ** 2 + (N - 120) ** 2) / 100.0))]


def _run_nb07_synth(_data_dir, i):
    Q = nb07_synthetic_heatings()[i]
    iP = {"BCs": ["fixed", "periodic"], "mxLoop": 601, "tolerance": 1e-5,
          "optArg": 1.4, **LEX}
    invert_GillMatsuno(Q, dims=["lat", "lon"],
                       mParams={"epsilon": 1e-5, "Phi": 5000}, iParams=iP)


def _run_nb07_mjo(data_dir, mp):
    mj = open_dataset(f"{data_dir}/MJO.nc")
    lat = np.asarray(mj["ol"].coords["lat"])
    Q = (mj["ol"] * -0.0015).where(np.abs(lat)[:, None] < 60, 0)
    iP = {"BCs": ["fixed", "periodic"], "mxLoop": 801, "tolerance": 1e-5,
          "optArg": 1.4, **LEX}
    invert_GillMatsuno(Q, dims=["lat", "lon"], mParams=mp, iParams=iP)


# ---------------------------------------------------------------- NB09
def run_nb09(_data_dir):
    xc = np.linspace(0, 600000, 301)
    yc = np.linspace(0, 500000, 251)
    F = Field(yc[:, None] - xc[None, :], ("y", "x"), {"y": yc, "x": xc})
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 4001, "tolerance": 1e-14,
          "optArg": 1.2, **LEX}
    invert_Fofonoff(F, dims=["y", "x"], coords="cartesian", iParams=iP,
                    mParams={"f0": 1e-4, "beta": 2e-11,
                             "c0": 8e-9, "c1": 1e-4})


# ---------------------------------------------------------------- NB10
def _run_nb10(data_dir, lm):
    topo = open_dataset(f"{data_dir}/topo.nc")["topo"]
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 3001, "tolerance": 1e-16,
          "undef": np.nan, **LEX}
    invert_BrethertonHaidvogel(topo, dims=["y", "x"], coords="cartesian",
                               mParams={"f0": 1e-4, "D": 1000,
                                        "lambda": lm}, iParams=iP)


# ---------------------------------------------------------------- NB03
# atmos3D.nc is stripped from the mount: the workload runs on a synthetic
# 500-hPa-like height field on the same 2.5-degree grid (deterministic
# construction shared with tools/make_notebook_truth.py, which drives the
# reference kernels on the SAME arrays — 'behaviorally reproduced' rows)
_REPO_DATA = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "Data")


def nb03_fields():
    """(force, hbc, force_half): synthetic balanced-mass workload fields.

    ``force`` is the Laplacian of a synthetic 500-hPa geopotential on the
    72x144 2.5-degree grid (the stripped atmos3D.nc's grid), ``hbc`` the
    geopotential itself (NB03's Dirichlet boundary), ``force_half`` the
    same construction on the half-shifted latitude grid NB03 uses for the
    geostrophic inversion (no point at the equator, avoiding f=0 —
    notebook 03's interp_like step)."""
    lat = np.linspace(-87.5, 87.5, 72)
    lon = np.arange(144) * 2.5
    lonr = np.deg2rad(lon)[None, :]

    def build(latv):
        latr = np.deg2rad(latv)[:, None]
        h = (5600.0 - 380.0 * np.sin(latr) ** 2
             + 90.0 * np.cos(latr) ** 2
             * np.sin(3 * lonr + 2.0 * np.sin(latr))
             + 40.0 * np.cos(latr) ** 4 * np.cos(5 * lonr - 1.0))
        return h * 9.81

    fd = FiniteDiff({"Y": "lat", "X": "lon"},
                    BCs={"Y": "extend", "X": "periodic"}, coords="lat-lon")
    hbc = Field(build(lat), ("lat", "lon"), {"lat": lat, "lon": lon})
    force = fd.Laplacian(hbc, ["Y", "X"])
    lat_h = lat[:-1] + 1.25
    h2 = Field(build(lat_h), ("lat", "lon"), {"lat": lat_h, "lon": lon})
    force_half = fd.Laplacian(h2, ["Y", "X"])
    return force, hbc, force_half


def run_nb03_poisson(_data_dir):
    force, hbc, _ = nb03_fields()
    iP = {"BCs": ["fixed", "periodic"], "mxLoop": 2001,
          "tolerance": 1e-12, **LEX}
    invert_Poisson(force, dims=["lat", "lon"], icbc=hbc, iParams=iP)


def run_nb03_geostrophic(_data_dir):
    from xinvert_tpu import invert_geostrophic
    _, _, force_half = nb03_fields()
    iP = {"BCs": ["fixed", "periodic"], "mxLoop": 2001,
          "tolerance": 1e-12, **LEX}
    invert_geostrophic(force_half, dims=["lat", "lon"], iParams=iP)


# ---------------------------------------------------------------- NB05
# Barotropic2D.nc is stripped: the nonlinear RefStateSWM chain runs on
# the synthesized balanced tabulations (Data/barotropic2d_like.nc)
def nb05_tabulations():
    b = open_dataset(f"{_REPO_DATA}/barotropic2d_like.nc")
    lat = np.asarray(b["href"].coords["lat"], np.float64)
    return (lat, b["PV"].values.astype(np.float64),
            b["Mass"].values.astype(np.float64),
            b["Circ"].values.astype(np.float64))


def nb05_round_inputs(lat, ctr, Mass, Circ, Mref):
    """One nonlinear round's (Qref, Cref) tabulation (notebook 05's
    getQandC on the synthetic balanced state)."""
    Q = np.interp(Mref, Mass, ctr)
    Q[lat == 90] = ctr.max()
    C = np.interp(Q, ctr, Circ)
    return Q, C


def run_nb05(_data_dir):
    from xinvert_tpu import invert_RefStateSWM
    lat, ctr, Mass, Circ = nb05_tabulations()
    # tolerance 1e-15, not the notebook's 1e-18: the reference drive hits
    # the f64 fixed point (change EXACTLY 0) where our associative-scan
    # arithmetic dithers at ~1e-17 — 1e-15 is reachable by BOTH change
    # rules (the NB10 lesson)
    iP = {"BCs": ["fixed"], "mxLoop": 5001, "tolerance": 1e-15,
          "undef": np.nan, **LEX}
    Mref = Mass.max() * (np.sin(np.deg2rad(lat)) + 1.0) / 2.0
    for _ in range(5):
        Qref, Cref = nb05_round_inputs(lat, ctr, Mass, Circ, Mref)
        mP = {"M0": Field(Mref, ("lat",), {"lat": lat}),
              "C0": Field(Cref, ("lat",), {"lat": lat})}
        dM = invert_RefStateSWM(Field(Qref, ("lat",), {"lat": lat}),
                                dims=["lat"], iParams=iP, mParams=mP)
        Mref = Mref + dM.values
    return Mref


# ---------------------------------------------------------------- NB11
def run_nb11(_data_dir, icbc=False):
    from xinvert_tpu import invert_omega
    a = open_dataset(f"{_REPO_DATA}/atmos3d_like.nc")
    iP = {"BCs": ["fixed", "fixed", "periodic"], "mxLoop": 31,
          "tolerance": 1e-16, **LEX}
    invert_omega(a["F"], dims=["LEV", "lat", "lon"],
                 mParams={"N2": a["N2"]}, iParams=iP,
                 icbc=a["WBC"] if icbc else None)


def _w(notebook, case, run, slices, note=""):
    return {"notebook": notebook, "case": case, "run": run,
            "slices": slices, "note": note}


# Each slice: {"published": {"loops", "tolerance"} | None, "truth_key": str | None}
WORKLOADS = [
    _w("01_Poisson_equation_horizontal", "global atmos vor (2 slices)",
       run_nb01,
       [{"published": {"loops": 1000, "tolerance": 5.164704e-09},
         "truth_key": "nb01_poisson_t0"},
        {"published": {"loops": 1000, "tolerance": 6.395749e-09},
         "truth_key": "nb01_poisson_t1"}],
       "published run was float32 (the fixture's dtype): its tolerance is "
       "the f32 noise floor; ours/ref_direct are the f64 trajectory"),
    _w("02_Poisson_equation_vertical", "overturning", run_nb02,
       [{"published": {"loops": 5000, "tolerance": 7.339510e-09},
         "truth_key": "nb02_vertical_poisson"}],
       "shipped ZonalMean.nc postdates the published record (ref_direct "
       "on the shipped file confirms ours)"),
    _w("04_Eliassen_model", "ideal-forcing real-coeffs",
       lambda d: _run_nb04(d, "real"),
       [{"published": {"loops": 1000, "tolerance": 1.183260e-08},
         "truth_key": "nb04_eliassen_real"}],
       "shipped ZonalMean.nc postdates the published record"),
    _w("04_Eliassen_model", "ideal-forcing ideal-coeffs",
       lambda d: _run_nb04(d, "ideal"),
       [{"published": {"loops": 1000, "tolerance": 7.911193e-09},
         "truth_key": "nb04_eliassen_ideal"}],
       "shipped ZonalMean.nc postdates the published record"),
    _w("04_Eliassen_model", "eddy-flux forcing",
       lambda d: _run_nb04(d, "ehf"),
       [{"published": {"loops": 168, "tolerance": 6.859964e-13},
         "truth_key": "nb04_eliassen_ehf"}]),
    _w("04_Eliassen_model", "typhoon (TC2D)", run_nb04_tc2d,
       [{"published": {"loops": 1000, "tolerance": 1.046592e-08},
         "truth_key": "nb04_eliassen_tc2d"}],
       "shipped TC2D.nc postdates the published record"),
    _w("07_Gill_Matsuno_model", "synthetic Q1",
       lambda d: _run_nb07_synth(d, 0),
       [{"published": {"loops": 600, "tolerance": 5.608964e-05},
         "truth_key": None}],
       "pure-f64 workload: ours reproduces the published record to all "
       "printed digits"),
    _w("07_Gill_Matsuno_model", "synthetic Q2",
       lambda d: _run_nb07_synth(d, 1),
       [{"published": {"loops": 87, "tolerance": 4.905623e-06},
         "truth_key": None}],
       "pure-f64 workload: ours reproduces the published record to all "
       "printed digits"),
    _w("07_Gill_Matsuno_model", "synthetic Q3",
       lambda d: _run_nb07_synth(d, 2),
       [{"published": {"loops": 600, "tolerance": 5.174635e-05},
         "truth_key": None}],
       "pure-f64 workload: ours reproduces the published record to all "
       "printed digits"),
    _w("07_Gill_Matsuno_model", "MJO eps=1e-05 Phi=5000",
       lambda d: _run_nb07_mjo(d, {"epsilon": 1e-5, "Phi": 5000}),
       [{"published": {"loops": 355, "tolerance": 9.991392e-06},
         "truth_key": None}],
       "loop counts exact; tolerance to ~1e-4 (f32 fixture coordinates "
       "round the reference's metric scalars)"),
    _w("07_Gill_Matsuno_model", "MJO eps=7e-06 Phi=8000",
       lambda d: _run_nb07_mjo(d, {"epsilon": 7e-6, "Phi": 8000}),
       [{"published": {"loops": 387, "tolerance": 9.715559e-06},
         "truth_key": None}],
       "loop counts exact; tolerance to ~1e-4"),
    _w("07_Gill_Matsuno_model", "MJO eps=7e-06 Phi=10000",
       lambda d: _run_nb07_mjo(d, {"epsilon": 7e-6, "Phi": 10000}),
       [{"published": {"loops": 412, "tolerance": 9.791216e-06},
         "truth_key": None}],
       "loop counts exact; tolerance to ~1e-4"),
    _w("09_Fofonoff_flow", "cartesian free mode", run_nb09,
       [{"published": {"loops": 1174, "tolerance": 9.362824e-15},
         "truth_key": "nb09_fofonoff"}],
       "stopping change at the f64 reorder-noise scale: loop counts carry "
       "a few-sweep slack"),
    _w("10_Bretherton_flow_over_topography", "lambda=1e-14",
       lambda d: _run_nb10(d, 1e-14),
       [{"published": {"loops": 1136, "tolerance": 0.0},
         "truth_key": "nb10_bretherton_l1e14"}],
       "published change is EXACTLY 0.0 (f64 fixed point); the "
       "direct-driven reference on the shipped topo.nc reproduces it "
       "EXACTLY (1137 sweeps, change 0.0 — no fixture skew), so the "
       "+99-sweep delta here is purely our associative-scan reorder "
       "noise rattling at ~1e-17 around the same fixed point"),
    _w("10_Bretherton_flow_over_topography", "lambda=3e-14",
       lambda d: _run_nb10(d, 3e-14),
       [{"published": {"loops": 1157, "tolerance": 0.0},
         "truth_key": None}],
       "published change is EXACTLY 0.0 (f64 fixed point)"),
    _w("10_Bretherton_flow_over_topography", "lambda=1e-13",
       lambda d: _run_nb10(d, 1e-13),
       [{"published": {"loops": 1133, "tolerance": 0.0},
         "truth_key": None}],
       "published change is EXACTLY 0.0 (f64 fixed point)"),
    _w("10_Bretherton_flow_over_topography", "lambda=3e-13",
       lambda d: _run_nb10(d, 3e-13),
       [{"published": {"loops": 1116, "tolerance": 0.0},
         "truth_key": None}],
       "published change is EXACTLY 0.0 (f64 fixed point)"),
    # round 5: the three stripped-fixture notebooks, behaviorally
    # reproduced — synthetic scale-matched inputs, reference kernels
    # direct-driven on the SAME arrays (ref_direct oracle; the published
    # records ran on the stripped true fixtures and are quoted in notes)
    _w("03_Balanced_mass_and_flow", "balanced mass (Poisson + hbc icbc)",
       run_nb03_poisson,
       [{"published": None, "truth_key": "nb03_poisson_icbc"}],
       "atmos3D.nc stripped (published: 20000/5.473987e-09); synthetic "
       "500-hPa geopotential on the same grid, icbc boundary, 2001-sweep "
       "cap"),
    _w("03_Balanced_mass_and_flow", "geostrophic (half-shifted lat)",
       run_nb03_geostrophic,
       [{"published": None, "truth_key": "nb03_geostrophic"}],
       "atmos3D.nc stripped (published: 5000/8.480886e-10); synthetic "
       "forcing on NB03's half-shifted grid avoiding f=0"),
    _w("05_reference_SWM", "nonlinear RefStateSWM (round 5 of 5)",
       run_nb05,
       [{"published": None, "truth_key": "nb05_swm_round5"}],
       "Barotropic2D.nc stripped (notebook prints no convergence record, "
       "printInfo=False); synthesized balanced tabulations "
       "(Data/barotropic2d_like.nc), LAST_SOLVE is the 5th outer round — "
       "matching it certifies the whole chain stayed aligned"),
    _w("11_Omega_equation", "QG omega (traditional)",
       lambda d: run_nb11(d, icbc=False),
       [{"published": None, "truth_key": "nb11_omega"}],
       "atmos3D.nc stripped (published: 3601/0.0 at the f64 fixed point); "
       "synthetic forcing/N2 (Data/atmos3d_like.nc), 31-sweep cap (the "
       "pure-python reference drive bounds the budget)"),
    _w("11_Omega_equation", "QG omega (topographic icbc)",
       lambda d: run_nb11(d, icbc=True),
       [{"published": None, "truth_key": "nb11_omega_icbc"}],
       "atmos3D.nc stripped (published: 5000/8.074381e-11); synthetic "
       "WBC lower boundary via icbc, 31-sweep cap"),
]
