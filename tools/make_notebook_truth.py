# -*- coding: utf-8 -*-
"""Direct-drive ground truth for the reference notebooks' workloads.

The tutorial notebooks (/root/reference/docs/source/notebooks/) print
per-slice convergence records ``loops N and tolerance is X``.  Two issues
keep those PUBLISHED numbers from being universal oracles:

1. fixture skew — the shipped ``ZonalMean.nc`` postdates the published
   NB02/NB04 runs (driving the reference kernels directly on the shipped
   file reproduces OUR numbers, not the notebooks': e.g. the NB04
   F_ideal case converges at loop 207 where the notebook shows a
   1000-loop cap);
2. dtype — NB01 ran on the float32 ``Helmholtz_atmos.nc`` state, so its
   printed tolerances sit at the f32 noise floor (5.16e-9), not on the
   f64 trajectory (3.37e-10).

This tool therefore regenerates the ground truth by driving THE REFERENCE
KERNELS (/root/reference/xinvert/numbas.py, numba stubbed out, pure-python)
on the SHIPPED fixtures at float64, mirroring each notebook's coefficient
pipeline (apps.py builders transcribed to numpy where xarray is
unavailable).  Results go to ``tests/notebook_truth.json`` and are asserted
by ``tests/test_notebook_parity.py``.

Reference loop semantics (numbas.py:278-414): ``loops`` as printed is the
final value of a counter that starts at 0 and increments AFTER the break
test, so a printed ``loops L`` means L+1 sweeps executed; our framework
reports sweeps executed (see tests/test_reference_direct.py).

Usage:  python tools/make_notebook_truth.py [--slow]
        (--slow adds the 201x301 Bretherton case: ~7.5 min pure python)
"""
import argparse
import importlib.util
import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference/xinvert/numbas.py"
DATA = "/root/reference/Data"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests",
                   "notebook_truth.json")


def load_ref():
    if "numba" not in sys.modules:
        fake = types.ModuleType("numba")

        def jit(*a, **k):
            def deco(f):
                return f
            return deco

        fake.jit = jit
        sys.modules["numba"] = fake
    spec = importlib.util.spec_from_file_location("_ref_numbas", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def opt_arg(yc, xc):
    """__cal_params2D optimal omega (apps.py:2289-2290)."""
    eps = np.sin(np.pi / (2 * xc + 2)) ** 2 + np.sin(np.pi / (2 * yc + 2)) ** 2
    return 2.0 / (1.0 + np.sqrt((2.0 - eps) * eps))


def run_standard2d(ref, S, A, B, C, F, dely, delx, bcy, bcx, optArg,
                   mxLoop, tol):
    yc, xc = F.shape
    ratio = delx / dely
    flags = np.array([0.0, 1.0, 0.0])
    ref.invert_standard_2D(S, A, B, C, F, yc, xc, dely, delx, bcy, bcx,
                           delx ** 2, ratio / 4.0, ratio ** 2, optArg,
                           -9.99e8, flags, mxLoop, tol)
    return flags, S


def run_standard1d(ref, S, A, B, F, delx, bcx, optArg, mxLoop, tol):
    xc = F.shape[0]
    flags = np.array([0.0, 1.0, 0.0])
    ref.invert_standard_1D(S, A, B, F, xc, delx, bcx, delx ** 2, optArg,
                           -9.99e8, flags, mxLoop, tol)
    return flags, S


def run_standard3d(ref, S, A, B, C, F, delz, dely, delx, bcz, bcy, bcx,
                   optArg, mxLoop, tol):
    zc, yc, xc = F.shape
    ratio1 = delx / dely
    ratio2 = delx / delz
    flags = np.array([0.0, 1.0, 0.0])
    ref.invert_standard_3D(S, A, B, C, F, zc, yc, xc, delz, dely, delx,
                           bcz, bcy, bcx, delx ** 2, ratio2 ** 2,
                           ratio1 ** 2, optArg, -9.99e8, flags, mxLoop,
                           tol)
    return flags, S


def opt_arg3(zc, yc, xc):
    """__cal_params3D optimal omega (apps.py:2206-2209)."""
    eps = (np.sin(np.pi / (2 * xc + 2)) ** 2
           + np.sin(np.pi / (2 * yc + 2)) ** 2
           + np.sin(np.pi / (2 * zc + 3)) ** 2)
    return 2.0 / (1.0 + np.sqrt((2.0 - eps) * eps))


def opt_arg1(xc):
    """__cal_params1D optimal omega (apps.py:2342-2343)."""
    eps = np.sin(np.pi / (2 * xc + 2)) ** 2
    return 2.0 / (1.0 + np.sqrt((2.0 - eps) * eps))


def run_standard2d_test(ref, S, A, B, C, D, E, F, dely, delx, bcy, bcx,
                        optArg, mxLoop, tol):
    yc, xc = F.shape
    ratio = delx / dely
    flags = np.array([0.0, 1.0, 0.0])
    ref.invert_standard_2D_test(S, A, B, C, D, E, F, yc, xc, dely, delx,
                                bcy, bcx, delx ** 2, ratio / 4.0,
                                ratio ** 2, optArg, -9.99e8, flags,
                                mxLoop, tol)
    return flags, S


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slow", action="store_true",
                    help="include the 201x301 Bretherton case (~7.5 min)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from xinvert_tpu.io import open_dataset
    from xinvert_tpu.fd import FiniteDiff

    ref = load_ref()
    R = 6371200.0
    out = {}

    def record(key, flags, S, wall, note=""):
        out[key] = {
            "loops": int(flags[2]), "sweeps": int(flags[2]) + 1,
            "tolerance": float(flags[1]), "overflow": bool(flags[0]),
            "mean_abs_S": float(np.nanmean(np.abs(S))),
            "max_abs_S": float(np.nanmax(np.abs(S))),
            "wall_s": round(wall, 1), "note": note,
        }
        print(key, out[key], flush=True)

    # ---- NB01: Poisson lat-lon, Helmholtz_atmos vor, 2 time slices
    # (notebook 01; published f32 records 1000/5.164704e-09, /6.395749e-09)
    ds = open_dataset(f"{DATA}/Helmholtz_atmos.nc")
    vor = np.asarray(ds["vor"].values, np.float64)
    lat = np.asarray(ds["vor"].coords["lat"], np.float64)
    lon = np.asarray(ds["vor"].coords["lon"], np.float64)
    ny, nx = lat.size, lon.size
    latr = np.deg2rad(lat)
    cosG = np.cos(latr)
    sh = np.empty_like(latr)
    sh[1:] = latr[:-1]
    sh[0] = np.nan
    cosH = np.cos((latr + sh) / 2.0)
    A = np.broadcast_to(cosH[:, None], (ny, nx)).copy()
    B = np.zeros((ny, nx))
    C = np.broadcast_to((1.0 / cosG)[:, None], (ny, nx)).copy()
    dely = float(np.deg2rad(np.diff(lat)[0]) * R)
    delx = float(np.deg2rad(np.diff(lon)[0]) * R)
    for t in range(2):
        F = vor[t] * cosG[:, None]
        t0 = time.time()
        flags, S = run_standard2d(ref, np.zeros_like(F), A, B, C, F, dely,
                                  delx, "extend", "periodic",
                                  opt_arg(ny, nx), 1000, 1e-12)
        record(f"nb01_poisson_t{t}", flags, S, time.time() - t0,
               "f64 drive of the f32 fixture; published f32 values are the "
               "f32 noise floor")

    # ---- NB02a: vertical-plane Poisson z-lat on ZonalMean vm/wm vorticity
    zm = open_dataset(f"{DATA}/ZonalMean.nc")
    fd = FiniteDiff({"Z": "LEV", "Y": "lat"},
                    BCs={"Z": "fixed", "Y": "fixed"}, coords="lat-lon")
    vorzm = np.asarray(
        fd.vort(v=zm["vm"], w=zm["wm"], components="i").values, np.float64)
    latz = np.asarray(zm["vm"].coords["lat"], np.float64)
    lev = np.asarray(zm["vm"].coords["LEV"], np.float64)
    nyz, nxz = vorzm.shape
    F = vorzm * np.cos(np.deg2rad(latz))[None, :]
    dely = float(np.diff(lev)[0])
    delx = float(np.deg2rad(np.diff(latz)[0]) * R)
    t0 = time.time()
    flags, S = run_standard2d(ref, np.zeros_like(F), np.ones_like(F),
                              np.zeros_like(F), np.ones_like(F), F, dely,
                              delx, "fixed", "extend", opt_arg(nyz, nxz),
                              5000, 1e-13)
    record("nb02_vertical_poisson", flags, S, time.time() - t0,
           "shipped ZonalMean.nc postdates the published 5000-cap record")

    # ---- NB04: Eliassen on ZonalMean (real/ideal coeffs + EHF forcing)
    A4 = zm["Acoef"].values.astype(np.float64)
    B4 = zm["Bcoef"].values.astype(np.float64)
    C4 = zm["Ccoef"].values.astype(np.float64)
    cosL = np.cos(np.deg2rad(latz))
    Ai = np.broadcast_to(np.nanmean(A4 * cosL) / cosL, A4.shape).copy()
    Ci = np.broadcast_to(np.nanmean(C4 * cosL) / cosL, C4.shape).copy()
    dely = float(np.diff(lev)[0])
    delx = float(np.deg2rad(np.diff(latz)[0]) * R)
    cases = {
        "nb04_eliassen_real": (A4, B4, C4, zm["F_ideal"].values),
        "nb04_eliassen_ideal": (Ai, np.zeros_like(B4), Ci,
                                zm["F_ideal"].values),
        "nb04_eliassen_ehf": (A4, B4, C4,
                              (zm["EHF"] + zm["EAF"]).values),
    }
    for key, (Ac, Bc, Cc, Fc) in cases.items():
        t0 = time.time()
        flags, S = run_standard2d(ref, np.zeros_like(Fc), Ac, Bc, Cc,
                                  Fc.astype(np.float64), dely, delx,
                                  "fixed", "fixed",
                                  opt_arg(*Fc.shape), 1000, 1e-12)
        record(key, flags, S, time.time() - t0)

    # ---- NB04: Eliassen on TC2D (typhoon case)
    tc = open_dataset(f"{DATA}/TC2D.nc")
    lev_t = np.asarray(tc["Aa"].coords["lev"], np.float64)
    lat_t = np.asarray(tc["Aa"].coords["lat"], np.float64)
    dely = float(np.diff(lev_t)[0])
    delx = float(np.deg2rad(np.diff(lat_t)[0]) * R)
    Fc = tc["faf"].values.astype(np.float64)
    t0 = time.time()
    flags, S = run_standard2d(ref, np.zeros_like(Fc),
                              tc["Aa"].values.astype(np.float64),
                              tc["Bb"].values.astype(np.float64),
                              tc["Cc"].values.astype(np.float64),
                              Fc, dely, delx, "fixed", "fixed",
                              opt_arg(*Fc.shape), 1000, 1e-12)
    record("nb04_eliassen_tc2d", flags, S, time.time() - t0,
           "shipped TC2D.nc postdates the published 1000-cap record")

    # ---- NB09: Fofonoff cartesian (standard_2D_test; forcing is c1 - f,
    # the user field only sets the mask — apps.py __coeffs_Fofonoff)
    xcv = np.linspace(0, 600000, 301)
    ycv = np.linspace(0, 500000, 251)
    nyf, nxf = 251, 301
    f = 1e-4 + 2e-11 * ycv
    Ff = np.broadcast_to((1e-4 - f)[:, None], (nyf, nxf)).copy()
    t0 = time.time()
    flags, S = run_standard2d_test(
        ref, np.zeros((nyf, nxf)), np.ones((nyf, nxf)),
        np.zeros((nyf, nxf)), np.zeros((nyf, nxf)), np.ones((nyf, nxf)),
        np.zeros((nyf, nxf)) - 8e-9, Ff,
        float(np.diff(ycv)[0]), float(np.diff(xcv)[0]), "fixed", "fixed",
        1.2, 4000, 1e-14)
    record("nb09_fofonoff", flags, S, time.time() - t0)

    # ---- NB10: Bretherton cartesian on topo.nc (standard_2D_test),
    # lambda=1e-14 case (published loops 1136); pure python ~45 min
    if args.slow:
        topo = open_dataset(f"{DATA}/topo.nc")
        h = topo["topo"].values.astype(np.float64)
        yv = np.asarray(topo["topo"].coords["y"], np.float64)
        xv = np.asarray(topo["topo"].coords["x"], np.float64)
        nyb, nxb = h.shape
        fb = 1e-4 + 2e-11 * yv  # beta default (apps.py:44)
        Fb = -h * fb[:, None] / 1000.0
        t0 = time.time()
        flags, S = run_standard2d_test(
            ref, np.zeros_like(h), np.ones_like(h), np.zeros_like(h),
            np.zeros_like(h), np.ones_like(h),
            np.zeros_like(h) - 1e-14 * 1000.0, Fb,
            float(np.diff(yv)[0]), float(np.diff(xv)[0]), "fixed", "fixed",
            opt_arg(nyb, nxb), 3000, 1e-16)
        record("nb10_bretherton_l1e14", flags, S, time.time() - t0)

    # ---- Round 5: the stripped-fixture notebooks (NB03/NB05/NB11) on
    # synthetic scale-matched inputs (tests/notebook_workloads.py builds
    # them; the reference kernels are driven on the SAME arrays here)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    import notebook_workloads as nw

    # NB03a: Poisson with geopotential Dirichlet boundary (icbc).
    # __mask_FS icbc semantics (apps.py:2144-2156): initS = icbc on the
    # domain edges of non-periodic dims, zeros elsewhere (no undef here)
    force, hbc, force_half = nw.nb03_fields()
    Fv = np.asarray(force.values, np.float64)
    hv = np.asarray(hbc.values, np.float64)
    lat3 = np.asarray(force.coords["lat"], np.float64)
    lon3 = np.asarray(force.coords["lon"], np.float64)
    ny3, nx3 = Fv.shape
    latr = np.deg2rad(lat3)
    cosG = np.cos(latr)
    sh = np.empty_like(latr)
    sh[1:] = latr[:-1]
    sh[0] = np.nan
    cosH = np.cos((latr + sh) / 2.0)
    A = np.broadcast_to(cosH[:, None], (ny3, nx3)).copy()
    C = np.broadcast_to((1.0 / cosG)[:, None], (ny3, nx3)).copy()
    dely = float(np.deg2rad(np.diff(lat3)[0]) * R)
    delx = float(np.deg2rad(np.diff(lon3)[0]) * R)
    S0 = np.zeros_like(Fv)
    S0[0, :] = hv[0, :]
    S0[-1, :] = hv[-1, :]
    t0 = time.time()
    flags, S = run_standard2d(ref, S0, A, np.zeros_like(Fv), C,
                              Fv * cosG[:, None], dely, delx, "fixed",
                              "periodic", opt_arg(ny3, nx3), 2000, 1e-12)
    record("nb03_poisson_icbc", flags, S, time.time() - t0,
           "synthetic NB03 balanced-mass workload (atmos3D.nc stripped); "
           "published true-fixture record: 20000/5.473987e-09")

    # NB03b: geostrophic on the half-shifted latitude grid (no f=0 point)
    Fh = np.asarray(force_half.values, np.float64)
    lat_h = np.asarray(force_half.coords["lat"], np.float64)
    nyh, nxh = Fh.shape
    latrh = np.deg2rad(lat_h)
    cosGh = np.cos(latrh)
    shh = np.empty_like(latrh)
    shh[1:] = latrh[:-1]
    shh[0] = np.nan
    cosHh = np.cos((latrh + shh) / 2.0)
    Om = 7.292e-5
    fG = 2.0 * Om * np.sin(latrh)
    fH = 2.0 * Om * np.sin((latrh + shh) / 2.0)
    fH = np.where(np.abs(fH) < 2e-5, fH * 1.5, fH)   # apps.py:1909-1910
    fG = np.where(np.abs(fG) < 2e-5, fG * 1.5, fG)
    Ag = np.broadcast_to((fH * cosHh)[:, None], (nyh, nxh)).copy()
    Cg = np.broadcast_to((fG / cosGh)[:, None], (nyh, nxh)).copy()
    delyh = float(np.deg2rad(np.diff(lat_h)[0]) * R)
    t0 = time.time()
    flags, S = run_standard2d(ref, np.zeros_like(Fh), Ag,
                              np.zeros_like(Fh), Cg,
                              Fh * cosGh[:, None], delyh, delx, "fixed",
                              "periodic", opt_arg(nyh, nxh), 2000, 1e-12)
    record("nb03_geostrophic", flags, S, time.time() - t0,
           "synthetic NB03 geostrophic workload; published true-fixture "
           "record: 5000/8.480886e-10")

    # NB05: nonlinear RefStateSWM chain — 5 rounds re-tabulating Q(M),
    # C(M) (notebook 05, printInfo=False: no published record at all).
    # Coefficients transcribe __coeffs_RefStateSWM (apps.py:1470-1524).
    lat5, ctr5, Mass5, Circ5 = nw.nb05_tabulations()
    lats5 = np.deg2rad(lat5)
    cosG5 = np.cos(lats5)
    sh5 = np.empty_like(lats5)
    sh5[1:] = lats5[:-1]
    sh5[0] = np.nan
    cosH5 = np.cos((lats5 + sh5) / 2.0)
    sinG5 = np.sin(lats5)
    asin5 = R * sinG5
    acos5 = R * cosG5
    acos5 = np.where(acos5 < 0, -acos5 * 0.1, acos5)   # apps.py:1505
    g0 = 9.80665
    delY = abs(lats5[0] - lats5[1]) * R
    Mref = Mass5.max() * (np.sin(np.deg2rad(lat5)) + 1.0) / 2.0
    t0 = time.time()
    for rnd in range(5):
        Qref, Cref = nw.nb05_round_inputs(lat5, ctr5, Mass5, Circ5, Mref)
        diff = np.zeros_like(Mref)
        J = len(Mref)
        for j in range(1, J - 1):
            diff[j] = (((Mref[j + 1] - Mref[j]) / cosH5[j + 1])
                       - ((Mref[j] - Mref[j - 1]) / cosH5[j])) / delY ** 2
        A1 = 1.0 / cosH5
        B1 = -Cref * Qref * asin5 / (np.pi * g0 * acos5 ** 3)
        F1 = (-(asin5 * Cref ** 2 / (2.0 * np.pi * g0 * acos5 ** 3))
              + (2.0 * np.pi * Om ** 2 * asin5 * acos5) / g0 - diff)
        flags, dM = run_standard1d(ref, np.zeros_like(F1), A1, B1, F1,
                                   delY, "fixed", opt_arg1(J), 5000,
                                   1e-15)
        Mref = Mref + dM
    out_extra = {"mean_abs_M": float(np.mean(np.abs(Mref)))}
    record("nb05_swm_round5", flags, Mref, time.time() - t0,
           "5th outer round of the nonlinear chain on the synthesized "
           "balanced tabulations (Barotropic2D.nc stripped; notebook "
           "prints no record)")
    out["nb05_swm_round5"].update(out_extra)

    # NB11: QG omega on the synthetic atmos3D-like volume (traditional +
    # topographic-icbc variants; 31-sweep cap — the pure-python reference
    # drive bounds the budget).  __coeffs_omega (apps.py:2016-2052).
    from xinvert_tpu.io import open_dataset as _ods
    a = _ods(os.path.join(os.path.dirname(__file__), "..", "Data",
                          "atmos3d_like.nc"))
    F11 = np.asarray(a["F"].values, np.float64)
    N2 = np.asarray(a["N2"].values, np.float64)
    WBC = np.asarray(a["WBC"].values, np.float64)
    lev = np.asarray(a["F"].coords["LEV"], np.float64)
    lat1 = np.asarray(a["F"].coords["lat"], np.float64)
    lon1 = np.asarray(a["F"].coords["lon"], np.float64)
    zc, yc, xc = F11.shape
    latr1 = np.deg2rad(lat1)
    cosG1 = np.cos(latr1)
    sh1 = np.empty_like(latr1)
    sh1[1:] = latr1[:-1]
    sh1[0] = np.nan
    cosH1 = np.cos((latr1 + sh1) / 2.0)
    f1 = 2.0 * Om * np.sin(latr1)
    A11 = np.broadcast_to((f1 ** 2 * cosG1)[None, :, None],
                          (zc, yc, xc)).copy()
    B11 = N2 * cosH1[None, :, None]
    C11 = N2 / cosG1[None, :, None]
    Fc11 = F11 * cosG1[None, :, None]
    delz = float(np.diff(lev)[0])
    dely1 = float(np.deg2rad(np.diff(lat1)[0]) * R)
    delx1 = float(np.deg2rad(np.diff(lon1)[0]) * R)
    for key, use_icbc in (("nb11_omega", False), ("nb11_omega_icbc", True)):
        S0 = np.zeros_like(F11)
        if use_icbc:
            # __mask_FS icbc: edges of the non-periodic dims (LEV, lat)
            S0[0], S0[-1] = WBC[0], WBC[-1]
            S0[:, 0], S0[:, -1] = WBC[:, 0], WBC[:, -1]
        t0 = time.time()
        flags, S = run_standard3d(ref, S0, A11, B11, C11, Fc11, delz,
                                  dely1, delx1, "fixed", "fixed",
                                  "periodic", opt_arg3(zc, yc, xc), 30,
                                  1e-16)
        record(key, flags, S, time.time() - t0,
               "synthetic NB11 omega workload (atmos3D.nc stripped); "
               "published true-fixture records: 3601/0.0, 5000/8.07e-11")

    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
