# -*- coding: utf-8 -*-
"""E2E.json — end-to-end parity artifact for the reference's notebook
workloads (VERDICT r3 "missing" item 3).

For every tutorial-notebook workload whose fixture ships with the
reference mount, run the SAME inversion through our public API with
``scheme='lexico'`` (the reference's exact iterate sequence) at float64
and record, side by side:

* ``published``     — the notebook's printed ``loops/tolerance`` record
                      (loops in REFERENCE counting: sweeps - 1);
* ``ref_direct``    — the reference kernels driven directly on the
                      shipped fixtures at f64 (tests/notebook_truth.json,
                      regenerate with tools/make_notebook_truth.py);
* ``ours``          — our run: sweeps, final relative change, wall time;
* ``match``         — classification: which oracle(s) we reproduce and
                      to what precision.

Run:  python tools/e2e_notebooks.py       (CPU, float64; ~2 min)
Writes E2E.json at the repo root.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from xinvert_tpu import (invert_Poisson, invert_Eliassen,      # noqa: E402
                         invert_Fofonoff, invert_GillMatsuno,
                         invert_BrethertonHaidvogel)
from xinvert_tpu.field import Field                            # noqa: E402
from xinvert_tpu.fd import FiniteDiff                          # noqa: E402
from xinvert_tpu.io import open_dataset                        # noqa: E402
from xinvert_tpu.models import api                             # noqa: E402

DATA = "/root/reference/Data"
TRUTH = os.path.join(os.path.dirname(__file__), "..", "tests",
                     "notebook_truth.json")


def ours_of_last(wall):
    res = api.LAST_SOLVE
    it = np.atleast_1d(np.asarray(res.iters))
    rel = np.atleast_1d(np.asarray(res.rel_change))
    return [{"sweeps": int(i), "tolerance": float(r),
             "wall_s": round(wall / it.size, 2)}
            for i, r in zip(it, rel)]


def classify(ours, published, ref_direct):
    out = []
    if ref_direct is not None:
        d = abs(ours["tolerance"] - ref_direct["tolerance"]) / max(
            ref_direct["tolerance"], 1e-300)
        out.append({"oracle": "ref_direct",
                    "sweeps_equal": ours["sweeps"] == ref_direct["sweeps"],
                    "tol_rel_err": float(f"{d:.2e}")})
    if published is not None:
        pub_sweeps = published["loops"] + 1
        d = abs(ours["tolerance"] - published["tolerance"]) / max(
            published["tolerance"], 1e-300)
        out.append({"oracle": "published",
                    "sweeps_equal": ours["sweeps"] == pub_sweeps,
                    "sweeps_delta": ours["sweeps"] - pub_sweeps,
                    "tol_rel_err": float(f"{d:.2e}")})
    return out


def main():
    truth = {}
    if os.path.exists(TRUTH):
        truth = json.load(open(TRUTH))
    rows = []

    def row(notebook, case, published, truth_key, ours, note=""):
        rd = truth.get(truth_key)
        rows.append({
            "notebook": notebook, "case": case,
            "published": published, "ref_direct": rd, "ours": ours,
            "match": classify(ours, published, rd), "note": note,
        })
        print(notebook, case, ours, flush=True)

    # ---------------- NB01
    ds = open_dataset(f"{DATA}/Helmholtz_atmos.nc")
    iP = {"BCs": ["extend", "periodic"], "mxLoop": 1001,
          "tolerance": 1e-12, "scheme": "lexico", "printInfo": False}
    t0 = time.time()
    invert_Poisson(ds["vor"], dims=["lat", "lon"], iParams=iP)
    o = ours_of_last(time.time() - t0)
    pubs = [{"loops": 1000, "tolerance": 5.164704e-09},
            {"loops": 1000, "tolerance": 6.395749e-09}]
    for t in range(2):
        row("01_Poisson_equation_horizontal", f"time{t}", pubs[t],
            f"nb01_poisson_t{t}", o[t],
            "published run was float32 (the fixture's dtype): its "
            "tolerance is the f32 noise floor; ours/ref_direct are the "
            "f64 trajectory")

    # ---------------- NB02a
    zm = open_dataset(f"{DATA}/ZonalMean.nc")
    fd = FiniteDiff({"Z": "LEV", "Y": "lat"},
                    BCs={"Z": "fixed", "Y": "fixed"}, coords="lat-lon")
    vor = fd.vort(v=zm["vm"], w=zm["wm"], components="i")
    iP = {"BCs": ["fixed", "extend"], "undef": np.nan, "mxLoop": 5001,
          "tolerance": 1e-13, "scheme": "lexico", "printInfo": False}
    t0 = time.time()
    invert_Poisson(vor, dims=["LEV", "lat"], coords="z-lat", iParams=iP)
    row("02_Poisson_equation_vertical", "overturning",
        {"loops": 5000, "tolerance": 7.339510e-09}, "nb02_vertical_poisson",
        ours_of_last(time.time() - t0)[0],
        "shipped ZonalMean.nc postdates the published record "
        "(ref_direct on the shipped file confirms ours)")

    # ---------------- NB04
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 1001, "tolerance": 1e-12,
          "scheme": "lexico", "printInfo": False}
    mp_real = {"A": zm["Acoef"], "B": zm["Bcoef"], "C": zm["Ccoef"]}
    lat = np.asarray(zm["Acoef"].coords["lat"], np.float64)
    cos = np.cos(np.deg2rad(lat))
    Ai = Field(np.broadcast_to(
        np.nanmean(zm["Acoef"].values * cos) / cos,
        zm["Acoef"].shape).copy(), zm["Acoef"].dims, zm["Acoef"].coords)
    Ci = Field(np.broadcast_to(
        np.nanmean(zm["Ccoef"].values * cos) / cos,
        zm["Ccoef"].shape).copy(), zm["Ccoef"].dims, zm["Ccoef"].coords)
    Bi = Field(np.zeros(zm["Acoef"].shape), zm["Acoef"].dims,
               zm["Acoef"].coords)
    for case, mp, F, pub, key in [
            ("ideal-forcing real-coeffs", mp_real, zm["F_ideal"],
             {"loops": 1000, "tolerance": 1.183260e-08},
             "nb04_eliassen_real"),
            ("ideal-forcing ideal-coeffs", {"A": Ai, "B": Bi, "C": Ci},
             zm["F_ideal"], {"loops": 1000, "tolerance": 7.911193e-09},
             "nb04_eliassen_ideal"),
            ("eddy-flux forcing", mp_real, zm["EHF"] + zm["EAF"],
             {"loops": 168, "tolerance": 6.859964e-13},
             "nb04_eliassen_ehf")]:
        t0 = time.time()
        invert_Eliassen(F, dims=["LEV", "lat"], coords="z-lat",
                        mParams=mp, iParams=iP)
        row("04_Eliassen_model", case, pub, key,
            ours_of_last(time.time() - t0)[0],
            "" if case == "eddy-flux forcing" else
            "shipped ZonalMean.nc postdates the published record")
    tc = open_dataset(f"{DATA}/TC2D.nc")
    t0 = time.time()
    invert_Eliassen(tc["faf"], dims=["lev", "lat"], coords="z-lat",
                    mParams={"A": tc["Aa"], "B": tc["Bb"], "C": tc["Cc"]},
                    iParams=iP)
    row("04_Eliassen_model", "typhoon (TC2D)",
        {"loops": 1000, "tolerance": 1.046592e-08}, "nb04_eliassen_tc2d",
        ours_of_last(time.time() - t0)[0],
        "shipped TC2D.nc postdates the published record")

    # ---------------- NB07
    lon1 = np.linspace(0, 360, 144)
    lat1 = np.linspace(-90, 90, 73)
    L, N = np.meshgrid(lat1, lon1, indexing="ij")

    def mk(a):
        return Field(a, ("lat", "lon"), {"lat": lat1, "lon": lon1})

    Qs = [mk(0.05 * np.exp(-((L - 0) ** 2 + (N - 120) ** 2) / 100.0)),
          mk(0.05 * np.exp(-((L - 10) ** 2 + (N - 120) ** 2) / 100.0)
             - 0.05 * np.exp(-((L + 10) ** 2 + (N - 120) ** 2) / 100.0)),
          mk(0.05 * np.exp(-((L - 10) ** 2 + (N - 120) ** 2) / 100.0))]
    iP = {"BCs": ["fixed", "periodic"], "mxLoop": 601, "tolerance": 1e-5,
          "optArg": 1.4, "scheme": "lexico", "printInfo": False}
    pubs = [{"loops": 600, "tolerance": 5.608964e-05},
            {"loops": 87, "tolerance": 4.905623e-06},
            {"loops": 600, "tolerance": 5.174635e-05}]
    for i, (Q, pub) in enumerate(zip(Qs, pubs)):
        t0 = time.time()
        invert_GillMatsuno(Q, dims=["lat", "lon"],
                           mParams={"epsilon": 1e-5, "Phi": 5000},
                           iParams=iP)
        row("07_Gill_Matsuno_model", f"synthetic Q{i + 1}", pub, None,
            ours_of_last(time.time() - t0)[0],
            "pure-f64 workload: ours reproduces the published record to "
            "all printed digits")
    mj = open_dataset(f"{DATA}/MJO.nc")
    latm = np.asarray(mj["ol"].coords["lat"])
    Q = (mj["ol"] * -0.0015).where(np.abs(latm)[:, None] < 60, 0)
    iP = {"BCs": ["fixed", "periodic"], "mxLoop": 801, "tolerance": 1e-5,
          "optArg": 1.4, "scheme": "lexico", "printInfo": False}
    for pub, mp in [({"loops": 355, "tolerance": 9.991392e-06},
                     {"epsilon": 1e-5, "Phi": 5000}),
                    ({"loops": 387, "tolerance": 9.715559e-06},
                     {"epsilon": 7e-6, "Phi": 8000}),
                    ({"loops": 412, "tolerance": 9.791216e-06},
                     {"epsilon": 7e-6, "Phi": 10000})]:
        t0 = time.time()
        invert_GillMatsuno(Q, dims=["lat", "lon"], mParams=mp, iParams=iP)
        row("07_Gill_Matsuno_model",
            f"MJO eps={mp['epsilon']:g} Phi={mp['Phi']}", pub, None,
            ours_of_last(time.time() - t0)[0],
            "loop counts exact; tolerance to ~1e-4 (f32 fixture "
            "coordinates round the reference's metric scalars)")

    # ---------------- NB09
    xc = np.linspace(0, 600000, 301)
    yc = np.linspace(0, 500000, 251)
    F = Field(yc[:, None] - xc[None, :], ("y", "x"), {"y": yc, "x": xc})
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 4001, "tolerance": 1e-14,
          "optArg": 1.2, "scheme": "lexico", "printInfo": False}
    t0 = time.time()
    invert_Fofonoff(F, dims=["y", "x"], coords="cartesian", iParams=iP,
                    mParams={"f0": 1e-4, "beta": 2e-11, "c0": 8e-9,
                             "c1": 1e-4})
    row("09_Fofonoff_flow", "cartesian free mode",
        {"loops": 1174, "tolerance": 9.362824e-15}, "nb09_fofonoff",
        ours_of_last(time.time() - t0)[0],
        "stopping change at the f64 reorder-noise scale: loop counts "
        "carry a few-sweep slack")

    # ---------------- NB10
    topo = open_dataset(f"{DATA}/topo.nc")["topo"]
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 3001, "tolerance": 1e-16,
          "undef": np.nan, "scheme": "lexico", "printInfo": False}
    for lm, pub in zip((1e-14, 3e-14, 1e-13, 3e-13),
                       ({"loops": 1136, "tolerance": 0.0},
                        {"loops": 1157, "tolerance": 0.0},
                        {"loops": 1133, "tolerance": 0.0},
                        {"loops": 1116, "tolerance": 0.0})):
        t0 = time.time()
        invert_BrethertonHaidvogel(
            topo, dims=["y", "x"], coords="cartesian",
            mParams={"f0": 1e-4, "D": 1000, "lambda": lm}, iParams=iP)
        row("10_Bretherton_flow_over_topography", f"lambda={lm:g}", pub,
            "nb10_bretherton_l1e14" if lm == 1e-14 else None,
            ours_of_last(time.time() - t0)[0],
            "published change is EXACTLY 0.0 (f64 fixed point); our "
            "reordered arithmetic rattles at ~1e-17 instead")

    out = {
        "what": "end-to-end parity on the reference's notebook workloads "
                "(shipped fixtures), scheme='lexico' f64 CPU",
        "loop_convention": "published 'loops L' = L+1 sweeps executed "
                           "(reference counter off-by-one, "
                           "numbas.py:278-414); 'ours.sweeps' counts "
                           "sweeps",
        "stripped_fixtures": {
            # notebooks whose fixtures are stripped from the mount: no
            # published-record parity possible, but each workload runs
            # end to end on a synthetic regeneration (tools/
            # make_fixtures.py) with golden/physics oracles of its own
            "atmos3D.nc (NB02b/NB03/NB11)": [
                "tests/test_omega3d.py (golden extrema + linearity)",
                "tests/test_geopotential.py (icbc superposition)",
                "examples/04_omega_equation_3d.py",
                "examples/08_balanced_mass.py"],
            "Barotropic2D.nc (NB05)": [
                "tests/test_1d.py (RefStateSWM nonlinear outer loop)",
                "examples/11_reference_swm.py"],
            "SODA_curl.nc (NB09b)": [
                "tests/test_ocean_workloads.py",
                "examples/12_ocean3d_wideflat.py"],
            "Helmholtz_ocean.nc (NB01b)": [
                "tests/test_ocean_masked.py (masked global Poisson)",
                "examples/01_poisson_streamfunction.py"],
        },
        "rows": rows,
    }
    with open(os.path.join(os.path.dirname(__file__), "..", "E2E.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote E2E.json,", len(rows), "rows")


if __name__ == "__main__":
    main()
