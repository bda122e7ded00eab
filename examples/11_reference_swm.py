# -*- coding: utf-8 -*-
"""Nonlinear shallow-water reference state: the outer fixed-point loop of
invert_RefStateSWM recovers the balanced height field from tabulated
M(Q)/C(Q) functionals (reference notebook 05_reference_SWM)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import subprocess

import numpy as np
import xinvert_tpu as xv

root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
fix = os.path.join(root, "Data", "barotropic2d_like.nc")
if not os.path.exists(fix):
    subprocess.run([sys.executable, os.path.join(root, "tools",
                                                 "make_fixtures.py")],
                   check=True, cwd=root)

b = xv.open_dataset(fix)
lat = b.href.coords["lat"]
ctr, Mass, Circ = b.PV.values, b.Mass.values, b.Circ.values


def getQC(Mv):
    """Tabulated PV and circulation as functionals of the mass coordinate."""
    Q = np.interp(Mv, Mass, ctr)
    Q[lat == 90] = ctr.max()
    return Q, np.interp(Q, ctr, Circ)


iParams = {"BCs": ["fixed"], "mxLoop": 5000, "tolerance": 1e-18,
           "undef": np.nan, "printInfo": False}

# initial guess: all mass spread as sin(lat); each outer iteration inverts
# the 1-D reference-state operator for the mass increment dM
Mref = Mass.max() * (np.sin(np.deg2rad(lat)) + 1.0) / 2.0
for it in range(5):
    Qref, Cref = getQC(Mref)
    mParams = {"M0": xv.Field(Mref, ("lat",), {"lat": lat}),
               "C0": xv.Field(Cref, ("lat",), {"lat": lat})}
    dM = xv.invert_RefStateSWM(xv.Field(Qref, ("lat",), {"lat": lat}),
                               dims=["lat"], iParams=iParams,
                               mParams=mParams)
    Mref = Mref + dM.values
    print(f"outer iter {it}: mean |dM| = {np.abs(dM.values).mean():.4e}")

# recover the height field from the converged mass coordinate
R = 6371200.0
r = R * np.cos(np.deg2rad(lat))
href = np.gradient(Mref, lat) / (2 * np.pi * r) / (R * np.deg2rad(1.0))
sl = slice(2, -7)
rel = np.nanmax(np.abs(href[sl] - b.href.values[sl])
                / np.abs(b.href.values[sl]))
print(f"max relative error vs balanced truth: {rel:.2e} "
      f"(reference notebook accepts 3e-2)")
