# -*- coding: utf-8 -*-
"""Inviscid free modes: Fofonoff flow, and Bretherton-Haidvogel flow over
topography (reference notebooks 09/10)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import xinvert_tpu as xv

# Fofonoff free mode on a closed cartesian basin
xc = np.linspace(0, 600000, 301)
yc = np.linspace(0, 500000, 251)
F = xv.Field(np.broadcast_to(yc[:, None] - xc[None, :], (251, 301)),
             ("y", "x"), {"y": yc, "x": xc})
sf = xv.invert_Fofonoff(F, dims=["y", "x"], coords="cartesian",
                        iParams={"BCs": ["fixed", "fixed"], "mxLoop": 2000,
                                 "tolerance": 1e-14, "optArg": 1.2},
                        mParams={"f0": 1e-4, "beta": 2e-11,
                                 "c0": 8e-9, "c1": 1e-4})
print("Fofonoff psi range:", float(sf.min()), float(sf.max()))

# Bretherton-Haidvogel over real topography
topo = xv.open_dataset("/root/reference/Data/topo.nc").topo
topo = topo - topo.mean()
S = xv.invert_BrethertonHaidvogel(
    topo, dims=["y", "x"], coords="cartesian",
    iParams={"BCs": ["fixed", "fixed"], "mxLoop": 3000,
             "tolerance": 1e-16, "undef": np.nan},
    mParams={"f0": 1e-4, "D": 1000, "lambda": 1e-15})
u, v = xv.cal_flow(S, dims=["y", "x"], coords="cartesian")
KE = float(((u ** 2 + v ** 2) / 2).sum())
print("Bretherton KE:", KE, "(reference golden: 0.0812731)")
