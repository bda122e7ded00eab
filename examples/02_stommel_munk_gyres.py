# -*- coding: utf-8 -*-
"""Wind-driven gyres: Stommel (Rayleigh friction) and Munk (biharmonic
viscosity) western boundary currents (reference notebooks 06/08)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from xinvert_tpu import Field, invert_Stommel, invert_StommelMunk, cal_flow

xnum, ynum = 201, 151
Lx, Ly = 1e7, 2 * np.pi * 1e6
x = np.linspace(0, Lx, xnum)
y = np.linspace(0, Ly, ynum)
Y = np.broadcast_to(y[:, None], (ynum, xnum))
curl_tau = Field(-0.3 * np.sin(np.pi * Y / Ly) * np.pi / Ly,
                 ("ydef", "xdef"), {"ydef": y, "xdef": x})

iParams = {"BCs": ["fixed", "fixed"], "mxLoop": 8000, "optArg": 1.0,
           "tolerance": 1e-13}

stommel = invert_Stommel(curl_tau, dims=["ydef", "xdef"], coords="cartesian",
                         iParams={**iParams, "optArg": 1.9},
                         mParams={"beta": 1.8e-11, "R": 8e-4, "D": 200})
munk = invert_StommelMunk(curl_tau, dims=["ydef", "xdef"], coords="cartesian",
                          iParams=iParams,
                          mParams={"A4": 5e3, "beta": 1.8e-11, "R": 1e-4,
                                   "D": 200})

for name, h in (("Stommel", stommel), ("Munk", munk)):
    u, v = cal_flow(h, dims=["ydef", "xdef"], coords="cartesian")
    jwb = np.unravel_index(np.nanargmax(np.abs(v.values)), v.shape)[1]
    print(f"{name}: psi range [{float(h.min()):.3e}, {float(h.max()):.3e}], "
          f"boundary-current max at x = {x[jwb]/1e3:.0f} km (western edge)")
