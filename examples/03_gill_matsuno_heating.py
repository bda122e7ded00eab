# -*- coding: utf-8 -*-
"""Gill-Matsuno response to tropical heating: equatorial Kelvin/Rossby wave
mass and wind pattern (reference notebook 07)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from xinvert_tpu import Field, invert_GillMatsuno, cal_flow

lon = np.linspace(0, 360, 144)
lat = np.linspace(-90, 90, 73)
L, Lo = np.meshgrid(lat, lon, indexing="ij")
Q = Field(0.05 * np.exp(-((L - 0) ** 2 + (Lo - 120) ** 2) / 100.0),
          ("lat", "lon"), {"lat": lat, "lon": lon})

iParams = {"BCs": ["fixed", "periodic"], "mxLoop": 2000,
           "tolerance": 1e-8, "optArg": 1.4}
mParams = {"epsilon": 1e-5, "Phi": 5000}

h = invert_GillMatsuno(Q, dims=["lat", "lon"], iParams=iParams,
                       mParams=mParams)
u, v = cal_flow(h, dims=["lat", "lon"], BCs=["fixed", "periodic"],
                mParams=mParams, vtype="GillMatsuno")

print("geopotential response range:", float(h.min()), float(h.max()))
print("KE sum:", float(((u ** 2 + v ** 2) / 2).sum()))
# the low sits west of the heating (Rossby response)
jmin = np.unravel_index(np.argmin(h.values), h.shape)
print("minimum at lat=%.1f lon=%.1f (heating at 0, 120)" %
      (lat[jmin[0]], lon[jmin[1]]))
