# -*- coding: utf-8 -*-
"""Stommel-Arons abyssal circulation from deep-water mass sources
(reference notebook 08, synthetic sources on the masked-ocean fixture)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import xinvert_tpu as xv

if not os.path.exists("Data/ocean_masked.nc"):
    os.system("python tools/make_fixtures.py")
ds = xv.open_dataset("Data/ocean_masked.nc")
lat = ds.mask.coords["lat"]
lon = ds.mask.coords["lon"]
L, Lo = np.meshgrid(lat, lon, indexing="ij")

# deep sources in the North Atlantic and Ross Sea, uniform upwelling sink
msrc = (-1e-3 * np.exp(-((L - 63) ** 2 / 30 + (Lo - 330) ** 2 / 120))
        - 1e-3 * np.exp(-((L + 70) ** 2 / 30 + (Lo - 189) ** 2 / 120)))
ocean = ds.mask.values > 0.5
area = np.cos(np.deg2rad(L))
msrc = msrc - (msrc * area)[ocean].sum() / area[ocean].sum()
msrc = np.where(ocean, msrc, np.nan)
Q = xv.Field(msrc, ("lat", "lon"), {"lat": lat, "lon": lon})

h = xv.invert_StommelArons(
    Q, dims=["lat", "lon"],
    iParams={"BCs": ["extend", "periodic"], "mxLoop": 3000,
             "optArg": 1.4, "tolerance": 1e-10, "undef": np.nan},
    mParams={"f0": 1e-5, "beta": 2e-11, "epsilon": 1e-5})
print("abyssal pressure-like field range:",
      float(np.nanmin(h.values)), float(np.nanmax(h.values)))
