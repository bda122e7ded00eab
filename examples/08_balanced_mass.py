# -*- coding: utf-8 -*-
"""Balanced mass field: invert the geostrophic relation for the
streamfunction given the Laplacian of geopotential (reference notebook 03)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import xinvert_tpu as xv

ds = xv.open_dataset("/root/reference/Data/Helmholtz_atmos.nc")
# the geostrophic operator degenerates where f -> 0, so invert a
# midlatitude band (the reference gallery does the same)
sf_obs = ds.sf.isel(time=0).sel({"lat": slice(20, 70)})
fd = xv.FiniteDiff({"X": "lon", "Y": "lat"},
                   BCs={"X": "periodic", "Y": "extend"}, coords="lat-lon")
lap = fd.Laplacian(sf_obs, ["X", "Y"]).fillna(0.0)

iParams = {"BCs": ["fixed", "periodic"], "mxLoop": 5000, "tolerance": 1e-11}
psi = xv.invert_geostrophic(lap, dims=["lat", "lon"], iParams=iParams)
print("balanced streamfunction range:", float(psi.min()), float(psi.max()))
