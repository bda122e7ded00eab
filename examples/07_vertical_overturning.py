# -*- coding: utf-8 -*-
"""Vertical-plane Poisson: meridional overturning streamfunction from the
zonal-mean meridional/vertical winds (reference notebook 02, ZonalMean.nc)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import xinvert_tpu as xv

zm = xv.open_dataset("/root/reference/Data/ZonalMean.nc")

# pseudo-vorticity of the (v, w) overturning in the (LEV, lat) plane
fd = xv.FiniteDiff({"Z": "LEV", "Y": "lat"},
                   BCs={"Z": "extend", "Y": "extend"}, coords="cartesian")
dv_dz = xv.deriv(zm.vm, dim="LEV")
vor = dv_dz - xv.deriv(zm.wm, dim="lat")

iParams = {"BCs": ["fixed", "fixed"], "mxLoop": 5000, "tolerance": 1e-11}
sf = xv.invert_Poisson(vor, dims=["LEV", "lat"], coords="z-lat",
                       iParams=iParams)
print("overturning streamfunction range:", float(sf.min()), float(sf.max()))
