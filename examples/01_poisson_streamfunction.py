# -*- coding: utf-8 -*-
"""Horizontal Poisson inversion: streamfunction and velocity potential from
vorticity/divergence (reference notebook 01_Poisson_equation_horizontal)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import xinvert_tpu as xv

ds = xv.open_dataset("/root/reference/Data/Helmholtz_atmos.nc")

iParams = {"BCs": ["extend", "periodic"], "undef": np.nan,
           "mxLoop": 5000, "tolerance": 1e-11}

sf = xv.invert_Poisson(ds.vor, dims=["lat", "lon"], iParams=iParams)
vp = xv.invert_Poisson(ds.div, dims=["lat", "lon"], iParams=iParams)

u_rot, v_rot = xv.cal_flow(sf, dims=["lat", "lon"], BCs=iParams["BCs"],
                           vtype="streamfunction")
u_div, v_div = xv.cal_flow(vp, dims=["lat", "lon"], BCs=iParams["BCs"],
                           vtype="velocitypotential")

print("streamfunction range:", float(sf.min()), float(sf.max()))
print("velocity potential range:", float(vp.min()), float(vp.max()))

# verification round-trip: rotational flow is non-divergent
fd = xv.FiniteDiff({"X": "lon", "Y": "lat", "T": "time"},
                   BCs={"X": "periodic", "Y": "extend"}, coords="lat-lon")
div0 = fd.divg((u_rot, v_rot), ["X", "Y"])
print("max |div(rotational flow)| =", float(abs(div0).max()))
