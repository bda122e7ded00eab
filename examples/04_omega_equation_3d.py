# -*- coding: utf-8 -*-
"""3-D QG-omega inversion: vertical motion from synoptic forcing with a
stratification profile (reference notebook 11)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os
import numpy as np
import xinvert_tpu as xv

if not os.path.exists("Data/atmos3d_like.nc"):
    os.system("python tools/make_fixtures.py")
ds = xv.open_dataset("Data/atmos3d_like.nc")

iParams = {"BCs": ["fixed", "fixed", "periodic"], "tolerance": 1e-12,
           "mxLoop": 1000}

W = xv.invert_omega(ds.F, dims=["LEV", "lat", "lon"], iParams=iParams,
                    mParams={"N2": ds.N2prof})
print("omega range:", float(W.min()), float(W.max()))

# with a topographic lower boundary (warm start / inhomogeneous Dirichlet)
Wt = xv.invert_omega(ds.F, dims=["LEV", "lat", "lon"], icbc=ds.WBC,
                     iParams=iParams, mParams={"N2": ds.N2prof})
print("with boundary forcing:", float(Wt.min()), float(Wt.max()))
