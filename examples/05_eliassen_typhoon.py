# -*- coding: utf-8 -*-
"""Sawyer-Eliassen overturning circulation of a typhoon from observed
coefficient fields (reference notebook 04, Data/TC2D.nc)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import xinvert_tpu as xv

ds = xv.open_dataset("/root/reference/Data/TC2D.nc")
UNDEF = 9.99e20

A = ds.Aa.where(abs(ds.Aa) < UNDEF * 0.99)
B = ds.Bb.where(abs(ds.Bb) < UNDEF * 0.99)
C = ds.Cc.where(abs(ds.Cc) < UNDEF * 0.99)
F = ds.faf.where(abs(ds.faf) < UNDEF * 0.99)

iParams = {"BCs": ["fixed", "fixed"], "mxLoop": 600, "tolerance": 1e-12,
           "optArg": 1.4, "undef": np.nan}

sf = xv.invert_Eliassen(F, dims=["lev", "lat"], coords="z-lat",
                        iParams=iParams, mParams={"A": A, "B": B, "C": C})
good = np.isfinite(sf.values)
print("overturning streamfunction: %d/%d cells defined, range [%e, %e]" %
      (good.sum(), sf.values.size,
       np.nanmin(sf.values), np.nanmax(sf.values)))
