# -*- coding: utf-8 -*-
"""Coarse-to-fine multigrid cascade (the reference's invert_MultiGrid intent,
apps.py:1061-1135, made functional)."""
import numpy as np

from xinvert_tpu import open_dataset, invert_Poisson, invert_MultiGrid


def test_multigrid_poisson(data_dir):
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    vor = ds.vor.isel(time=0)

    iParams = {"BCs": ["fixed", "fixed"], "tolerance": 1e-11,
               "printInfo": False}

    direct = invert_Poisson(vor, dims=["lat", "lon"], iParams=iParams)
    mg = invert_MultiGrid(invert_Poisson, vor, dims=["lat", "lon"],
                          ratios=(4, 2, 1), iParams=iParams)

    assert mg.shape == direct.shape
    scale = np.abs(direct.values).max()
    assert np.abs(mg.values - direct.values).max() < 1e-3 * scale
