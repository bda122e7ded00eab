# -*- coding: utf-8 -*-
"""Bretherton-Haidvogel flow over topography — golden KE regression
(reference tests/test_Bretherton.py:14-41, KE == 0.0812731)."""
import numpy as np

from xinvert_tpu import open_dataset, invert_BrethertonHaidvogel, cal_flow


def test_bretherton_topo(data_dir):
    topo = open_dataset(f"{data_dir}/topo.nc").topo
    topo = topo - topo.mean()

    assert topo.dims == ("y", "x")
    assert topo.shape == (201, 301)

    iParams = {
        "BCs": ["fixed", "fixed"],
        "mxLoop": 3000,
        "tolerance": 1e-16,
        "undef": np.nan,
        "printInfo": False,
    }
    mParams = {"f0": 1e-4, "D": 1000, "lambda": 1e-15}

    S1 = invert_BrethertonHaidvogel(topo, dims=["y", "x"], coords="cartesian",
                                    mParams=mParams, iParams=iParams)
    u1, v1 = cal_flow(S1, dims=["y", "x"], coords="cartesian")

    assert topo.dims == S1.dims == u1.dims
    assert topo.shape == S1.shape == u1.shape

    KE = (u1 ** 2 + v1 ** 2).sum() / 2
    assert np.isclose(float(KE), 0.0812731, rtol=1e-4)
