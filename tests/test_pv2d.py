# -*- coding: utf-8 -*-
"""QG PV inversion in a vertical plane (reference tests/test_QGPV.py,
synthetic background replacing the missing atmos3D.nc)."""
import numpy as np

from xinvert_tpu import Field, invert_PV2D


def test_invert_PV2D():
    zc, yc = 73, 201
    zdef = np.linspace(100000, 10000, zc)
    ydef = np.linspace(-1000000, 1000000, yc)

    f = 2 * 7.292e-5 * np.sin(np.deg2rad(40))
    # piecewise stratification: troposphere 1e-5, stratosphere 6e-5
    S = np.full(zc, 1e-5)
    S[56:] = 6e-5
    SF = Field(S, ("LEV",), {"LEV": zdef})

    # localized positive PV anomaly near the tropopause
    amplit = 1 * np.exp(-ydef ** 2 / 1e11)
    zscale = 5e7 + np.exp(-ydef ** 2 / 2e11) * 3e7
    zcent = 30000 + np.exp(-ydef ** 2 / 1e11) * 10000
    q = np.exp(-(zdef[:, None] - zcent[None, :]) ** 2 / zscale[None, :]) \
        * amplit[None, :]
    qF = Field(q, ("LEV", "Y"), {"LEV": zdef, "Y": ydef})

    iParams = {"BCs": ["fixed", "extend"], "tolerance": 1e-12,
               "printInfo": False}
    mParams = {"f0": f, "beta": 0, "N2": SF}

    Ha = invert_PV2D(qF, dims=["LEV", "Y"], coords="cartesian",
                     iParams=iParams, mParams=mParams)

    assert Ha.dims == qF.dims and Ha.shape == qF.shape
    v = Ha.values
    assert np.isfinite(v).all()
    # positive PV anomaly (f>0) -> negative geopotential anomaly everywhere
    assert float(Ha.max()) <= 1e-8
    assert float(Ha.min()) < 0
    # response is centred on the anomaly in y
    jmin = np.unravel_index(np.argmin(v), v.shape)[1]
    assert abs(jmin - yc // 2) <= 5
