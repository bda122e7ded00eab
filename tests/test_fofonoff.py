# -*- coding: utf-8 -*-
"""Fofonoff free mode (reference tests/test_Fofonoff.py:14-44)."""
import numpy as np

from xinvert_tpu import Field, invert_Fofonoff


def test_fofonoff():
    xc = np.linspace(0, 600000, 301)
    yc = np.linspace(0, 500000, 251)
    F = Field(np.broadcast_to(yc[:, None] - xc[None, :], (251, 301)),
              ("y", "x"), {"y": yc, "x": xc})

    iParams = {
        "BCs": ["fixed", "fixed"],
        "mxLoop": 2000,
        "tolerance": 1e-14,
        "optArg": 1.2,
        "printInfo": False,
    }
    mParams = {"f0": 1e-4, "beta": 2e-11, "c0": 8e-9, "c1": 1e-4}

    sf = invert_Fofonoff(F, dims=["y", "x"], coords="cartesian",
                         iParams=iParams, mParams=mParams)

    assert sf.dims == F.dims
    assert sf.shape == F.shape
    assert np.isfinite(sf.values).all()
    # the forcing c1 - f changes sign at y where f = c1; interior circulation
    # must be non-trivial
    assert np.abs(sf.values).max() > 0
