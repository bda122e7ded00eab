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

    # quantitative regression (reference behavior: 1,174 lexicographic
    # sweeps -> 9.4e-15, BASELINE.md row 7; red-black lands in the same
    # family).  Goldens frozen from the f64 CPU run (round 2).
    from xinvert_tpu.models import api
    r = api.LAST_SOLVE
    assert 1000 <= int(r.iters) <= 1300, f"iters {int(r.iters)}"
    assert float(r.rel_change) < 1e-14
    assert np.isclose(sf.values.max(), 1.1156499141e3, rtol=1e-6)
    assert sf.values.min() == 0.0          # fixed zero boundary is extremal
