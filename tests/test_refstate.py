# -*- coding: utf-8 -*-
"""App-level balanced-symmetric-vortex PV inversion (invert_RefState,
reference apps.py:104-145).  The reference ships no scenario test for this
app (only notebook usage); this exercises the cartesian (theta, r) form on a
warm-core PV tower with frozen goldens (f64 CPU, round 2) plus physical
structure checks."""
import numpy as np

from xinvert_tpu import invert_RefState, Field
from xinvert_tpu.models import api


def _vortex_problem():
    nt, nr = 41, 81
    theta = np.linspace(300.0, 380.0, nt)
    r = np.linspace(10e3, 810e3, nr)
    Q = 1e-6 + 4e-6 * np.exp(-(r[None, :] / 150e3) ** 2) \
        * np.exp(-((theta[:, None] - 330.0) / 25.0) ** 2)
    F = Field(Q, ("theta", "r"), {"theta": theta, "r": r})
    return F, theta, r


def test_refstate_warm_core_vortex():
    F, theta, r = _vortex_problem()
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 5000, "tolerance": 1e-13,
          "optArg": 1.4, "printInfo": False}
    sol = invert_RefState(F, dims=["theta", "r"], coords="cartesian",
                          iParams=iP, mParams={"Ang0": 2e5, "Gamma": 1e-6})
    assert sol.dims == F.dims and sol.shape == F.shape

    res = api.LAST_SOLVE
    assert int(res.iters) < 5000, "hit the sweep cap"
    assert float(res.rel_change) < 1e-13
    assert not bool(np.any(np.asarray(res.overflow)))

    v = sol.values
    assert np.isfinite(v).all()
    # frozen goldens
    assert np.isclose(v.min(), -4.24662723e8, rtol=1e-6)
    assert v.max() == 0.0                     # fixed zero boundary extremal
    assert np.isclose(np.abs(v).mean(), 1.10623082e8, rtol=1e-6)

    # physics: the response is single-signed (<= 0 with this forcing sign)
    # and its extremum sits in the interior, not on a boundary
    assert (v <= 0).all()
    kt, kr = np.unravel_index(np.argmax(np.abs(v)), v.shape)
    assert 0 < kt < v.shape[0] - 1 and 0 < kr < v.shape[1] - 1
    assert 310.0 < theta[kt] < 350.0


def test_refstate_icbc_warm_restart():
    """Checkpoint/resume semantics at app level: with the warmStart
    extension, restarting from the converged solution terminates in a
    handful of sweeps with the same field.  (The reference's icbc keeps
    values only on edges/undef cells, apps.py:2144-2156 — replicated by
    default — so the reference-parity path cannot warm start.)"""
    F, theta, r = _vortex_problem()
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 5000, "tolerance": 1e-12,
          "optArg": 1.4, "printInfo": False}
    mP = {"Ang0": 2e5, "Gamma": 1e-6}
    a = invert_RefState(F, dims=["theta", "r"], coords="cartesian",
                        iParams=iP, mParams=mP)
    cold_iters = int(api.LAST_SOLVE.iters)
    b = invert_RefState(F, dims=["theta", "r"], coords="cartesian", icbc=a,
                        iParams={**iP, "warmStart": True}, mParams=mP)
    warm_iters = int(api.LAST_SOLVE.iters)
    assert warm_iters < cold_iters / 20
    scale = np.abs(a.values).max()
    assert np.abs(b.values - a.values).max() < 1e-8 * scale
