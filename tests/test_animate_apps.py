# -*- coding: utf-8 -*-
"""animate_iteration across the dispatchable app names (the reference's
name->solver table, apps.py:944-1006)."""
import numpy as np
import pytest

from xinvert_tpu import Field, animate_iteration


def _latlon(ny=37, nx=72):
    lat = np.linspace(-88, 88, ny)
    lon = np.linspace(0, 355, nx)
    L, Lo = np.meshgrid(np.deg2rad(lat), np.deg2rad(lon), indexing="ij")
    return lat, lon, L, Lo


def test_animate_stommel():
    lat, lon, L, Lo = _latlon()
    curl = Field(1e-7 * np.sin(2 * L) * np.cos(3 * Lo),
                 ("lat", "lon"), {"lat": lat, "lon": lon})
    traj = animate_iteration("Stommel", curl, dims=["lat", "lon"],
                             iParams={"BCs": ["fixed", "periodic"],
                                      "optArg": 1.4, "printInfo": False},
                             mParams={"R": 2e-4, "D": 100},
                             loop_per_frame=3, max_frames=4)
    assert traj.dims == ("iter", "lat", "lon")
    assert traj.shape[0] == 4
    assert np.isfinite(traj.values).all()


def test_animate_gillmatsuno():
    lat, lon, L, Lo = _latlon()
    Q = Field(0.05 * np.exp(-(np.rad2deg(L) ** 2 +
                              (np.rad2deg(Lo) - 120) ** 2) / 100.0),
              ("lat", "lon"), {"lat": lat, "lon": lon})
    traj = animate_iteration("GillMatsuno", Q, dims=["lat", "lon"],
                             iParams={"BCs": ["fixed", "periodic"],
                                      "optArg": 1.4, "printInfo": False},
                             mParams={"epsilon": 1e-5, "Phi": 5000},
                             loop_per_frame=5, max_frames=3)
    assert traj.shape[0] == 3
    assert np.isfinite(traj.values).all()


def test_animate_unknown_name():
    lat, lon, L, Lo = _latlon()
    f = Field(np.zeros((37, 72)), ("lat", "lon"), {"lat": lat, "lon": lon})
    with pytest.raises(ValueError):
        animate_iteration("NotAProblem", f, dims=["lat", "lon"])
