# -*- coding: utf-8 -*-
"""Solution-trajectory snapshots (reference tests/test_AnimateConverge.py)."""
import numpy as np
import pytest

from xinvert_tpu import open_dataset, animate_iteration, invert_Poisson


def test_animate(data_dir):
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    vor = ds.vor.isel(time=0).rename("vorticity")
    assert vor.dims == ("lat", "lon")

    iParams = {"BCs": ["fixed", "periodic"], "printInfo": False}
    sf = animate_iteration("Poisson", vor, dims=["lat", "lon"],
                           iParams=iParams, loop_per_frame=1, max_frames=40)

    assert sf.dims == ("iter", "lat", "lon")
    assert len(sf.coords["iter"]) == 40
    assert sf.coords["iter"][0] == 1
    assert sf.coords["iter"][-1] == 40

    # frames form a convergent warm-restarted trajectory: the change between
    # consecutive frames decreases
    d_first = np.abs(sf.values[1] - sf.values[0]).mean()
    d_last = np.abs(sf.values[-1] - sf.values[-2]).mean()
    assert d_last < d_first


def test_animate_matches_direct_solve(data_dir):
    """Frame k equals a direct fixed-iteration solve of k sweeps."""
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    vor = ds.vor.isel(time=0)
    iParams = {"BCs": ["fixed", "periodic"], "printInfo": False}
    traj = animate_iteration("Poisson", vor, dims=["lat", "lon"],
                             iParams=iParams, loop_per_frame=5, max_frames=4)
    direct = invert_Poisson(vor, dims=["lat", "lon"],
                            iParams={**iParams, "mxLoop": 20,
                                     "tolerance": 0.0})
    assert np.allclose(traj.values[-1], direct.values, equal_nan=True)

    with pytest.raises(ValueError):
        animate_iteration("Poisson", ds.vor, dims=["lat", "lon"],
                          iParams=iParams)   # non-core dims not allowed
