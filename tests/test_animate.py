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


def test_animate_lexico_is_reference_trajectory(data_dir):
    """scheme='lexico' frames are the reference's EXACT iterate sequence:
    frame k equals solve_fixed_lexicographic after k*loop_per_frame
    sweeps on the same compiled problem."""
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    vor = ds.vor.isel(time=0)
    iParams = {"BCs": ["fixed", "periodic"], "printInfo": False,
               "scheme": "lexico"}
    traj = animate_iteration("Poisson", vor, dims=["lat", "lon"],
                             iParams=iParams, loop_per_frame=3,
                             max_frames=3)
    # frame 3 == 9 checked lexico sweeps through the public API (rtol
    # covers the one-ulp FMA-contraction slack between separately
    # compiled XLA programs, cf. tests/test_fuzz_kernels.py)
    ref = invert_Poisson(vor, dims=["lat", "lon"],
                         iParams={**iParams, "mxLoop": 9, "tolerance": 0.0})
    assert np.allclose(traj.values[-1], ref.values, equal_nan=True,
                       rtol=1e-12, atol=0)
    # and the trajectory differs from the red-black transient
    traj_rb = animate_iteration("Poisson", vor, dims=["lat", "lon"],
                                iParams={"BCs": ["fixed", "periodic"],
                                         "printInfo": False},
                                loop_per_frame=3, max_frames=3)
    assert not np.allclose(traj.values[0], traj_rb.values[0],
                           equal_nan=True)


def test_animate_rejects_direct_scheme(data_dir):
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    with pytest.raises(ValueError, match="trajectory"):
        animate_iteration("Poisson", ds.vor.isel(time=0),
                          dims=["lat", "lon"],
                          iParams={"BCs": ["fixed", "periodic"],
                                   "scheme": "direct"})


def test_animate_cheby_trajectory(data_dir):
    """scheme='cheby' frames: the (m, w) Chebyshev factor recurrence rides
    the scan carry — frame k equals a direct solve_fixed_cheby run of
    k*loop_per_frame sweeps."""
    import jax.numpy as jnp
    from xinvert_tpu.solver import solve_fixed_cheby

    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    vor = ds.vor.isel(time=0)
    traj = animate_iteration("Poisson", vor, dims=["lat", "lon"],
                             iParams={"BCs": ["fixed", "periodic"],
                                      "printInfo": False,
                                      "scheme": "cheby"},
                             loop_per_frame=4, max_frames=3)
    assert np.isfinite(traj.values).all()
    # converging trajectory, distinct from constant-omega SOR frames
    d0 = np.abs(traj.values[1] - traj.values[0]).mean()
    d1 = np.abs(traj.values[2] - traj.values[1]).mean()
    assert d1 < d0
    traj_sor = animate_iteration("Poisson", vor, dims=["lat", "lon"],
                                 iParams={"BCs": ["fixed", "periodic"],
                                          "printInfo": False},
                                 loop_per_frame=4, max_frames=3)
    assert not np.allclose(traj.values[0], traj_sor.values[0])
