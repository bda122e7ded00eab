# -*- coding: utf-8 -*-
"""API semantics parity details: icbc output masking (apps.py:1389-1392)
and multiple non-core (batch) dims through one vectorised solve."""
import numpy as np

from xinvert_tpu import Field, invert_Poisson


def _masked_vor(extra_dims=()):
    ny, nx = 24, 32
    lat = np.linspace(-60, 60, ny)
    lon = np.linspace(0, 360 - 360 / nx, nx)
    rng = np.random.default_rng(0)
    shape = tuple(3 for _ in extra_dims) + (ny, nx)
    vor = rng.normal(0, 1e-5, shape)
    vor[..., 8:12, 10:20] = np.nan
    dims = tuple(extra_dims) + ("lat", "lon")
    coords = {"lat": lat, "lon": lon}
    for d in extra_dims:
        coords[d] = np.arange(3.0)
    return Field(vor, dims, coords)


IP = {"BCs": ["fixed", "periodic"], "undef": np.nan, "mxLoop": 2000,
      "tolerance": 1e-10, "printInfo": False}


def test_icbc_output_not_remasked():
    """Without icbc, undef cells return undef; WITH icbc the result is not
    re-masked — masked cells carry the icbc values (apps.py:1389-1392)."""
    vor = _masked_vor()
    plain = invert_Poisson(vor, dims=["lat", "lon"], iParams=IP)
    assert np.isnan(plain.values[8:12, 10:20]).all()

    ic = Field(np.full(vor.shape, 7.5), vor.dims, vor.coords)
    with_ic = invert_Poisson(vor, dims=["lat", "lon"], icbc=ic, iParams=IP)
    assert np.allclose(with_ic.values[8:12, 10:20], 7.5)
    assert np.isfinite(with_ic.values).all()


def test_two_noncore_dims_batch():
    """time x member batch dims solve in one program; each slice matches its
    individual solve."""
    vor = _masked_vor(("time", "member"))
    batch = invert_Poisson(vor, dims=["lat", "lon"], iParams=IP)
    assert batch.dims == vor.dims and batch.shape == vor.shape

    single = invert_Poisson(
        Field(vor.values[1, 2], ("lat", "lon"),
              {"lat": vor.coords["lat"], "lon": vor.coords["lon"]}),
        dims=["lat", "lon"], iParams=IP)
    a = batch.values[1, 2]
    b = single.values
    mask = np.isfinite(b)
    scale = np.abs(b[mask]).max()
    assert np.abs(a[mask] - b[mask]).max() < 1e-6 * scale


def test_batch_varying_mask():
    """A mask that differs across batch slices keeps per-slice weights:
    each slice's undef cells return undef and its ocean solves cleanly."""
    ny, nx = 20, 24
    lat = np.linspace(-60, 60, ny)
    lon = np.linspace(0, 360 - 360 / nx, nx)
    rng = np.random.default_rng(1)
    vor = rng.normal(0, 1e-5, (2, ny, nx))
    vor[0, 5:9, 4:10] = np.nan          # slice-0 land
    vor[1, 12:16, 14:20] = np.nan       # different slice-1 land
    f = Field(vor, ("time", "lat", "lon"),
              {"time": np.arange(2.0), "lat": lat, "lon": lon})
    out = invert_Poisson(f, dims=["lat", "lon"], iParams=IP)
    assert np.isnan(out.values[0, 5:9, 4:10]).all()
    assert np.isfinite(out.values[0, 12:16, 14:20]).all()
    assert np.isnan(out.values[1, 12:16, 14:20]).all()
    assert np.isfinite(out.values[1, 5:9, 4:10]).all()

    # each slice matches its standalone solve
    single = invert_Poisson(
        Field(vor[1], ("lat", "lon"), {"lat": lat, "lon": lon}),
        dims=["lat", "lon"], iParams=IP)
    m = np.isfinite(single.values)
    scale = np.abs(single.values[m]).max()
    assert np.abs(out.values[1][m] - single.values[m]).max() < 1e-6 * scale


def test_xarray_duck_type_input():
    """A duck-typed xarray.DataArray-like object goes straight into the
    public API (the reference's front end is xarray; ours accepts it
    without depending on it)."""
    ny, nx = 16, 24

    class _V:
        def __init__(self, v):
            self.values = v

    class FakeDataArray:
        dims = ("lat", "lon")
        values = np.random.default_rng(0).normal(0, 1e-5, (ny, nx))
        name = "vor"
        coords = {"lat": _V(np.linspace(-60, 60, ny)),
                  "lon": _V(np.linspace(0, 345, nx))}

    out = invert_Poisson(FakeDataArray(), dims=["lat", "lon"], iParams=IP)
    assert out.dims == ("lat", "lon")
    assert np.isfinite(out.values).all()
