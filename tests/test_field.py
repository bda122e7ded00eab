# -*- coding: utf-8 -*-
"""Unit tests for the Field container (the xarray-alike API edge)."""
import numpy as np
import pytest

from xinvert_tpu import Field, as_field, concat


def _f(shape=(3, 4), dims=("lat", "lon")):
    coords = {d: np.arange(n, dtype=float) for d, n in zip(dims, shape)}
    return Field(np.arange(np.prod(shape), dtype=float).reshape(shape),
                 dims, coords, name="t")


def test_broadcast_by_name():
    a = _f()
    b = Field(np.arange(4.0), ("lon",), {"lon": np.arange(4.0)})
    c = a + b
    assert c.dims == ("lat", "lon")
    assert np.allclose(c.values, a.values + b.values[None, :])
    # reversed order broadcasts by NAME, not position
    d = b * a
    assert d.dims == ("lon", "lat") or d.dims == ("lat", "lon")
    assert np.allclose(np.sort(d.values.ravel()),
                       np.sort((a.values * b.values[None, :]).ravel()))


def test_sel_isel_transpose():
    a = _f()
    assert a.isel({"lat": 1}).dims == ("lon",)
    assert a.sel({"lat": 1.4}).values.tolist() == a.isel({"lat": 1}).values.tolist()
    t = a.transpose("lon", "lat")
    assert t.shape == (4, 3)
    assert np.allclose(t.values, a.values.T)
    sl = a.sel({"lon": slice(1, 2)})
    assert sl.shape == (3, 2)


def test_shift_diff_differentiate():
    a = _f()
    s = a.shift({"lon": 1})
    assert np.isnan(s.values[:, 0]).all()
    assert np.allclose(s.values[:, 1:], a.values[:, :-1])
    d = a.diff("lon")
    assert d.shape == (3, 3)
    g = a.differentiate("lon")
    assert np.allclose(g.values, 1.0)


def test_pad_coord_extrapolation():
    a = _f()
    p = a.pad({"lat": (1, 2)}, mode="edge")
    assert p.shape == (6, 4)
    assert np.allclose(p.coords["lat"], [-1, 0, 1, 2, 3, 4])


def test_where_fillna_reduce():
    a = _f()
    m = a.where(a > 5.0)
    assert np.isnan(m.values).sum() == 6
    assert m.fillna(-1.0).values.min() == -1.0
    assert float(a.mean()) == a.values.mean()
    assert a.sum("lat").dims == ("lon",)


def test_as_field_duck_type():
    class FakeXr:
        dims = ("y", "x")
        values = np.ones((2, 3))

        class _C(dict):
            pass
        coords = _C()
        name = "fake"
    fx = FakeXr()

    class _V:
        def __init__(self, v):
            self.values = v
    fx.coords["y"] = _V(np.arange(2.0))
    f = as_field(fx)
    assert f.dims == ("y", "x")
    assert np.allclose(f.coords["y"], [0, 1])


def test_concat_new_dim():
    a = _f()
    c = concat([a, a], "time", coord=[0.0, 1.0])
    assert c.dims == ("time", "lat", "lon")
    assert c.shape == (2, 3, 4)
    assert np.allclose(c.coords["time"], [0.0, 1.0])


def test_shape_validation():
    with pytest.raises(ValueError):
        Field(np.zeros((2, 3)), ("a",))
    with pytest.raises(ValueError):
        Field(np.zeros((2, 3)), ("a", "b"), {"a": np.arange(5.0)})
