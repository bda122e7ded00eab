# -*- coding: utf-8 -*-
"""NetCDF-4 (HDF5) reader built on h5py, returning :class:`~xinvert_tpu.field.Field`.

The reference test-suite loads fixtures with ``xarray.open_dataset`` (e.g.
/root/reference/tests/test_Poisson.py).  Neither xarray nor netCDF4 is
available in this environment, but h5py is, and NetCDF-4 files are HDF5 files
following the dimension-scale convention.  This module implements the small
subset needed to read those fixtures.
"""
from __future__ import annotations

import numpy as np

from .field import Field

__all__ = ["open_dataset", "Dataset"]


class Dataset(dict):
    """A dict of Fields with attribute access (ds.vor / ds['vor'])."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    @property
    def dims(self):
        out = {}
        for f in self.values():
            for d, n in zip(f.dims, f.shape):
                out[d] = n
        return out


def _dim_names(dset, fallback_prefix="phony_dim"):
    """Resolve the named dimensions of an HDF5 dataset (netCDF4 convention)."""
    names = []
    if "DIMENSION_LIST" in dset.attrs:
        f = dset.file
        for i, refs in enumerate(dset.attrs["DIMENSION_LIST"]):
            if len(refs):
                scale = f[refs[0]]
                names.append(scale.name.lstrip("/"))
            else:
                names.append(f"{fallback_prefix}_{i}")
    else:
        names = [f"{fallback_prefix}_{i}" for i in range(dset.ndim)]
    return names


def open_dataset(path):
    """Read a NetCDF-4/HDF5 file into a Dataset of Fields (eager, float64)."""
    import h5py

    ds = Dataset()
    with h5py.File(path, "r") as f:
        coord_vars = {}
        data_vars = {}
        for name, obj in f.items():
            if not isinstance(obj, h5py.Dataset):
                continue
            is_scale = "CLASS" in obj.attrs and obj.attrs["CLASS"] == b"DIMENSION_SCALE"
            if is_scale:
                coord_vars[name] = np.asarray(obj[...])
            else:
                data_vars[name] = (_dim_names(obj), _read_values(obj))
        # coordinate variables that are also data (e.g. 2-D coords) are rare in
        # the fixtures; treat every scale as a 1-D coord.
        for name, (dims, vals) in data_vars.items():
            coords = {d: coord_vars[d] for d in dims if d in coord_vars}
            ds[name] = Field(vals, dims, coords, name=name)
        for name, vals in coord_vars.items():
            if name not in ds and vals.ndim == 1:
                ds[name] = Field(vals, (name,), {name: vals}, name=name)
    return ds


def _read_values(obj):
    vals = np.asarray(obj[...])
    # apply netCDF attribute conventions
    if vals.dtype.kind in "iuf":
        vals = vals.astype(np.float64)
        fill = obj.attrs.get("_FillValue", None)
        if fill is not None:
            vals = np.where(vals == np.asarray(fill, dtype=vals.dtype), np.nan, vals)
        miss = obj.attrs.get("missing_value", None)
        if miss is not None:
            vals = np.where(vals == np.asarray(miss, dtype=vals.dtype), np.nan, vals)
        scale = obj.attrs.get("scale_factor", None)
        offset = obj.attrs.get("add_offset", None)
        if scale is not None:
            vals = vals * np.asarray(scale, dtype=np.float64)
        if offset is not None:
            vals = vals + np.asarray(offset, dtype=np.float64)
    return vals
