# -*- coding: utf-8 -*-
"""Regenerate the synthetic test fixtures under Data/.

The reference bundles NetCDF fixtures that are stripped from this mount
(Barotropic2D.nc, Helmholtz_ocean.nc, SODA.nc, SODA_curl.nc, atmos3D.nc —
see SURVEY.md §4.3).  This script synthesizes deterministic equivalents with
the same structural features the tests need: a global masked-ocean
vorticity/curl field with continent-like land masses, and a 3-D atmosphere
with a stratification profile for QG-omega.

Run: python tools/make_fixtures.py  (writes Data/*.nc at the repo root)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xinvert_tpu import Field, save_dataset  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "Data")


def _continent_mask(lat, lon, seed=7):
    """Smooth pseudo-continents covering ~30% of the sphere (True = land)."""
    rng = np.random.default_rng(seed)
    L, Lo = np.meshgrid(np.deg2rad(lat), np.deg2rad(lon), indexing="ij")
    field = np.zeros_like(L)
    for _ in range(6):
        lat0 = rng.uniform(-1.0, 1.0)
        lon0 = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.7, 1.3)
        sy = rng.uniform(0.25, 0.5)
        sx = rng.uniform(0.3, 0.9)
        dlon = np.angle(np.exp(1j * (Lo - lon0)))
        field += amp * np.exp(-((L - lat0) / sy) ** 2 - (dlon / sx) ** 2)
    thresh = np.quantile(field, 0.70)
    return field > thresh


def make_ocean(ny=180, nx=360):
    """Masked-ocean vorticity/curl fixture (SODA/Helmholtz_ocean analog)."""
    lat = np.linspace(-89.5, 89.5, ny)
    lon = np.linspace(0.0, 360.0 - 360.0 / nx, nx)
    land = _continent_mask(lat, lon)
    L, Lo = np.meshgrid(np.deg2rad(lat), np.deg2rad(lon), indexing="ij")

    rng = np.random.default_rng(1)
    vor = np.zeros((ny, nx))
    for k in range(1, 6):
        vor += (rng.normal() * np.sin(k * Lo + rng.uniform(0, 6)) *
                np.cos((k + 1) * L) / k)
    vor *= 1e-5 * np.cos(L)
    curl = np.gradient(vor, axis=0) * 0.3 + vor * 0.1   # wind-stress-like

    vor = np.where(land, np.nan, vor)
    curl = np.where(land, np.nan, curl)
    mask = (~land).astype(np.float64)

    coords = {"lat": lat, "lon": lon}
    ds = {
        "vor": Field(vor, ("lat", "lon"), coords),
        "curl": Field(curl, ("lat", "lon"), coords),
        "mask": Field(mask, ("lat", "lon"), coords),
    }
    path = os.path.join(OUT, "ocean_masked.nc")
    save_dataset(ds, path)
    return path


def make_atmos3d(nz=37, ny=72, nx=144):
    """3-D atmosphere fixture for QG-omega (atmos3D analog)."""
    lev = np.linspace(100000.0, 10000.0, nz)
    lat = np.linspace(-87.5, 87.5, ny)
    lon = np.linspace(0.0, 360.0 - 360.0 / nx, nx)
    L = np.deg2rad(lat)[None, :, None]
    Lo = np.deg2rad(lon)[None, None, :]
    P = lev[:, None, None]

    # stratification profile: weak troposphere, strong stratosphere
    N2 = np.where(lev > 25000.0, 1.5e-5, 6e-5)

    rng = np.random.default_rng(2)
    # synoptic-looking forcing: baroclinic wave train at mid-latitudes
    envelope = np.exp(-((np.abs(L) - np.deg2rad(45)) / np.deg2rad(15)) ** 2)
    vertical = np.sin(np.pi * (100000.0 - P) / 90000.0)
    F = np.zeros((nz, ny, nx))
    for k in range(4, 9):
        F += (rng.normal() * np.sin(k * Lo + rng.uniform(0, 6)) *
              envelope * vertical / k)
    F *= 1e-15

    W = np.zeros((nz, ny, nx))      # lower-boundary pattern for icbc tests
    W[-1] = 0.1 * np.sin(2 * np.deg2rad(lon))[None, :] * \
        np.cos(np.deg2rad(lat))[:, None]

    coords = {"LEV": lev, "lat": lat, "lon": lon}
    ds = {
        "F": Field(F, ("LEV", "lat", "lon"), coords),
        "WBC": Field(W, ("LEV", "lat", "lon"), coords),
        "N2": Field(np.broadcast_to(N2[:, None, None], (nz, ny, nx)).copy(),
                    ("LEV", "lat", "lon"), coords),
        "N2prof": Field(N2, ("LEV",), {"LEV": lev}),
    }
    path = os.path.join(OUT, "atmos3d_like.nc")
    save_dataset(ds, path)
    return path


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    print(make_ocean())
    print(make_atmos3d())
