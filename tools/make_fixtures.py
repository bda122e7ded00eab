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


def _soda_land_mask(lat, lon):
    """Continent-like land/sea mask for the 0.5-degree global ocean grid
    (SODA-analog).  Deterministic: smooth blob continents (meridionally
    elongated so western-boundary currents form against realistic walls),
    an Antarctic cap and a partially closed Arctic."""
    L, Lo = np.meshgrid(np.deg2rad(lat), np.deg2rad(lon), indexing="ij")
    field = np.zeros_like(L)
    # (lat0 deg, lon0 deg, amp, sig_lat, sig_lon) — loosely the Americas,
    # Africa+Eurasia, Australia, Greenland
    blobs = [
        (10, 280, 1.6, 55, 25), (-25, 295, 1.2, 30, 18),
        (15, 20, 1.7, 45, 30), (50, 80, 1.5, 35, 55),
        (-25, 133, 1.0, 18, 22), (72, 320, 0.9, 12, 25),
    ]
    for lat0, lon0, amp, sy, sx in blobs:
        dlat = (L - np.deg2rad(lat0)) / np.deg2rad(sy)
        dlon = np.angle(np.exp(1j * (Lo - np.deg2rad(lon0)))) / np.deg2rad(sx)
        field += amp * np.exp(-dlat ** 2 - dlon ** 2)
    land = field > 0.55
    land |= lat[:, None] < -70.0                     # Antarctica
    land |= (lat[:, None] > 82.0) & (np.cos(2 * Lo) > -0.3)   # Arctic shelf
    return land


def make_soda_curl(ny=330, nx=720, months=12):
    """Monthly global wind-stress-curl fixture (SODA_curl.nc analog:
    reference tests/test_StommelArons.py:21, test_StommelWBC.py:82,
    test_MunkWBC.py:66 and the Fofonoff notebook).  0.5-degree grid,
    lat -74.75..89.75, land = NaN."""
    lat = np.linspace(-74.75, 89.75, ny)
    lon = np.linspace(0.25, 360.0 - 360.0 / nx + 0.25, nx)
    land = _soda_land_mask(lat, lon)
    L = np.deg2rad(lat)[:, None]
    Lo = np.deg2rad(lon)[None, :]

    # climatological curl(tau): subtropical/subpolar gyre bands with a
    # seasonal cycle, plus deterministic synoptic texture
    rng = np.random.default_rng(3)
    texture = np.zeros((ny, nx))
    for k in range(2, 8):
        texture += (rng.normal() * np.sin(k * Lo + rng.uniform(0, 6)) *
                    np.cos((k - 1) * L) / k)
    months_idx = np.arange(months)
    seasonal = 1.0 + 0.35 * np.cos(2 * np.pi * (months_idx - 1) / 12.0)
    base = (np.sin(3 * L) * np.cos(L) + 0.25 * np.sin(5 * L)) * 1e-7
    curl = (seasonal[:, None, None] * base[None]
            + 2e-8 * texture[None] * np.cos(L)[None])
    curl = np.where(land[None], np.nan, curl)

    coords = {"time": months_idx.astype(np.float64), "lat": lat, "lon": lon}
    ds = {"curl": Field(curl, ("time", "lat", "lon"), coords),
          "mask": Field((~land).astype(np.float64), ("lat", "lon"),
                        {"lat": lat, "lon": lon})}
    path = os.path.join(OUT, "soda_curl_like.nc")
    save_dataset(ds, path)
    return path


def make_helmholtz_ocean(ny=330, nx=720, nt=2):
    """Global ocean-model vorticity fixture (Helmholtz_ocean.nc analog:
    reference tests/test_Poisson.py:44-65).  Ocean-model conventions: dims
    (time, YG, XG), land encoded as exact 0 (undef=0), periodic x."""
    lat = np.linspace(-74.75, 89.75, ny)
    lon = np.linspace(0.25, 360.0 - 360.0 / nx + 0.25, nx)
    land = _soda_land_mask(lat, lon)
    L = np.deg2rad(lat)[:, None]
    Lo = np.deg2rad(lon)[None, :]

    rng = np.random.default_rng(4)
    vor = np.zeros((nt, ny, nx))
    for t in range(nt):
        for k in range(2, 9):
            vor[t] += (rng.normal() * np.sin(k * Lo + rng.uniform(0, 6)) *
                       np.cos((k + 1) * L) / k)
        vor[t] *= 2e-5 * np.cos(L)
    vor = np.where(land[None], 0.0, vor)

    coords = {"time": np.arange(nt, dtype=np.float64), "YG": lat, "XG": lon}
    ds = {"vor": Field(vor, ("time", "YG", "XG"), coords)}
    path = os.path.join(OUT, "helmholtz_ocean_like.nc")
    save_dataset(ds, path)
    return path


def make_barotropic2d(ny=121, nc=181):
    """Barotropic2D + contour tabulation fixture (Barotropic2D.nc /
    contour.nc analog: reference tests/test_RefStateSWM.py:14-85).

    Built from an EXACTLY balanced zonally symmetric shallow-water state on
    the sphere: pick u(phi), integrate gradient-wind balance for h(phi),
    derive Q = (f + zeta)/h, Kelvin circulation C = 2 pi r (u + Omega r)
    and cumulative mass M(phi); tabulate M(Q) and C(Q).  The nonlinear
    outer loop of invert_RefStateSWM must then recover href = this h."""
    R = 6371200.0
    Om = 7.292e-5
    g = 9.80665
    lat = np.linspace(-90.0, 90.0, ny)
    phi = np.deg2rad(lat)

    # fine grid for the balance integration
    phif = np.deg2rad(np.linspace(-90.0, 90.0, 4 * (ny - 1) + 1))
    U0 = 8.0
    uf = U0 * np.sin(2 * phif) * np.cos(phif) ** 2      # zero at poles/eq
    f = 2 * Om * np.sin(phif)
    # gradient-wind balance: g dh/dphi = -R (f + u tan(phi)/R) u
    dh = -R * (f + uf * np.tan(np.clip(phif, -1.55, 1.55)) / R) * uf / g
    hf = 5000.0 + np.concatenate(
        [[0.0], np.cumsum(0.5 * (dh[1:] + dh[:-1]) * np.diff(phif))])
    # relative vorticity of the zonal-mean flow: zeta = -(u cos)' / (R cos);
    # u ~ cos^2 near the poles so the limit is finite — take the neighbor
    # value at the exact pole points
    ucos = uf * np.cos(phif)
    cosf = np.cos(phif)
    zetaf = -np.gradient(ucos, phif) / (R * np.where(cosf > 1e-6, cosf, 1.0))
    zetaf[0], zetaf[-1] = zetaf[1], zetaf[-2]
    Qf = (f + zetaf) / hf
    Cf = 2 * np.pi * R * np.cos(phif) * (uf + Om * R * np.cos(phif))
    # cumulative mass from the south pole
    dM = 2 * np.pi * R ** 2 * np.cos(phif) * hf
    Mf = np.concatenate(
        [[0.0], np.cumsum(0.5 * (dM[1:] + dM[:-1]) * np.diff(phif))])

    sample = slice(None, None, 4)
    href, Q, C, M = hf[sample], Qf[sample], Cf[sample], Mf[sample]

    # contour tabulations M(Q), C(Q): Q is monotonic in lat for small U0
    qs = np.linspace(Q.min(), Q.max(), nc)
    Mc = np.interp(qs, Q, M)
    Cc = np.interp(qs, Q, C)

    coords = {"lat": lat}
    cco = {"contour": np.arange(nc, dtype=np.float64)}
    ds = {
        "href": Field(href, ("lat",), coords),
        "uref": Field(uf[sample], ("lat",), coords),
        "Mref": Field(M, ("lat",), coords),
        "PV": Field(qs, ("contour",), cco),
        "Mass": Field(Mc, ("contour",), cco),
        "Circ": Field(Cc, ("contour",), cco),
    }
    path = os.path.join(OUT, "barotropic2d_like.nc")
    save_dataset(ds, path)
    return path


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    print(make_ocean())
    print(make_atmos3d())
    print(make_soda_curl())
    print(make_helmholtz_ocean())
    print(make_barotropic2d())
