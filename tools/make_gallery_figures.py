# -*- coding: utf-8 -*-
"""Generate the gallery figures (docs/gallery/img/*.png).

Static scientific field maps following the dataviz ground rules: signed
fields use a diverging two-hue map with a neutral midpoint (RdBu_r,
symmetric about zero), masked land is neutral gray, axes/grid are
recessive, and all text wears the text color.  Run from repo root:

    PYTHONPATH=. python tools/make_gallery_figures.py
"""
import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import xinvert_tpu as xv
from xinvert_tpu import Field

OUT = os.path.join("docs", "gallery", "img")
LAND = "#c9c9c9"


def _style(ax):
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#b0b0b0")
    ax.tick_params(colors="#555555", labelsize=8)
    ax.xaxis.label.set_color("#333333")
    ax.yaxis.label.set_color("#333333")
    ax.title.set_color("#222222")


def _save(fig, name):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    print("wrote", path)


def _pcolor(ax, x, y, val, title, units,
            xlabel="longitude", ylabel="latitude"):
    v = np.ma.masked_invalid(val)
    vmax = float(np.abs(v).max())
    cmap = plt.get_cmap("RdBu_r").copy()
    cmap.set_bad(LAND)
    im = ax.pcolormesh(x, y, v, cmap=cmap, vmin=-vmax, vmax=vmax,
                       shading="auto", rasterized=True)
    ax.set_title(title, fontsize=10)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    _style(ax)
    cb = plt.colorbar(im, ax=ax, shrink=0.85, pad=0.02)
    cb.set_label(units, fontsize=8, color="#333333")
    cb.ax.tick_params(labelsize=7, colors="#555555")
    cb.outline.set_visible(False)
    return im


def fig_poisson():
    ds = xv.open_dataset("/root/reference/Data/Helmholtz_atmos.nc")
    iP = {"BCs": ["extend", "periodic"], "undef": np.nan,
          "mxLoop": 5000, "tolerance": 1e-11, "printInfo": False}
    sf = xv.invert_Poisson(ds.vor.isel(time=0), dims=["lat", "lon"],
                           iParams=iP)
    lon = np.asarray(sf.coords["lon"]); lat = np.asarray(sf.coords["lat"])
    fig, axes = plt.subplots(1, 2, figsize=(10.5, 3.2))
    _pcolor(axes[0], lon, lat, np.asarray(ds.vor.isel(time=0).values),
            "input: relative vorticity", "s$^{-1}$")
    _pcolor(axes[1], lon, lat, np.asarray(sf.values),
            "inverted: streamfunction", "m$^2$ s$^{-1}$")
    _save(fig, "01_poisson.png")


def fig_munk():
    soda = xv.open_dataset("Data/soda_curl_like.nc")
    iP = {"BCs": ["extend", "periodic"], "undef": np.nan,
          "tolerance": 1e-9, "mxLoop": 8000, "optArg": 1.0,
          "printInfo": False}
    h = xv.invert_StommelMunk(soda.curl.isel(time=0), dims=["lat", "lon"],
                              iParams=iP,
                              mParams={"R": 2e-4, "D": 100, "A4": 5e3})
    lon = np.asarray(h.coords["lon"]); lat = np.asarray(h.coords["lat"])
    fig, ax = plt.subplots(figsize=(7.2, 3.6))
    _pcolor(ax, lon, lat, np.asarray(h.values),
            "Munk gyres from real-curl wind stress (0.5°, masked ocean)",
            "m$^2$ s$^{-1}$")
    _save(fig, "02_munk.png")


def fig_omega():
    ds = xv.open_dataset("Data/atmos3d_like.nc")
    iP = {"BCs": ["fixed", "fixed", "periodic"], "tolerance": 1e-12,
          "mxLoop": 1000, "printInfo": False}
    W = xv.invert_omega(ds.F, dims=["LEV", "lat", "lon"], iParams=iP,
                        mParams={"N2": ds.N2prof})
    lev = np.asarray(W.coords["LEV"]) / 100.0
    lat = np.asarray(W.coords["lat"])
    lon = np.asarray(W.coords["lon"])
    k = len(lev) // 2
    v = np.asarray(W.values)
    fig, axes = plt.subplots(1, 2, figsize=(10.5, 3.2))
    _pcolor(axes[0], lon, lat, v[k],
            f"QG omega at {lev[k]:.0f} hPa", "Pa s$^{-1}$")
    ax = axes[1]
    _pcolor(ax, lat, lev, v[:, :, len(lon) // 2],
            f"meridional section at {lon[len(lon)//2]:.0f}°E", "Pa s$^{-1}$",
            xlabel="latitude", ylabel="pressure (hPa)")
    ax.invert_yaxis()
    _save(fig, "04_omega.png")


def fig_ocean3d():
    soda = xv.open_dataset("Data/soda_curl_like.nc")
    land2d = np.isnan(np.asarray(soda.curl.isel(time=0).values))[::3, ::3]
    lat = np.asarray(soda.curl.coords["lat"])[::3]
    lon = np.asarray(soda.curl.coords["lon"])[::3]
    nz = 20
    lev = np.linspace(0.0, 2850.0, nz)
    mask = np.broadcast_to(~land2d, (nz,) + land2d.shape).copy()
    mask[12:] &= np.roll(mask[0], 2, axis=0)
    zprof = np.exp(-lev / 700.0)[:, None, None]
    src = (np.exp(-((lat[None, :, None] - 62.0) / 8.0) ** 2)
           + np.exp(-((lat[None, :, None] + 58.0) / 8.0) ** 2))
    F = np.where(mask, 1e-11 * zprof * (src - 0.35), np.nan)
    Ff = Field(F, ("LEV", "lat", "lon"),
               {"LEV": lev, "lat": lat, "lon": lon})
    N2 = Field(1e-5 * np.exp(-lev / 1000.0) + 1e-7, ("LEV",), {"LEV": lev})
    iP = {"BCs": ["fixed", "extend", "periodic"], "undef": np.nan,
          "tolerance": 1e-8, "mxLoop": 2000, "printInfo": False}
    W = xv.invert_3DOcean(Ff, dims=["LEV", "lat", "lon"], iParams=iP,
                          mParams={"epsilon": 7e-6, "k": 1e-5, "N2": N2})
    v = np.asarray(W.values)
    fig, ax = plt.subplots(figsize=(7.2, 3.6))
    _pcolor(ax, lon, lat, v[nz // 2],
            f"3-D damped ocean flow potential at {lev[nz//2]:.0f} m",
            "potential")
    _save(fig, "12_ocean3d.png")


def fig_eliassen():
    ds = xv.open_dataset("/root/reference/Data/TC2D.nc")
    UNDEF = 9.99e20
    m = lambda f: f.where(abs(f) < UNDEF * 0.99)
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 2000, "tolerance": 1e-13,
          "optArg": 1.4, "undef": np.nan, "printInfo": False}
    sf = xv.invert_Eliassen(m(ds.faf), dims=["lev", "lat"], coords="z-lat",
                            iParams=iP,
                            mParams={"A": m(ds.Aa), "B": m(ds.Bb),
                                     "C": m(ds.Cc)})
    lev = np.asarray(sf.coords["lev"]) / 100.0
    lat = np.asarray(sf.coords["lat"])
    radius = lat - lat.min()     # fixture stores radius as offset latitudes
    fig, ax = plt.subplots(figsize=(6.4, 3.6))
    _pcolor(ax, radius, lev, np.asarray(sf.values),
            "Sawyer-Eliassen overturning streamfunction (typhoon TC2D)",
            "kg m$^{-1}$ s$^{-1}$", xlabel="radius (degrees)",
            ylabel="pressure (hPa)")
    ax.invert_yaxis()
    _save(fig, "05_eliassen.png")


def main():
    if not os.path.exists("Data/soda_curl_like.nc") \
            or not os.path.exists("Data/atmos3d_like.nc"):
        os.system("python tools/make_fixtures.py")
    fig_poisson()
    fig_munk()
    fig_omega()
    fig_eliassen()
    fig_ocean3d()


if __name__ == "__main__":
    main()
