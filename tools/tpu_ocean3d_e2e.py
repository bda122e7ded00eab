# -*- coding: utf-8 -*-
"""End-to-end TPU validation of the wide-flat 3-D ocean path: the public
`invert_3DOcean` API at a SODA-class 30x330x720 f32 masked volume, whose
spec has no feasible direct z-window plan and dispatches the z<->y
PERMUTED windowed kernel (general-3D family).  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_ocean3d_e2e.py

Reference workload analog: apps.py:830-888 (invert_3DOcean) on SODA-like
0.5-degree ocean grids (tests/test_3DOcean.py is fully commented out in
the reference; .MISSING_LARGE_BLOBS strips its SODA fixture).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    nz, ny, nx = 30, 330, 720

    from xinvert_tpu import Field, invert_3DOcean
    from xinvert_tpu.models import api

    lev = np.linspace(0.0, 2900.0, nz)
    lat = np.linspace(-74.75, 89.75, ny)
    lon = np.linspace(0.25, 360.0 - 360.0 / nx + 0.25, nx)
    llat = np.deg2rad(lat)[None, :, None]
    llon = np.deg2rad(lon)[None, None, :]
    zprof = np.exp(-lev / 800.0)[:, None, None]
    F = (1e-11 * zprof * np.sin(5 * llon) * np.cos(3 * llat)).astype(np.float32)
    # synthetic continents: NaN-masked blocks + shallow shelf
    mask = np.ones((nz, ny, nx), bool)
    mask[:, 120:190, 180:260] = False
    mask[:, 200:280, 480:560] = False
    mask[18:, 60:100, 40:120] = False
    F = np.where(mask, F, np.nan).astype(np.float32)
    N2 = (1e-5 * np.exp(-lev / 1000.0) + 1e-7).astype(np.float32)

    Ff = Field(jnp.asarray(F), ("LEV", "lat", "lon"),
               {"LEV": lev, "lat": lat, "lon": lon})
    Nf = Field(jnp.asarray(N2), ("LEV",), {"LEV": lev})
    mP = {"epsilon": 7e-6, "k": 1e-5, "N2": Nf}

    # dispatch check on the actual spec the API builds: permuted window3d
    from xinvert_tpu.models.problems import build_ocean3d
    from xinvert_tpu.models.params import default_mParams
    from xinvert_tpu.grid import Grid
    from xinvert_tpu.solver import _select_kernel
    from xinvert_tpu.ops.pallas_sor3d_window import (window3d_plan,
                                                     window3d_plan_any)
    grid = Grid.make(("LEV", "lat", "lon"), (lev, lat, lon), "lat-lon",
                     bcs=("fixed", "extend", "periodic"))
    mPfull = dict(default_mParams)
    mPfull.update({"epsilon": 7e-6, "k": 1e-5, "N2": N2.astype(np.float64)})
    spec = build_ocean3d(jnp.asarray(np.nan_to_num(F)),
                         jnp.asarray(mask), grid, mPfull)
    spec = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "astype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, spec)
    assert window3d_plan(spec, (nz, ny, nx)) is None, \
        "direct plan feasible — not the wide-flat case"
    planned = window3d_plan_any(spec, (nz, ny, nx))
    print("permuted plan:", planned, flush=True)
    assert planned is not None and planned[1] is True
    kern = _select_kernel(spec, jnp.zeros((nz, ny, nx), jnp.float32))
    print("dispatch for SODA-class 3DOcean spec:", kern, flush=True)
    assert kern == "window3d", kern

    iP = {"BCs": ["fixed", "extend", "periodic"], "undef": np.nan,
          "tolerance": 1e-6, "mxLoop": 600, "printInfo": False}
    t0 = time.perf_counter()
    W = invert_3DOcean(Ff, dims=["LEV", "lat", "lon"], mParams=mP, iParams=iP)
    r = api.LAST_SOLVE
    v = np.asarray(W.values)
    ok = np.isfinite(v[mask]).all() and np.isnan(v[~mask]).all()
    print(f"invert_3DOcean (tol 1e-6): {time.perf_counter()-t0:.1f}s "
          f"(incl. compile), iters={int(r.iters)}, "
          f"rel={float(r.rel_change):.2e}, mask-ok={ok}, "
          f"range=({np.nanmin(v):.3e}, {np.nanmax(v):.3e})", flush=True)
    assert ok
    assert float(r.rel_change) < 1e-6 or int(r.iters) == 600

    t0 = time.perf_counter()
    W2 = invert_3DOcean(Ff, dims=["LEV", "lat", "lon"], mParams=mP, iParams=iP)
    print(f"warm invert_3DOcean: {time.perf_counter()-t0:.2f}s", flush=True)
    assert np.allclose(np.asarray(W2.values), v, equal_nan=True)


if __name__ == "__main__":
    main()
