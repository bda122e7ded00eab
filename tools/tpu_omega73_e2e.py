# -*- coding: utf-8 -*-
"""End-to-end TPU validation of the deep-atmosphere (73-level) omega path:
the public `invert_omega` API at 73x72x288 f32, whose spec dispatches the
z-windowed >VMEM kernel, and the convergence-checked `solve` driver (the
raised scoped-VMEM jit composing the windowed kernel inside its
while_loop).  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_omega73_e2e.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    nz, ny, nx = 73, 72, 288

    from xinvert_tpu import Field, invert_omega
    from xinvert_tpu.models import api

    lev = np.linspace(100000.0, 10000.0, nz)
    lat = np.linspace(-88.75, 88.75, ny)
    lon = np.linspace(0.0, 360.0 - 360.0 / nx, nx)
    llat = np.deg2rad(lat)[None, :, None]
    llon = np.deg2rad(lon)[None, None, :]
    zprof = np.sin(np.pi * (lev[0] - lev) / (lev[0] - lev[-1]))[:, None, None]
    F = (1e-12 * zprof * np.sin(6 * llon) * np.cos(2 * llat)
         * np.exp(-((np.abs(lat[None, :, None]) - 45.0) / 15.0) ** 2)
         ).astype(np.float32)
    N2 = (2e-6 + 1e-6 * (1 - lev / lev[0])).astype(np.float32)

    Ff = Field(jnp.asarray(F), ("LEV", "lat", "lon"),
               {"LEV": lev, "lat": lat, "lon": lon})
    Nf = Field(jnp.asarray(N2), ("LEV",), {"LEV": lev})

    # kernel dispatch check on the actual spec the API builds
    from xinvert_tpu.models.problems import build_omega
    from xinvert_tpu.models.params import default_mParams
    from xinvert_tpu.grid import Grid
    from xinvert_tpu.solver import _select_kernel
    grid = Grid.make(("LEV", "lat", "lon"), (lev, lat, lon), "lat-lon",
                     bcs=("fixed", "fixed", "periodic"))
    mP = dict(default_mParams)
    mP["N2"] = jnp.asarray(N2)[:, None, None]
    spec = build_omega(jnp.asarray(F), jnp.ones((nz, ny, nx), bool), grid, mP)
    kern = _select_kernel(spec, jnp.zeros((nz, ny, nx), jnp.float32))
    print("dispatch for 73-level omega spec:", kern, flush=True)
    assert kern == "window3d", kern

    t0 = time.perf_counter()
    W = invert_omega(Ff, dims=["LEV", "lat", "lon"],
                     iParams={"BCs": ["fixed", "fixed", "periodic"],
                              "tolerance": 1e-6, "mxLoop": 600,
                              "printInfo": False},
                     mParams={"N2": Nf})
    r = api.LAST_SOLVE
    v = np.asarray(W.values)
    print(f"invert_omega (tol 1e-6): {time.perf_counter()-t0:.1f}s "
          f"(incl. compile), iters={int(r.iters)}, "
          f"rel={float(r.rel_change):.2e}, finite={np.isfinite(v).all()}, "
          f"range=({v.min():.3e}, {v.max():.3e})", flush=True)
    assert np.isfinite(v).all()
    assert float(r.rel_change) < 1e-6 or int(r.iters) == 600

    # warm solve timing
    t0 = time.perf_counter()
    W2 = invert_omega(Ff, dims=["LEV", "lat", "lon"],
                      iParams={"BCs": ["fixed", "fixed", "periodic"],
                               "tolerance": 1e-6, "mxLoop": 600,
                               "printInfo": False},
                      mParams={"N2": Nf})
    print(f"warm invert_omega: {time.perf_counter()-t0:.2f}s", flush=True)
    assert np.allclose(np.asarray(W2.values), v)


if __name__ == "__main__":
    main()
