# -*- coding: utf-8 -*-
"""VERDICT #5 acceptance on hardware: convergence-checked solve within 1.2x
of solve_fixed wall-clock at 2048^2, plus a public-API omega smoke through
the vmem3d dispatch.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_check_amortized.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import __graft_entry__ as g
    from xinvert_tpu.solver import solve, solve_fixed

    print("backend:", jax.default_backend())
    spec, S0, grid = g._poisson_problem(batch=1, ny=2048, nx=2048,
                                        dtype=np.float32)
    om = np.float32(grid.omega_opt)

    # convergence-checked at tol 1e-6 with the auto-amortised cadence
    def run_solve():
        t0 = time.perf_counter()
        r = solve(spec, S0, om, tol=1e-6, max_iters=4000, check_every=64)
        it = int(jnp.max(r.iters))
        rel = float(jnp.max(r.rel_change))
        dt = time.perf_counter() - t0
        return dt, it, rel

    dt, iters, rel = run_solve()                       # compile
    dts = [run_solve()[0] for _ in range(3)]
    t_solve = float(np.median(dts))
    print(f"solve(tol=1e-6, checkEvery=64): {iters} sweeps, rel {rel:.2e}, "
          f"median {t_solve*1e3:.1f} ms")

    def run_fixed(n):
        t0 = time.perf_counter()
        S = solve_fixed(spec, S0, om, n)
        float(jnp.sum(jnp.abs(S)))
        return time.perf_counter() - t0

    run_fixed(iters)                                   # compile
    t_fixed = float(np.median([run_fixed(iters) for _ in range(3)]))
    print(f"solve_fixed({iters}): median {t_fixed*1e3:.1f} ms")
    print(f"ratio solve/solve_fixed = {t_solve / t_fixed:.3f}  "
          f"(acceptance: <= 1.2)")

    # public-API flagship omega through the vmem3d dispatch
    import xinvert_tpu as xv
    rng = np.random.default_rng(0)
    nz, ny, nx = 37, 72, 288
    lev = np.linspace(1000e2, 100e2, nz)
    lat = np.linspace(-88.75, 88.75, ny)
    lon = np.linspace(0, 360 - 360 / nx, nx)
    F = xv.Field(rng.normal(0, 1e-12, (nz, ny, nx)).astype(np.float32),
                 ("lev", "lat", "lon"),
                 {"lev": lev, "lat": lat, "lon": lon})
    t0 = time.perf_counter()
    w = xv.invert_omega(F, dims=["lev", "lat", "lon"],
                        iParams={"BCs": ["fixed", "fixed", "periodic"],
                                 "mxLoop": 500, "tolerance": 1e-7,
                                 "checkEvery": 25, "printInfo": False},
                        mParams={"N2": 2e-4})
    from xinvert_tpu.models import api
    print(f"invert_omega (public API, vmem3d): {int(api.LAST_SOLVE.iters)} "
          f"sweeps, rel {float(api.LAST_SOLVE.rel_change):.2e}, "
          f"finite={bool(np.isfinite(w.values).all())}, "
          f"compile+run {time.perf_counter()-t0:.0f}s")


if __name__ == "__main__":
    main()
