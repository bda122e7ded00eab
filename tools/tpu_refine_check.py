# -*- coding: utf-8 -*-
"""On-TPU certification of mixed-precision iterative refinement at the
flagship scale: 2048^2 FULL-SPHERE Poisson, f32.

The single-f32 relative-residual floor here is ~1e-1 (polar metric
inflation, CLAUDE.md); solve_refined's double-float32 state + compensated
residual certification should land orders below the VERDICT r3 target of
1e-5 — round-4 final: 2.24e-9 in 2 rounds, ~5 s steady (change-rule
stepper inner solves + jitted EFT passes).  The certificate itself is
validated against f64 on CPU by the test suite (tests/test_refine.py);
this script checks the EFT identities survive the v5e compiler and
records wall time.

    python tools/tpu_refine_check.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend())

    # EFT sanity on the chip: TwoProd/TwoSum must be error-free under the
    # TPU compiler's default float semantics (no reassociation / fast-math)
    from xinvert_tpu.ops.compensated import two_sum, two_prod
    rng = np.random.default_rng(0)
    a = (rng.normal(0, 1, 8192) * 10.0 **
         rng.integers(-8, 9, 8192)).astype(np.float32)
    b = (rng.normal(0, 1, 8192) * 10.0 **
         rng.integers(-8, 9, 8192)).astype(np.float32)
    s, e = jax.jit(two_sum)(jnp.asarray(a), jnp.asarray(b))
    ok_s = np.array_equal(np.asarray(s, np.float64) + np.asarray(e, np.float64),
                          a.astype(np.float64) + b.astype(np.float64))
    p, pe = jax.jit(two_prod)(jnp.asarray(a), jnp.asarray(b))
    ok_p = np.array_equal(np.asarray(p, np.float64) + np.asarray(pe, np.float64),
                          a.astype(np.float64) * b.astype(np.float64))
    print(f"EFT on chip: two_sum exact={ok_s} two_prod exact={ok_p}")
    assert ok_s and ok_p, "EFT identities broken by the TPU compiler"

    from __graft_entry__ import _poisson_problem
    from xinvert_tpu.refine import solve_refined
    from xinvert_tpu.solver import solve

    ny = nx = 2048
    spec, S0, grid = _poisson_problem(batch=0, ny=ny, nx=nx,
                                      dtype=np.float32)

    # single-f32 stall level (bounded budget)
    t0 = time.perf_counter()
    stall = solve(spec, S0, grid.omega_opt, tol=1e-9, max_iters=20000,
                  check_every=500, tol_type="residual")
    print(f"single-f32: rel={float(stall.rel_change):.3e} "
          f"iters={int(stall.iters)} t={time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    res = solve_refined(spec, S0, omega=grid.omega_opt, tol=1e-5,
                        max_rounds=4, inner_tol=1e-3, inner_iters=40000)
    t = time.perf_counter() - t0
    rel = float(jnp.max(res.rel_residual))
    print(f"refined: certified rel={rel:.3e} rounds={res.rounds} t={t:.1f}s")
    assert rel <= 1e-5, f"certification target missed: {rel:.3e}"
    # round 5: the whole refinement is ONE jitted program
    # (refine._refine_rounds_impl) — the second call reuses the compile
    # and shows the steady-state cost users pay (round 4's host loop:
    # ~5.3 s steady; target <= 2 s)
    t0 = time.perf_counter()
    res2 = solve_refined(spec, S0, omega=grid.omega_opt, tol=1e-5,
                         max_rounds=4, inner_tol=1e-3, inner_iters=40000)
    t2 = time.perf_counter() - t0
    rel2 = float(jnp.max(res2.rel_residual))
    print(f"refined steady: rel={rel2:.3e} rounds={res2.rounds} "
          f"t={t2:.1f}s (fused single-program rounds)")
    print("OK: certified <= 1e-5 at 2048^2 full-sphere f32")

    # MG-backed refinement through the api (round 4): V-cycle correction
    # solves instead of SOR sweeps — certified solves in ~a second
    import xinvert_tpu as xv
    ny2 = nx2 = 2048
    lat = np.linspace(-88.75, 88.75, ny2)
    lon = np.linspace(0, 360 - 360 / nx2, nx2)
    llat, llon = np.deg2rad(lat)[:, None], np.deg2rad(lon)[None, :]
    vor = (np.sin(3 * llon) * np.cos(2 * llat) * 1e-5).astype(np.float32)
    F = xv.Field(vor, ("lat", "lon"), {"lat": lat, "lon": lon}, name="vor")
    iP = {"BCs": ["extend", "periodic"], "undef": np.nan,
          "printInfo": False, "tolType": "refined"}
    t0 = time.perf_counter()
    xv.invert_Poisson_mg(F, dims=["lat", "lon"], tol=1e-5, iParams=iP)
    t1 = time.perf_counter() - t0
    r1 = xv.models.api.LAST_REFINE
    # second call reuses compiles: the steady-state cost
    t0 = time.perf_counter()
    xv.invert_Poisson_mg(F, dims=["lat", "lon"], tol=1e-5, iParams=iP)
    t2 = time.perf_counter() - t0
    r2 = xv.models.api.LAST_REFINE
    print(f"mg-refined 2048^2 full-sphere: certified "
          f"{float(jnp.max(r2.rel_residual)):.3e} in {r2.rounds} rounds; "
          f"first call {t1:.1f}s (compiles), steady {t2:.1f}s")
    assert float(jnp.max(r2.rel_residual)) <= 1e-5


if __name__ == "__main__":
    main()
