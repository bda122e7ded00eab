# -*- coding: utf-8 -*-
"""A/B probe: deeper k_sweeps on the 2048^2 windowed kernel.

The headline rate (6.5e10 pt-sweeps/s) sits at the v5e HBM roofline for
the k=4 plan's traffic factor (P+1)*win/(tile*k) ~ 2.5 plane-equivalents
per sweep.  k=8 at tile=128 drops the factor to ~1.4 — a potential ~1.4x
if Mosaic tolerates the bigger window (round-2 lore says tile>=256
cliffs, but k-depth at fixed tile was never probed).

    python tools/tpu_k_probe.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend())
    from __graft_entry__ import _poisson_problem
    from xinvert_tpu.ops.pallas_sor_window import (
        WindowPlan, WINDOW_COMPILER_OPTS, _run_group, _round8, window_plan)

    ny = nx = 2048
    spec, S0, grid = _poisson_problem(batch=0, ny=ny, nx=nx,
                                      dtype=np.float32)
    S0 = S0.reshape((1, ny, nx))
    om = np.float32(grid.omega_opt)
    iters = 500
    print("default plan:", window_plan(spec, (1, ny, nx)))

    ref = None
    for tile, k in [(128, 4), (128, 8), (64, 8), (128, 12), (128, 16)]:
        halo = _round8(2 * k)
        plan = WindowPlan(tile, k, halo, ny, 1)

        fn = jax.jit(
            functools.partial(_run_group, n_sweeps=iters, plan=plan,
                              interpret=False, fold=False),
            compiler_options=WINDOW_COMPILER_OPTS)

        def run(n_chain):
            S = S0
            t0 = time.perf_counter()
            for _ in range(n_chain):
                S = fn(spec, S, om)
            v = float(jnp.sum(jnp.abs(S)))
            dt = time.perf_counter() - t0
            assert np.isfinite(v)
            return dt, S

        try:
            t0 = time.perf_counter()
            _, S1 = run(1)
            print(f"tile={tile} k={k}: compile+run "
                  f"{time.perf_counter() - t0:.1f}s")
            if ref is None:
                ref = np.asarray(S1)
            else:
                d = float(np.abs(np.asarray(S1) - ref).max())
                print(f"   vs k=4 state maxdiff {d:.2e} "
                      f"(bit-exact: {d == 0.0})")
            rates = []
            for _ in range(3):
                t_long, _ = run(4)
                t_short, _ = run(1)
                per = max((t_long - t_short) / 3, 1e-9)
                rates.append(ny * nx * iters / per)
            r = float(np.median(rates))
            print(f"   {r:.3e} pt-sweeps/s "
                  f"({ny * nx * iters / r * 1e3:.1f} ms / 500)")
        except Exception as e:                                 # noqa: BLE001
            print(f"tile={tile} k={k}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
