# -*- coding: utf-8 -*-
"""On-TPU validation of the batched window kernel + regression check of the
unbatched 2048^2 headline path after the grid=(B, tiles) refactor.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_check_window_batch.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from xinvert_tpu.solver import solve_fixed, _solve_fixed_xla, _select_kernel


def _problem(batch, ny, nx):
    import __graft_entry__ as g
    spec, S0, grid = g._poisson_problem(batch=batch, ny=ny, nx=nx,
                                        dtype=np.float32)
    return spec, S0, np.float32(grid.omega_opt)


def main():
    print("backend:", jax.default_backend())

    # --- regression: unbatched 2048^2 headline path ---
    spec, S0, om = _problem(1, 2048, 2048)
    assert _select_kernel(spec, S0) == "window", \
        _select_kernel(spec, S0)
    t0 = time.perf_counter()
    out = solve_fixed(spec, S0, om, 100)
    ref = _solve_fixed_xla(spec, S0, om, 100)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"2048^2 B=1: maxdiff {err:.3e}  "
          f"(compile+run {time.perf_counter()-t0:.0f}s)")
    assert err == 0.0, "headline parity FAIL"

    # --- batched 4 x 1024^2 ---
    spec, S0, om = _problem(4, 1024, 1024)
    assert _select_kernel(spec, S0) == "window", \
        _select_kernel(spec, S0)
    t0 = time.perf_counter()
    out = solve_fixed(spec, S0, om, 100)
    ref = _solve_fixed_xla(spec, S0, om, 100)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"1024^2 B=4: maxdiff {err:.3e}  "
          f"(compile+run {time.perf_counter()-t0:.0f}s)")
    assert err == 0.0, "batched parity FAIL"

    # --- batched throughput (chained) ---
    iters, chain = 100, 8
    npts = 4 * 1024 * 1024 * 1024 // 1024    # 4*1024*1024

    def run(fn, n_chain):
        S = S0
        t0 = time.perf_counter()
        for _ in range(n_chain):
            S = fn(spec, S, om, iters)
        v = float(jnp.sum(jnp.abs(S)))
        dt = time.perf_counter() - t0
        assert np.isfinite(v)
        return dt

    for name, fn in (("window-batched", solve_fixed),
                     ("xla", _solve_fixed_xla)):
        run(fn, 1)
        rates = []
        for _ in range(3):
            t_long = run(fn, chain)
            t_short = run(fn, 1)
            per = max((t_long - t_short) / (chain - 1), 1e-9)
            rates.append(npts * iters / per)
        print(f"{name}: {float(np.median(rates)):.3e} pt-sweeps/s")


if __name__ == "__main__":
    main()
