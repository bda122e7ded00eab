# -*- coding: utf-8 -*-
"""A/B the convergence-check cadence against solve_fixed, interleaved in one
process so relay drift cancels.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_cadence_ab.py
"""
import time

import numpy as np
import jax.numpy as jnp


def main():
    import __graft_entry__ as g
    from xinvert_tpu.solver import solve, solve_fixed

    spec, S0, grid = g._poisson_problem(batch=1, ny=2048, nx=2048,
                                        dtype=np.float32)
    om = np.float32(grid.omega_opt)
    N = 4000

    def t_solve(ce):
        t0 = time.perf_counter()
        r = solve(spec, S0, om, tol=1e-6, max_iters=N, check_every=ce)
        int(jnp.max(r.iters))
        return time.perf_counter() - t0

    def t_fixed():
        t0 = time.perf_counter()
        S = solve_fixed(spec, S0, om, N)
        float(jnp.sum(jnp.abs(S)))
        return time.perf_counter() - t0

    # compile all three variants first
    for ce in (32, 64):
        t_solve(ce)
    t_fixed()

    rows = {32: [], 64: [], "fixed": []}
    for _ in range(5):
        rows[32].append(t_solve(32))
        rows[64].append(t_solve(64))
        rows["fixed"].append(t_fixed())
    tf = float(np.median(rows["fixed"]))
    print(f"fixed({N}): {tf*1e3:.1f} ms")
    for ce in (32, 64):
        tc = float(np.median(rows[ce]))
        print(f"checkEvery={ce}: {tc*1e3:.1f} ms  ratio {tc/tf:.3f}")


if __name__ == "__main__":
    main()
