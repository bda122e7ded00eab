# -*- coding: utf-8 -*-
"""A/B the convergence-check cadence against solve_fixed, interleaved in one
process so relay drift cancels.

tol=0 keeps every variant running exactly N sweeps (the change rule never
fires), so the ratio isolates the per-check cost.  Round 2 (per-call path,
W stack rebuilt every check): cadence 32 ran 1.17x solve_fixed.  Round 3
target (fused-norm stepper): cadence 8 <= 1.02x.

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
        r = solve(spec, S0, om, tol=0.0, max_iters=N, check_every=ce)
        it = int(jnp.max(r.iters))
        assert it == N, (ce, it)
        return time.perf_counter() - t0, r.S

    def t_fixed():
        t0 = time.perf_counter()
        S = solve_fixed(spec, S0, om, N)
        float(jnp.sum(jnp.abs(S)))
        return time.perf_counter() - t0, S

    cadences = (8, 32)
    # compile all variants first; keep the final states for equality checks
    states = {ce: t_solve(ce)[1] for ce in cadences}
    _, S_fixed = t_fixed()
    for ce in cadences:
        same = bool(jnp.all(states[ce] == S_fixed))
        print(f"checkEvery={ce}: bit-equal vs solve_fixed({N}) -> {same}")

    rows = {ce: [] for ce in cadences}
    rows["fixed"] = []
    for _ in range(5):
        for ce in cadences:
            rows[ce].append(t_solve(ce)[0])
        rows["fixed"].append(t_fixed()[0])
    tf = float(np.median(rows["fixed"]))
    print(f"fixed({N}): {tf*1e3:.1f} ms")
    for ce in cadences:
        tc = float(np.median(rows[ce]))
        print(f"checkEvery={ce}: {tc*1e3:.1f} ms  ratio {tc/tf:.3f}")


if __name__ == "__main__":
    main()
