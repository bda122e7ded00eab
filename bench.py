# -*- coding: utf-8 -*-
"""Headline benchmark: masked spherical Poisson SOR throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric is SOR grid-point updates per second (grid points x sweeps / wall
second) on the flagship masked Poisson problem.  Baseline is the only
quantitative wall-clock figure the reference publishes: the QG-omega notebook
(/root/reference/docs/source/notebooks/11_Omega_equation.ipynb, "time used:
2920.08 s") — 4 inversions x 500 sweeps over a 37x72x288 grid on the author's
CPU = 767,232 pts x 2,000 sweeps / 2,920 s = 5.255e5 point-sweeps/s.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_PTS_PER_S = 37 * 72 * 288 * 2000 / 2920.08


def main():
    from __graft_entry__ import _poisson_problem
    from xinvert_tpu.solver import solve_fixed

    platform = jax.devices()[0].platform
    # large single-chip grid on an accelerator; smaller on CPU so the bench
    # stays fast in local runs
    if platform == "cpu":
        batch, ny, nx, iters, chain = 1, 512, 512, 50, 2
    else:
        batch, ny, nx, iters, chain = 1, 2048, 2048, 100, 8

    spec, S0, grid = _poisson_problem(batch=batch, ny=ny, nx=nx,
                                      dtype=np.float32)
    omega = grid.omega_opt

    def run(n_chain):
        """Chain n_chain dependent solve calls and force a scalar fetch —
        robust against async dispatch that returns from block_until_ready
        before device execution finishes (observed through the TPU relay)."""
        S = S0
        t0 = time.perf_counter()
        for _ in range(n_chain):
            S = solve_fixed(spec, S, omega, iters)
        v = float(jnp.sum(jnp.abs(S)))   # forces the whole chain
        dt = time.perf_counter() - t0
        assert np.isfinite(v), "diverged"
        return dt

    run(1)            # warmup / compile
    # the remote-compile relay's host timing jitters by up to ~3x between
    # trials: repeat the chained measurement and take the median rate
    rates = []
    for _ in range(3):
        t_long = run(chain)
        t_short = run(1)
        per_call = max((t_long - t_short) / (chain - 1), 1e-9)
        rates.append(batch * ny * nx * iters / per_call)
    pts_per_s = float(np.median(rates))
    print(json.dumps({
        "metric": "masked_poisson_sor_point_sweeps_per_s",
        "value": pts_per_s,
        "unit": "grid-point-sweeps/s",
        "vs_baseline": pts_per_s / BASELINE_PTS_PER_S,
    }))


if __name__ == "__main__":
    main()
