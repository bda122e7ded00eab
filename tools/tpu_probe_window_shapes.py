# -*- coding: utf-8 -*-
"""Probe: window-kernel throughput vs shape/batch (diagnose the 4x1024^2
gap vs the 2048^2 headline).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_probe_window_shapes.py
"""
import time

import numpy as np
import jax.numpy as jnp

from xinvert_tpu.solver import solve_fixed


def _problem(batch, ny, nx):
    import __graft_entry__ as g
    spec, S0, grid = g._poisson_problem(batch=batch, ny=ny, nx=nx,
                                        dtype=np.float32)
    return spec, S0, np.float32(grid.omega_opt)


def rate(batch, ny, nx, iters=100, chain=8):
    spec, S0, om = _problem(batch, ny, nx)

    def run(n_chain):
        S = S0
        t0 = time.perf_counter()
        for _ in range(n_chain):
            S = solve_fixed(spec, S, om, iters)
        v = float(jnp.sum(jnp.abs(S)))
        dt = time.perf_counter() - t0
        assert np.isfinite(v)
        return dt

    run(1)
    rates = []
    for _ in range(3):
        t_long = run(chain)
        t_short = run(1)
        per = max((t_long - t_short) / (chain - 1), 1e-9)
        rates.append(max(batch, 1) * ny * nx * iters / per)
    r = float(np.median(rates))
    print(f"B={batch} {ny}x{nx}: {r:.3e} pt-sweeps/s", flush=True)
    return r


if __name__ == "__main__":
    rate(1, 1024, 1024)    # shape effect alone
    rate(4, 1024, 1024)    # batch effect (batched g -> bW=4)
    rate(2, 2048, 2048)    # batched at the headline shape
