# -*- coding: utf-8 -*-
"""Measure the edge-split extend path at the 2048^2 flagship vs one-call.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_edge_split_probe.py
"""
import time

import numpy as np
import jax.numpy as jnp


def main():
    import __graft_entry__ as g
    from xinvert_tpu.solver import solve_fixed, _solve_fixed_xla
    from xinvert_tpu.ops import pallas_sor_window as win

    spec, S0, grid = g._poisson_problem(batch=1, ny=2048, nx=2048,
                                        dtype=np.float32)
    om = np.float32(grid.omega_opt)
    iters, chain = 100, 8
    npts = 2048 * 2048

    def rate(tag):
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
        for _ in range(5):
            t_long = run(chain)
            t_short = run(1)
            per = max((t_long - t_short) / (chain - 1), 1e-9)
            rates.append(npts * iters / per)
        print(f"{tag}: {float(np.median(rates)):.3e} pt-sweeps/s "
              f"(all: {[f'{r:.2e}' for r in sorted(rates)]})", flush=True)

    ref = _solve_fixed_xla(spec, S0, om, 50)
    out = solve_fixed(spec, S0, om, 50)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"edge-split maxdiff vs xla: {err:.3e}", flush=True)
    assert err == 0.0
    rate("edge-split (new default)")

    win.EDGE_SPLIT = False
    rate("one-call (old default)")


if __name__ == "__main__":
    main()
