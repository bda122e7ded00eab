# -*- coding: utf-8 -*-
"""Hardware check of the chunked multi-call windowed kernel (v5e).

For each grid: bit-compare the auto-dispatched Pallas path vs the XLA roll
path at a fixed sweep count, and measure throughput by chaining dependent
solve_fixed calls (relay-safe timing: scalar fetch forces the chain, a
1-call baseline subtracts dispatch overhead).

Run: python tools/tpu_chunked_check.py [--grids 2048 4096 8192]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def measure(spec, S0, omega, iters, chain):
    from xinvert_tpu.solver import solve_fixed

    def run(n_chain):
        S = S0
        t0 = time.perf_counter()
        for _ in range(n_chain):
            S = solve_fixed(spec, S, omega, iters)
        v = float(jnp.sum(jnp.abs(S)))
        dt = time.perf_counter() - t0
        assert np.isfinite(v), "diverged"
        return dt

    run(1)  # warmup/compile
    rates = []
    for _ in range(3):
        t_long = run(chain)
        t_short = run(1)
        per_call = max((t_long - t_short) / (chain - 1), 1e-9)
        rates.append(np.prod(S0.shape) * iters / per_call)
    return float(np.median(rates))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, nargs="+",
                    default=[2048, 4096, 8192])
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--chain", type=int, default=5)
    args = ap.parse_args()

    from __graft_entry__ import _poisson_problem
    from xinvert_tpu.solver import solve_fixed
    from xinvert_tpu.ops.pallas_sor_window import window_plan

    print("backend:", jax.default_backend(), flush=True)
    for n in args.grids:
        spec, S0, grid = _poisson_problem(batch=1, ny=n, nx=n,
                                          dtype=np.float32)
        omega = grid.omega_opt
        plan = window_plan(spec, S0.shape)
        print(f"[{n}x{n}] plan: {plan}", flush=True)

        t0 = time.perf_counter()
        Sp = solve_fixed(spec, S0, omega, args.iters)
        float(jnp.sum(jnp.abs(Sp)))
        print(f"[{n}x{n}] pallas compile+first run "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        Sx = solve_fixed(spec, S0, omega, args.iters, use_pallas=False)
        d = float(jnp.max(jnp.abs(Sp - Sx)))
        print(f"[{n}x{n}] xla compile+run {time.perf_counter()-t0:.1f}s  "
              f"max|pallas-xla| = {d}", flush=True)

        rate = measure(spec, S0, omega, args.iters, args.chain)
        print(f"[{n}x{n}] pallas rate: {rate:.3e} pt-sweeps/s", flush=True)


if __name__ == "__main__":
    main()
