# -*- coding: utf-8 -*-
"""Time the direct spectral solver on the real TPU.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_direct_timing.py

Two shapes: the reference's canonical global atmos grid (73x144) and the
2048^2 single-chip flagship (unmasked, extend+periodic — the masked case is
out of the direct solver's scope by design).  Timing follows bench.py's
chained-call protocol (the relay can return from block_until_ready early).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(fn, S0, n_chain=8, trials=3):
    """Median per-call seconds via chained dependent calls minus a 1-call
    baseline (bench.py protocol)."""
    fn(S0)                       # compile/warmup
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        S = S0
        for _ in range(n_chain):
            S = fn(S)
        float(jnp.sum(jnp.abs(S)))
        t_long = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(jnp.abs(fn(S0))))
        t_short = time.perf_counter() - t0
        rates.append(max((t_long - t_short) / (n_chain - 1), 1e-9))
    return float(np.median(rates))


def main():
    import __graft_entry__ as g
    from xinvert_tpu.ops.direct import solve_direct, direct_applicable
    from xinvert_tpu.solver import solve_fixed

    print("backend:", jax.default_backend())
    for ny, nx in ((80, 144), (2048, 2048)):
        spec, S0, grid = g._poisson_problem(batch=0, ny=ny, nx=nx,
                                            masked=False, dtype=np.float32)
        assert direct_applicable(spec, S0.shape)

        def dsolve(S):
            # feed the previous result back as S0: the gauge shift makes the
            # call S-dependent, so chained calls cannot be CSE'd away
            return solve_direct(spec, S)

        t = chain_time(dsolve, S0)
        print(f"{ny}x{nx}: direct solve {1e3 * t:.3f} ms/call")

        # equivalent-sweep context: SOR throughput on the same problem
        n_sw = 100
        t_sor = chain_time(lambda S: solve_fixed(spec, S, np.float32(
            grid.omega_opt), n_sw), S0, n_chain=4)
        rate = ny * nx * n_sw / t_sor
        print(f"{ny}x{nx}: SOR {rate:.3e} pt-sweeps/s "
              f"-> direct == {t * rate / (ny * nx):.1f} sweeps' time")


if __name__ == "__main__":
    main()
