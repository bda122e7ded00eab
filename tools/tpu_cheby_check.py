# -*- coding: utf-8 -*-
"""Hardware check: cyclic Chebyshev through the windowed kernel's SMEM
factor path — bit-equality vs the XLA cheby sweep and throughput vs the
XLA path it replaces (round 2 forced scheme='cheby' onto the XLA rolls).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_cheby_check.py
"""
import time

import numpy as np
import jax.numpy as jnp


def main():
    import __graft_entry__ as g
    from xinvert_tpu.solver import solve, solve_fixed_cheby

    spec, S0, grid = g._poisson_problem(batch=1, ny=2048, nx=2048,
                                        dtype=np.float32)
    om = np.float32(grid.omega_opt)
    N = 1000

    def t_kernel():
        t0 = time.perf_counter()
        r = solve(spec, S0, om, tol=0.0, max_iters=N, check_every=32,
                  scheme="cheby")
        assert int(jnp.max(r.iters)) == N
        return time.perf_counter() - t0, r.S

    def t_xla():
        t0 = time.perf_counter()
        S = solve_fixed_cheby(spec, S0, om, N)
        float(jnp.sum(jnp.abs(S)))
        return time.perf_counter() - t0, S

    _, Sk = t_kernel()
    _, Sx = t_xla()
    same = bool(jnp.all(Sk == Sx))
    print(f"cheby({N}) kernel vs XLA: bit-equal -> {same}")
    tk = float(np.median([t_kernel()[0] for _ in range(3)]))
    tx = float(np.median([t_xla()[0] for _ in range(3)]))
    rate = 2048 * 2048 * N / tk
    print(f"kernel: {tk*1e3:.1f} ms ({rate:.3e} pt-sweeps/s)  "
          f"XLA: {tx*1e3:.1f} ms  speedup {tx/tk:.2f}x")


if __name__ == "__main__":
    main()
