# -*- coding: utf-8 -*-
"""A/B the extend-pass variants at the 2048^2 flagship: static-row cheap
extend (bit-exact, now default) vs extend-folded weights (FOLD_EXTEND=True,
rounding-level deviation).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_extend_ab.py
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
        for _ in range(3):
            t_long = run(chain)
            t_short = run(1)
            per = max((t_long - t_short) / (chain - 1), 1e-9)
            rates.append(npts * iters / per)
        print(f"{tag}: {float(np.median(rates)):.3e} pt-sweeps/s", flush=True)

    # bit-exactness of the default path first
    ref = _solve_fixed_xla(spec, S0, om, 50)
    out = solve_fixed(spec, S0, om, 50)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"cheap-extend maxdiff vs xla: {err:.3e}")
    assert err == 0.0

    rate("cheap-extend (default)")

    win.FOLD_EXTEND = True
    out = solve_fixed(spec, S0, om, 50)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    print(f"folded rel dev vs xla: {rel:.3e} (expected ~1e-7 f32 rounding)")
    rate("extend-folded")
    win.FOLD_EXTEND = False


if __name__ == "__main__":
    main()
