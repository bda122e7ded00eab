# -*- coding: utf-8 -*-
"""Checked-solve overhead for the 3-D windowed path on the v5e: the
73-level omega volume (the notebook's interpolated flagship), checked at
cadence 32 vs solve_fixed, plus bit-equality at the sweep cap.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_checked3d_ab.py
"""
import time

import numpy as np
import jax.numpy as jnp


def _omega_problem(nz, ny, nx, dtype=np.float32):
    from xinvert_tpu import stencil
    rng = np.random.default_rng(0)
    shape = (nz, ny, nx)
    A = np.abs(rng.normal(1.0, 0.05, shape)).astype(dtype) + 0.5
    B = np.abs(rng.normal(1.0, 0.05, shape)).astype(dtype) + 0.5
    C = np.abs(rng.normal(1.0, 0.05, shape)).astype(dtype) + 0.5
    F = rng.normal(0, 1, shape).astype(dtype)
    Fdef = np.ones(shape, bool)
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(B),
                               jnp.asarray(C), jnp.asarray(F),
                               jnp.asarray(Fdef), (5e3, 1.1e5, 1.0e5),
                               ("fixed", "extend", "periodic"))
    return spec, jnp.zeros(shape, dtype)


def main():
    from xinvert_tpu.solver import solve, solve_fixed, _select_kernel

    spec, S0 = _omega_problem(73, 72, 288)
    assert _select_kernel(spec, S0) == "window3d", _select_kernel(spec, S0)
    om = np.float32(1.4)
    N = 2000

    def t_solve():
        t0 = time.perf_counter()
        r = solve(spec, S0, om, tol=0.0, max_iters=N, check_every=32)
        assert int(jnp.max(r.iters)) == N
        return time.perf_counter() - t0, r.S

    def t_fixed():
        t0 = time.perf_counter()
        S = solve_fixed(spec, S0, om, N)
        float(jnp.sum(jnp.abs(S)))
        return time.perf_counter() - t0, S

    _, Sc = t_solve()
    _, Sf = t_fixed()
    print(f"checked vs fixed({N}): bit-equal -> {bool(jnp.all(Sc == Sf))}")
    tc = float(np.median([t_solve()[0] for _ in range(3)]))
    tf = float(np.median([t_fixed()[0] for _ in range(3)]))
    pts = 73 * 72 * 288 * N
    print(f"fixed: {tf*1e3:.1f} ms ({pts/tf:.3e} pt-sweeps/s)  "
          f"checked(ce=32): {tc*1e3:.1f} ms  ratio {tc/tf:.3f}")


if __name__ == "__main__":
    main()
