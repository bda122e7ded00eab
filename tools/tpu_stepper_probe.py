# -*- coding: utf-8 -*-
"""Attribute the checked-solve overhead vs solve_fixed at 2048^2.

Variants, all 4000 sweeps (tol effectively 0):
  fixed      solve_fixed (fori of k-sweep launches, no norm output)
  fori+norm  fori_loop of step_full (fused-norm kernels, no while/cond)
  while      while_loop of step_full (norm-driven exit test, no lax.cond)
  solve      the real solver path (while + lax.cond full/dyn branches)

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_stepper_probe.py
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import __graft_entry__ as g
    from xinvert_tpu.solver import solve, solve_fixed
    from xinvert_tpu.ops.pallas_sor_window import (make_window_stepper,
                                                   WINDOW_COMPILER_OPTS)

    spec, S0, grid = g._poisson_problem(batch=1, ny=2048, nx=2048,
                                        dtype=np.float32)
    om = np.float32(grid.omega_opt)
    N, CE = 4000, 32
    split, join, step_full, _ = make_window_stepper(spec, S0, om, CE)
    bshape = S0.shape[:-2]
    zero = jnp.zeros(bshape, S0.dtype)

    @partial(jax.jit, compiler_options=WINDOW_COMPILER_OPTS)
    def fori_norm(S):
        st, nrm = jax.lax.fori_loop(
            0, N // CE, lambda i, c: step_full(c[0]), (split(S), zero))
        return join(st), nrm

    @partial(jax.jit, compiler_options=WINDOW_COMPILER_OPTS)
    def while_nocond(S):
        def cond(c):
            return c[0] < N

        def body(c):
            it, st, _ = c
            st, nrm = step_full(st)
            return (it + CE, st, nrm)

        it, st, nrm = jax.lax.while_loop(
            cond, body, (jnp.int32(0), split(S), zero))
        return join(st), nrm

    def t_fixed():
        t0 = time.perf_counter()
        S = solve_fixed(spec, S0, om, N)
        float(jnp.sum(jnp.abs(S)))
        return time.perf_counter() - t0, S

    def t_var(fn):
        t0 = time.perf_counter()
        S, nrm = fn(S0)
        float(jnp.sum(jnp.abs(S))), float(jnp.sum(nrm))
        return time.perf_counter() - t0, S

    def t_solve():
        t0 = time.perf_counter()
        r = solve(spec, S0, om, tol=0.0, max_iters=N, check_every=CE)
        int(jnp.max(r.iters))
        return time.perf_counter() - t0, r.S

    # compile + bit-equality
    _, Sf = t_fixed()
    for name, f in (("fori+norm", lambda: t_var(fori_norm)),
                    ("while", lambda: t_var(while_nocond)),
                    ("solve", t_solve)):
        _, S = f()
        print(f"{name}: bit-equal -> {bool(jnp.all(S == Sf))}")

    rows = {k: [] for k in ("fixed", "fori+norm", "while", "solve")}
    for _ in range(5):
        rows["fixed"].append(t_fixed()[0])
        rows["fori+norm"].append(t_var(fori_norm)[0])
        rows["while"].append(t_var(while_nocond)[0])
        rows["solve"].append(t_solve()[0])
    tf = float(np.median(rows["fixed"]))
    print(f"fixed({N}): {tf*1e3:.1f} ms")
    for k in ("fori+norm", "while", "solve"):
        tv = float(np.median(rows[k]))
        print(f"{k}: {tv*1e3:.1f} ms  ratio {tv/tf:.3f}")


if __name__ == "__main__":
    main()
