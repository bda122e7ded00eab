# -*- coding: utf-8 -*-
"""On-TPU validation + timing of the WINDOWED kernel on the biharmonic
family: 2048^2 Stommel-Munk class (A4 del^4 psi - beta psi_x = curl tau,
reference numbas.py:1205 / apps.py invert_StommelMunk).

The 17-point radius-2 stencil needs halo = round8(2*2*k) = 16 ghost rows
per side and streams K+3 = 19 coefficient planes — the heaviest windowed
configuration.  Checks bit-exactness vs the XLA roll path at 30 sweeps,
then times 500-sweep calls both ways (VERDICT r3 item 5: >= 3x the XLA
rate).

    python tools/tpu_bih_check.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def _munk(ny, nx, seed=0):
    from xinvert_tpu import stencil
    rng = np.random.default_rng(seed)
    dt = np.float32
    A4 = np.full((ny, nx), 5e3, dt)          # biharmonic viscosity
    Z = np.zeros((ny, nx), dt)
    beta = np.full((ny, nx), 2e-11, dt)
    J = rng.normal(0, 1e-7, (ny, nx)).astype(dt)
    Fdef = np.ones((ny, nx), bool)
    Fdef[ny // 3: ny // 2, nx // 4: nx // 2] = False     # masked basin
    return stencil.general_2d_bih(
        jnp.asarray(A4), jnp.asarray(Z), jnp.asarray(A4),   # A, B, C
        jnp.asarray(Z), jnp.asarray(Z), jnp.asarray(Z),     # D, E, F
        jnp.asarray(Z), jnp.asarray(-beta), jnp.asarray(Z),  # G, H, I
        jnp.asarray(J), jnp.asarray(Fdef), (5e4, 5e4),
        ("fixed", "fixed"))


def main():
    print("backend:", jax.default_backend())
    from xinvert_tpu.ops.pallas_sor_window import (sor_sweeps_window,
                                                   window_plan)
    from xinvert_tpu.solver import _solve_fixed_xla, solve, _select_kernel

    ny = nx = 2048
    spec = _munk(ny, nx)
    plan = window_plan(spec, (ny, nx))
    print("plan:", plan, "dispatch:", _select_kernel(spec,
                                                     jnp.zeros((ny, nx))))
    S0 = jnp.zeros((ny, nx), jnp.float32)
    om = np.float32(1.0)

    # --- parity, 30 sweeps ---
    t0 = time.perf_counter()
    ref = np.asarray(_solve_fixed_xla(spec, S0, om, 30))
    print(f"xla 30-sweep compile+run {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = np.asarray(sor_sweeps_window(spec, S0, om, 30))
    print(f"windowed 30-sweep compile+run {time.perf_counter() - t0:.1f}s")
    exact = np.array_equal(out, ref)
    print("bit-exact vs xla:", exact,
          "maxdiff:", float(np.abs(out - ref).max()))
    assert exact, "PARITY FAIL"

    # --- timing, 500-sweep calls, chained ---
    iters, chain = 500, 4
    npts = ny * nx

    def run(fn, n_chain):
        S = S0
        t0 = time.perf_counter()
        for _ in range(n_chain):
            S = fn(spec, S, om, iters)
        v = float(jnp.sum(jnp.abs(S)))
        dt = time.perf_counter() - t0
        assert np.isfinite(v)
        return dt

    rates = {}
    for name, fn in (("windowed", sor_sweeps_window),
                     ("xla", _solve_fixed_xla)):
        run(fn, 1)
        rs = []
        for _ in range(3):
            t_long = run(fn, chain)
            t_short = run(fn, 1)
            per = max((t_long - t_short) / (chain - 1), 1e-9)
            rs.append(npts * iters / per)
        rates[name] = float(np.median(rs))
        print(f"{name}: {rates[name]:.3e} pt-sweeps/s "
              f"({npts * iters / rates[name] * 1e3:.1f} ms / 500 sweeps)")
    speedup = rates["windowed"] / rates["xla"]
    print(f"speedup: {speedup:.2f}x")

    # --- checked solve smoke on the stepper path ---
    t0 = time.perf_counter()
    r = solve(spec, S0, om, tol=0.0, max_iters=1000, check_every=100)
    jax.block_until_ready(r.S)
    print(f"checked solve (1000 sweeps, cadence 100): "
          f"{time.perf_counter() - t0:.1f}s, iters={int(r.iters)}, "
          f"overflow={bool(r.overflow)}")
    assert int(r.iters) == 1000 and not bool(r.overflow)
    print("OK")


if __name__ == "__main__":
    main()
