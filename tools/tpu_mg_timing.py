# -*- coding: utf-8 -*-
"""Time-to-solution on the v5e: multigrid V-cycles vs the SOR windowed
kernel on a 2048^2 masked CARTESIAN Poisson (Munk-domain class).

Cartesian, not spherical: the full-sphere problem's polar metric inflates
the folded w0 so the f32 relative-residual FLOOR (eps * mean|w0*S| /
mean|g|, see solve()'s docstring) sits near 1e-1 at 2048^2 — measured:
both MG and 30k SOR sweeps stall there, while the same problem in f64 on
CPU reaches 1e-9.  On the uniform-metric cartesian problem f32 residuals
reach 1e-6+ and the comparison is meaningful.

SOR targets 1e-4 because its O(N) convergence factor makes 1e-6 at this
size impractical at ANY speed (CPU probe: 40k sweeps reach only 6.4e-5);
MG runs to 1e-6.  Both timings are per-solve wall clock on the chip.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_mg_timing.py
"""
import time

import numpy as np
import jax.numpy as jnp


def main():
    from xinvert_tpu import stencil
    from xinvert_tpu.mg import build_pyramid_standard2d, solve_mg
    from xinvert_tpu.solver import solve

    ny = nx = 2048
    rng = np.random.default_rng(0)
    A = np.ones((ny, nx), np.float32)
    F = (rng.normal(0, 1, (ny, nx)) * 1e-9).astype(np.float32)
    Fdef = np.ones((ny, nx), bool)
    Fdef[ny // 3:ny // 2, nx // 4:nx // 2] = False
    d = (1.0e5, 1.0e5)
    bcs = ("fixed", "fixed")
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(A),
                               jnp.asarray(F), jnp.asarray(Fdef), d, bcs)
    pyr = build_pyramid_standard2d(A, 0.0, A, jnp.asarray(F), Fdef, d, bcs)
    print(f"pyramid: {len(pyr)} levels")
    S0 = jnp.zeros((ny, nx), jnp.float32)

    def t_mg(fmg=False):
        t0 = time.perf_counter()
        S, k, res, ok = solve_mg(pyr, tol=1e-6, max_cycles=80, fmg=fmg)
        float(jnp.sum(jnp.abs(S)))
        return time.perf_counter() - t0, k, res, ok

    for fmg in (False, True):
        _, k, res, ok = t_mg(fmg)               # compile
        tmg = float(np.median([t_mg(fmg)[0] for _ in range(3)]))
        print(f"MG{' (fmg)' if fmg else ''} to 1e-6: {tmg*1e3:.1f} ms, "
              f"{k} cycles, res {res:.2e}, ok={ok}")

    def t_sor():
        t0 = time.perf_counter()
        r = solve(spec, S0, None, tol=1e-4, max_iters=60000,
                  check_every=32, tol_type="residual")
        it = int(jnp.max(r.iters))
        return time.perf_counter() - t0, it, float(jnp.max(r.rel_change))

    _, it, rres = t_sor()
    tsor = float(np.median([t_sor()[0] for _ in range(3)]))
    print(f"SOR (windowed kernel) to 1e-4: {tsor*1e3:.1f} ms, {it} sweeps, "
          f"res {rres:.2e}")
    print(f"MG reaches a 100x deeper residual in {tsor/tmg:.1f}x less "
          "time" if tmg < tsor else
          f"(MG {tmg*1e3:.0f} ms vs SOR {tsor*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
