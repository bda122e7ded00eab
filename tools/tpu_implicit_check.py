# -*- coding: utf-8 -*-
"""On-chip check of the differentiable solve (ops/implicit.py): the
adjoint pass is one transpose-stencil solve, so `jax.grad` through a
2048^2 masked Poisson inversion should cost ~2 forward solves at kernel
speed.  Validates the gradient against a directional finite difference
(two extra forward solves) and times forward vs value_and_grad.

    python tools/tpu_implicit_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    print("backend:", jax.default_backend())
    import dataclasses
    from __graft_entry__ import _poisson_problem
    from xinvert_tpu import solve_implicit

    ny = nx = 2048
    spec, S0, grid = _poisson_problem(batch=0, ny=ny, nx=nx,
                                      dtype=np.float32)
    om = np.float32(grid.omega_opt)
    rng = np.random.default_rng(0)
    cvec = jnp.asarray(rng.normal(0, 1, (ny, nx)).astype(np.float32))

    def loss(g):
        sp = dataclasses.replace(spec, g=g)
        S = solve_implicit(sp, S0, omega=om, tol=1e-7, max_iters=20000,
                           check_every=32)
        return jnp.sum(S * cvec)

    t0 = time.perf_counter()
    L = float(loss(spec.g))
    t_fwd = time.perf_counter() - t0
    print(f"forward loss {L:.6e}  ({t_fwd:.1f}s first call)")

    t0 = time.perf_counter()
    L2, g_bar = jax.value_and_grad(loss)(spec.g)
    t_grad = time.perf_counter() - t0
    print(f"value_and_grad first call {t_grad:.1f}s")
    t0 = time.perf_counter()
    L2, g_bar = jax.value_and_grad(loss)(spec.g)
    jax.block_until_ready(g_bar)
    t_grad2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loss(spec.g))
    t_fwd2 = time.perf_counter() - t0
    print(f"steady: forward {t_fwd2:.2f}s, value_and_grad {t_grad2:.2f}s "
          f"({t_grad2 / max(t_fwd2, 1e-9):.2f}x forward)")

    # directional FD check: d/dt L(g + t*dg) at t=0 vs <g_bar, dg>
    dg = jnp.asarray(rng.normal(0, 1, (ny, nx)).astype(np.float32))
    dg = jnp.where(spec.active, dg, 0.0)
    eps = np.float32(1e-3)
    Lp = float(loss(spec.g + eps * dg))
    Lm = float(loss(spec.g - eps * dg))
    fd = (Lp - Lm) / (2 * float(eps))
    an = float(jnp.vdot(g_bar, dg))
    rel = abs(fd - an) / max(abs(an), 1e-30)
    print(f"directional FD {fd:.6e} vs adjoint {an:.6e}  rel err {rel:.2e}")
    assert rel < 2e-2, rel       # f32 solve + f32 FD: percent-level match
    print("OK: adjoint gradient matches the directional derivative "
          "on-chip")


if __name__ == "__main__":
    main()
