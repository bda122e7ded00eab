# -*- coding: utf-8 -*-
"""Cyclic Chebyshev on the windowed Pallas kernel
(pallas_sor_window.make_window_cheby_stepper): the per-half-sweep factors
ride into the kernel through SMEM, removing round 2's cheby/kernel mutual
exclusivity (solver.py forced scheme='cheby' onto the XLA roll path).

Interpret-mode bit-equality vs solve_fixed_cheby (the XLA reference), the
recurrence threading across check windows, and the full convergence loop."""
import functools

import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import solver, stencil
from xinvert_tpu.solver import solve_fixed_cheby
from xinvert_tpu.ops import pallas_sor_window as win


def _spec(ny, nx, bcs, mask=False, cross=False, seed=0):
    rng = np.random.default_rng(seed)
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    B = rng.normal(0, 0.2, (ny, nx)) if cross else 0.0
    C = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0, 1, (ny, nx))
    Fdef = np.ones((ny, nx), bool)
    if mask:
        Fdef[ny // 3:ny // 2, nx // 4:nx // 2] = False
    return stencil.standard_2d(jnp.asarray(A), B, jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.3, 1.0), bcs)


def _mk(spec, S0, omega, check):
    r = win.make_window_cheby_stepper(spec, S0, omega, check,
                                      interpret=True)
    assert r is not None
    split, join, sf, sd = r.split, r.join, r.step_full, r.step_dyn

    def step_full(S, m, w):
        st, m, w, sa = sf(split(S), m, w)
        return join(st), m, w, sa

    def step_dyn(S, m, w, n):
        st, m, w, sa = sd(split(S), m, w, n)
        return join(st), m, w, sa

    return step_full, step_dyn


def _init_mw(dtype=jnp.float64):
    return jnp.zeros((), jnp.int32), jnp.ones((), dtype)


@pytest.mark.parametrize("bcs,mask,cross", [
    (("fixed", "fixed"), False, False),
    (("extend", "periodic"), True, False),
    (("extend", "fixed"), False, True),
])
def test_cheby_window_matches_xla(bcs, mask, cross):
    ny, nx = 96, 128
    spec = _spec(ny, nx, bcs, mask=mask, cross=cross)
    S0 = jnp.zeros((ny, nx))
    omega, n = 1.6, 9
    step_full, _ = _mk(spec, S0, omega, n)
    m, w = _init_mw(S0.dtype)
    S1, m1, w1, sa = step_full(S0, m, w)
    ref = solve_fixed_cheby(spec, S0, omega, n)
    assert np.array_equal(np.asarray(S1), np.asarray(ref)), (
        np.abs(np.asarray(S1) - np.asarray(ref)).max())
    assert int(m1) == 2 * n
    np.testing.assert_allclose(float(sa), float(jnp.sum(jnp.abs(S1))),
                               rtol=1e-12)


def test_cheby_window_recurrence_threads_across_windows():
    """Two consecutive step_full windows == one solve_fixed_cheby run of
    the combined length (the (m, w) state continues, not restarts)."""
    ny, nx = 96, 128
    spec = _spec(ny, nx, ("extend", "periodic"), mask=True, seed=3)
    S0 = jnp.zeros((ny, nx))
    omega, check = 1.7, 6
    step_full, _ = _mk(spec, S0, omega, check)
    m, w = _init_mw(S0.dtype)
    S1, m, w, _ = step_full(S0, m, w)
    S2, m, w, _ = step_full(S1, m, w)
    ref = solve_fixed_cheby(spec, S0, omega, 2 * check)
    assert np.array_equal(np.asarray(S2), np.asarray(ref))
    assert int(m) == 4 * check


def test_cheby_window_dyn_counts():
    ny, nx = 96, 128
    spec = _spec(ny, nx, ("fixed", "periodic"), seed=5)
    S0 = jnp.zeros((ny, nx))
    k = win.window_plan(spec, (ny, nx)).k_sweeps
    _, step_dyn = _mk(spec, S0, 1.5, 3 * k)
    m0, w0 = _init_mw(S0.dtype)
    for n in (1, k, k + 1, 2 * k + 2):
        S1, m1, w1, _ = step_dyn(S0, m0, w0, jnp.asarray(n, jnp.int32))
        ref = solve_fixed_cheby(spec, S0, 1.5, n)
        assert np.array_equal(np.asarray(S1), np.asarray(ref)), n
        assert int(m1) == 2 * n


def test_cheby_checked_solve_through_kernel(monkeypatch):
    """Full convergence loop: scheme='cheby' with kernel='window' is
    bit-exact vs the XLA cheby path at the mxLoop cap."""
    monkeypatch.setattr(
        win, "make_window_cheby_stepper",
        functools.partial(win.make_window_cheby_stepper, interpret=True))
    ny, nx = 96, 224           # unique shape: fresh trace under the patch
    spec = _spec(ny, nx, ("extend", "periodic"), mask=True, seed=7)
    S0 = jnp.zeros((ny, nx))
    args = (jnp.asarray(1.6, S0.dtype), jnp.asarray(0.0, S0.dtype),
            jnp.asarray(50, jnp.int32))
    got = solver._solve_jit(spec, S0, *args, check_every=8,
                            kernel="window", scheme="cheby",
                            tol_type="change")
    ref = solver._solve_jit(spec, S0, *args, check_every=8, kernel=None,
                            scheme="cheby", tol_type="change")
    assert int(got.iters) == int(ref.iters) == 50
    assert np.array_equal(np.asarray(got.S), np.asarray(ref.S))
