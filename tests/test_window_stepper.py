# -*- coding: utf-8 -*-
"""Fused-norm window stepper (ops/pallas_sor_window.make_window_stepper):
the checked-solve hot path that builds the plan + W stack once and returns
the masked-mean-|S| partial with the sweep launches (SURVEY §7.1 item 2).

Bit-equality of the state vs sor_sweeps_window / the XLA roll path in
interpret mode, the fused norm vs a direct reduction, and the full
convergence loop through solver._solve_impl with kernel="window"."""
import functools

import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import solver, stencil
from xinvert_tpu.ops import pallas_sor_window as win


def _mk(spec, S0, omega, check, **kw):
    """Array-level step_full/step_dyn from the split-state stepper."""
    r = win.make_window_stepper(spec, S0, omega, check, **kw)
    if r is None:
        return None
    split, join, sf, sd = r.split, r.join, r.step_full, r.step_dyn

    def step_full(S):
        st, sa = sf(split(S))
        return join(st), sa

    def step_dyn(S, n):
        st, sa = sd(split(S), n)
        return join(st), sa

    return step_full, step_dyn


def _spec(ny, nx, bcs, mask=False, cross=False, seed=0):
    rng = np.random.default_rng(seed)
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    B = rng.normal(0, 0.2, (ny, nx)) if cross else 0.0
    C = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0, 1, (ny, nx))
    Fdef = np.ones((ny, nx), bool)
    if mask:
        Fdef[ny // 3:ny // 2, nx // 4:nx // 2] = False
        Fdef[5:9, :] = False
    return stencil.standard_2d(jnp.asarray(A), B, jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.3, 1.0), bcs)


@pytest.mark.parametrize("bcs,mask,cross", [
    (("fixed", "fixed"), False, False),
    (("extend", "periodic"), True, False),
    (("extend", "fixed"), False, True),
])
def test_stepper_full_matches_plain_window(bcs, mask, cross):
    ny, nx = 96, 128
    spec = _spec(ny, nx, bcs, mask=mask, cross=cross)
    S0 = jnp.zeros((ny, nx))
    omega, check = 1.5, 7
    step_full, _ = _mk(spec, S0, omega, check, interpret=True)
    S1, sa = step_full(S0)
    ref = win.sor_sweeps_window(spec, S0, omega, check, interpret=True)
    assert np.array_equal(np.asarray(S1), np.asarray(ref)), (
        np.abs(np.asarray(S1) - np.asarray(ref)).max())
    # fused norm partial == total |S'| over the core cells (mean * ncells)
    np.testing.assert_allclose(float(sa), float(jnp.sum(jnp.abs(S1))),
                               rtol=1e-6)


def test_stepper_dyn_matches_plain_window():
    ny, nx = 96, 128
    spec = _spec(ny, nx, ("extend", "periodic"), mask=True)
    S0 = jnp.zeros((ny, nx))
    k = win.window_plan(spec, (ny, nx)).k_sweeps
    _, step_dyn = _mk(spec, S0, 1.4, 3 * k, interpret=True)
    for n in (1, k, k + 1, 2 * k + 2):
        S1, sa = step_dyn(S0, jnp.asarray(n, jnp.int32))
        ref = win.sor_sweeps_window(spec, S0, 1.4, jnp.asarray(n),
                                    interpret=True)
        assert np.array_equal(np.asarray(S1), np.asarray(ref)), n
        np.testing.assert_allclose(float(sa), float(jnp.sum(jnp.abs(S1))),
                                   rtol=1e-6)


def test_stepper_batched_norm_per_slice():
    """Batched state: the fused partial is per-slice (the solver's
    convergence test is per batch element)."""
    ny, nx, B = 96, 128, 3
    rng = np.random.default_rng(5)
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0, 1, (B, ny, nx))
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(A),
                               jnp.asarray(F), jnp.ones((ny, nx), bool),
                               (1.3, 1.0), ("extend", "periodic"))
    S0 = jnp.zeros((B, ny, nx))
    step_full, _ = _mk(spec, S0, 1.5, 6, interpret=True)
    S1, sa = step_full(S0)
    ref = win.sor_sweeps_window(spec, S0, 1.5, 6, interpret=True)
    assert np.array_equal(np.asarray(S1), np.asarray(ref))
    assert sa.shape == (B,)
    np.testing.assert_allclose(
        np.asarray(sa), np.asarray(jnp.sum(jnp.abs(S1), axis=(1, 2))),
        rtol=1e-6)


def test_stepper_row_chunked(monkeypatch):
    """y-row-split domains (result above the scoped-VMEM cap) carry the
    fused norm across chunk calls."""
    monkeypatch.setattr(win, "_RESULT_CAP", 64 * 1024)
    monkeypatch.setattr(win, "_CHUNK_TARGET", 64 * 1024)
    ny, nx = 256, 128
    spec = _spec(ny, nx, ("extend", "periodic"), mask=True, seed=11)
    assert win.window_plan(spec, (ny, nx)).y_chunk < ny
    S0 = jnp.zeros((ny, nx))
    step_full, step_dyn = _mk(spec, S0, 1.4, 9, interpret=True)
    for S1, sa, n in [step_full(S0) + (9,),
                      step_dyn(S0, jnp.asarray(4, jnp.int32)) + (4,)]:
        ref = win.sor_sweeps_window(spec, S0, 1.4, jnp.asarray(n),
                                    interpret=True)
        assert np.array_equal(np.asarray(S1), np.asarray(ref)), n
        np.testing.assert_allclose(float(sa), float(jnp.sum(jnp.abs(S1))),
                                   rtol=1e-6)


def test_stepper_batch_groups(monkeypatch):
    """Batch-group plans carry the full array state with per-group
    prebuilt specs/W/executors — bit-exact vs the per-call path, per-slice
    norms (round 3 extension: these solves previously fell back to the
    W-rebuild-per-check path)."""
    monkeypatch.setattr(win, "_RESULT_CAP", 128 * 1024)
    monkeypatch.setattr(win, "_CHUNK_TARGET", 128 * 1024)
    ny, nx, B = 64, 128, 5
    rng = np.random.default_rng(41)
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0, 1, (B, ny, nx))           # per-slice forcing
    Fdef = np.ones((ny, nx), bool)
    Fdef[11:21, 31:61] = False
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(A),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.3, 1.0), ("extend", "periodic"))
    S0 = jnp.zeros((B, ny, nx))
    plan = win.window_plan(spec, (B, ny, nx))
    assert plan is not None and plan.b_chunk < B
    step_full, step_dyn = _mk(spec, S0, 1.4, 8, interpret=True)
    for S1, sa, n in [step_full(S0) + (8,),
                      step_dyn(S0, jnp.asarray(5, jnp.int32)) + (5,)]:
        ref = win.sor_sweeps_window(spec, S0, 1.4, jnp.asarray(n),
                                    interpret=True)
        assert np.array_equal(np.asarray(S1), np.asarray(ref)), n
        assert sa.shape == (B,)
        np.testing.assert_allclose(
            np.asarray(sa), np.asarray(jnp.sum(jnp.abs(S1), axis=(1, 2))),
            rtol=1e-6)


def _route_solver_through_interpret(monkeypatch):
    monkeypatch.setattr(
        win, "make_window_stepper",
        functools.partial(win.make_window_stepper.__wrapped__
                          if hasattr(win.make_window_stepper, "__wrapped__")
                          else win.make_window_stepper, interpret=True))


def test_checked_solve_fused_norm_matches_xla(monkeypatch):
    """The full convergence loop through kernel="window" + fused norm is
    bit-exact vs the XLA path at the mxLoop cap (tol=0: both run exactly
    max_iters sweeps; the sweeps themselves are bit-identical)."""
    _route_solver_through_interpret(monkeypatch)
    ny, nx = 96, 192           # unique shape: fresh trace under the patch
    spec = _spec(ny, nx, ("extend", "periodic"), mask=True, seed=7)
    S0 = jnp.zeros((ny, nx))
    args = (jnp.asarray(1.5, S0.dtype), jnp.asarray(0.0, S0.dtype),
            jnp.asarray(50, jnp.int32))
    got = solver._solve_jit(spec, S0, *args, check_every=4, kernel="window",
                            scheme="sor", tol_type="change")
    ref = solver._solve_jit(spec, S0, *args, check_every=4, kernel=None,
                            scheme="sor", tol_type="change")
    assert int(got.iters) == int(ref.iters) == 50
    assert np.array_equal(np.asarray(got.S), np.asarray(ref.S))
    np.testing.assert_allclose(float(got.rel_change),
                               float(ref.rel_change), rtol=1e-5)


def test_checked_solve_fused_norm_converges(monkeypatch):
    """With a realistic tolerance the fused-norm loop converges to the
    same solution and (up to the check cadence) the same sweep count."""
    _route_solver_through_interpret(monkeypatch)
    ny, nx = 112, 128          # unique shape: fresh trace under the patch
    spec = _spec(ny, nx, ("fixed", "periodic"), mask=True, seed=9)
    S0 = jnp.zeros((ny, nx))
    args = (jnp.asarray(1.6, S0.dtype), jnp.asarray(1e-7, S0.dtype),
            jnp.asarray(4000, jnp.int32))
    got = solver._solve_jit(spec, S0, *args, check_every=8, kernel="window",
                            scheme="sor", tol_type="change")
    ref = solver._solve_jit(spec, S0, *args, check_every=8, kernel=None,
                            scheme="sor", tol_type="change")
    assert int(got.iters) < 4000 and int(ref.iters) < 4000
    # the fused partial and jnp.mean differ only in summation order; the
    # stopping decision may shift by at most one check window
    assert abs(int(got.iters) - int(ref.iters)) <= 8
    np.testing.assert_allclose(np.asarray(got.S), np.asarray(ref.S),
                               rtol=2e-5, atol=1e-7)


def test_checked_solve_batch_group_freeze(monkeypatch):
    """Batch-GROUP plans (b_chunk < B) in the full convergence loop: the
    stepper's custom `freeze` re-slices `done` per group tuple (round 4:
    solver.frz_state consumes WindowStepper.freeze).  Elements converging
    at very different times must freeze bit-correctly."""
    _route_solver_through_interpret(monkeypatch)
    monkeypatch.setattr(win, "_RESULT_CAP", 128 * 1024)
    monkeypatch.setattr(win, "_CHUNK_TARGET", 128 * 1024)
    ny, nx, B = 64, 144, 5     # unique shape: fresh trace under the patch
    rng = np.random.default_rng(33)
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    # very different forcing scales -> very different convergence times
    F = np.stack([10.0 ** (i - 2) * rng.normal(0, 1, (ny, nx))
                  for i in range(B)])
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(A),
                               jnp.asarray(F), jnp.ones((ny, nx), bool),
                               (1.3, 1.0), ("extend", "periodic"))
    S0 = jnp.zeros((B, ny, nx))
    plan = win.window_plan(spec, (B, ny, nx))
    assert plan is not None and plan.b_chunk < B
    args = (jnp.asarray(1.6, S0.dtype), jnp.asarray(1e-6, S0.dtype),
            jnp.asarray(3000, jnp.int32))
    got = solver._solve_jit(spec, S0, *args, check_every=8, kernel="window",
                            scheme="sor", tol_type="change")
    ref = solver._solve_jit(spec, S0, *args, check_every=8, kernel=None,
                            scheme="sor", tol_type="change")
    assert np.all(np.abs(np.asarray(got.iters) - np.asarray(ref.iters)) <= 8)
    np.testing.assert_allclose(np.asarray(got.S), np.asarray(ref.S),
                               rtol=2e-5, atol=1e-7)


def test_checked_solve_fused_norm_batched_freeze(monkeypatch):
    """Batch elements converging at different times freeze correctly in
    the split-state carry (tree_map where over chunk leaves)."""
    _route_solver_through_interpret(monkeypatch)
    ny, nx = 96, 160           # unique shape: fresh trace under the patch
    rng = np.random.default_rng(21)
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    # very different forcing scales -> very different convergence times
    F = np.stack([rng.normal(0, 1, (ny, nx)),
                  1e-3 * rng.normal(0, 1, (ny, nx)),
                  10.0 * rng.normal(0, 1, (ny, nx))])
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(A),
                               jnp.asarray(F), jnp.ones((ny, nx), bool),
                               (1.3, 1.0), ("extend", "periodic"))
    S0 = jnp.zeros((3, ny, nx))
    args = (jnp.asarray(1.6, S0.dtype), jnp.asarray(1e-6, S0.dtype),
            jnp.asarray(3000, jnp.int32))
    got = solver._solve_jit(spec, S0, *args, check_every=8, kernel="window",
                            scheme="sor", tol_type="change")
    ref = solver._solve_jit(spec, S0, *args, check_every=8, kernel=None,
                            scheme="sor", tol_type="change")
    # per-element iteration counts may shift by one check window at most
    assert np.all(np.abs(np.asarray(got.iters) - np.asarray(ref.iters)) <= 8)
    np.testing.assert_allclose(np.asarray(got.S), np.asarray(ref.S),
                               rtol=2e-5, atol=1e-7)
