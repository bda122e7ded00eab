# -*- coding: utf-8 -*-
"""3-D fused checked-solve stepper (pallas_sor3d_window.make_window3d_stepper):
split-state round trips, step parity vs sor_sweeps_window3d, the XLA norm
over split chunks, and the full convergence loop with kernel="window3d"."""
import functools

import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import stencil, solver
from xinvert_tpu.ops import pallas_sor3d_window as w3


def _standard3d(bcs, batch=0, seed=0, shape3=(24, 16, 20)):
    rng = np.random.default_rng(seed)
    A = np.abs(rng.normal(1.0, 0.1, shape3)) + 0.5
    B = np.abs(rng.normal(1.0, 0.1, shape3)) + 0.5
    C = np.abs(rng.normal(1.0, 0.1, shape3)) + 0.5
    shape = ((batch,) + shape3 if batch else shape3)
    F = rng.normal(0.0, 1.0, shape)
    Fdef = np.ones(shape3, bool)
    Fdef[8:16, 5:10, 4:8] = False
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (5e3, 1.1e5, 1.0e5), bcs)
    return spec, jnp.zeros(shape)


def _mk(spec, S0, omega, check, **kw):
    r = w3.make_window3d_stepper(spec, S0, omega, check, **kw)
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


@pytest.mark.parametrize("bcs,batch", [
    (("fixed", "fixed", "fixed"), 0),
    (("fixed", "extend", "periodic"), 0),
    (("fixed", "extend", "periodic"), 2),
])
def test_stepper3d_matches_plain(bcs, batch):
    spec, S0 = _standard3d(bcs, batch=batch)
    check = 7
    mk = _mk(spec, S0, 1.2, check, interpret=True)
    assert mk is not None
    step_full, step_dyn = mk
    S1, sa = step_full(S0)
    ref = w3.sor_sweeps_window3d(spec, S0, 1.2, check, interpret=True)
    assert np.array_equal(np.asarray(S1), np.asarray(ref))
    axes = tuple(range(-3, 0))
    np.testing.assert_allclose(
        np.asarray(sa), np.asarray(jnp.sum(jnp.abs(S1), axis=axes)),
        rtol=1e-6)
    S2, sa2 = step_dyn(S0, jnp.asarray(5, jnp.int32))
    ref2 = w3.sor_sweeps_window3d(spec, S0, 1.2, jnp.asarray(5),
                                  interpret=True)
    assert np.array_equal(np.asarray(S2), np.asarray(ref2))


def test_stepper3d_level_chunked(monkeypatch):
    """Level-split plans carry the split state; norm sums the chunks."""
    spec, S0 = _standard3d(("fixed", "extend", "periodic"), shape3=(48, 18, 20),
                           seed=3)
    slab = int(np.prod(S0.shape[-2:])) * S0.dtype.itemsize
    monkeypatch.setattr(w3, "_RESULT_CAP", 4 * slab)
    monkeypatch.setattr(w3, "_CHUNK_TARGET", 16 * slab)
    plan, perm = w3.window3d_plan_any(spec, S0.shape)
    assert plan is not None and plan.z_chunk < plan.nzp
    step_full, _ = _mk(spec, S0, 1.2, 9, interpret=True)
    S1, sa = step_full(S0)
    ref = w3.sor_sweeps_window3d(spec, S0, 1.2, 9, interpret=True)
    assert np.array_equal(np.asarray(S1), np.asarray(ref))
    np.testing.assert_allclose(float(sa), float(jnp.sum(jnp.abs(S1))),
                               rtol=1e-6)


def test_stepper3d_permuted_wide_flat():
    """Wide-flat volumes (z<->y permuted windowing) round-trip through the
    stepper's split/join and match the plain path."""
    spec, S0 = _standard3d(("fixed", "extend", "fixed"), shape3=(6, 64, 40),
                           seed=5)
    planned = w3.window3d_plan_any(spec, S0.shape)
    assert planned is not None and planned[1], "expected the permuted plan"
    mk = _mk(spec, S0, 1.3, 6, interpret=True)
    assert mk is not None
    step_full, _ = mk
    S1, sa = step_full(S0)
    ref = w3.sor_sweeps_window3d(spec, S0, 1.3, 6, interpret=True)
    assert np.array_equal(np.asarray(S1), np.asarray(ref))
    np.testing.assert_allclose(float(sa), float(jnp.sum(jnp.abs(S1))),
                               rtol=1e-6)


def test_checked_solve3d_through_stepper(monkeypatch):
    """Full convergence loop with kernel="window3d" + the 3-D stepper is
    bit-exact vs the XLA path at the mxLoop cap."""
    monkeypatch.setattr(
        w3, "make_window3d_stepper",
        functools.partial(w3.make_window3d_stepper, interpret=True))
    spec, S0 = _standard3d(("fixed", "extend", "periodic"),
                           shape3=(24, 16, 24), seed=9)  # unique shape
    args = (jnp.asarray(1.2, S0.dtype), jnp.asarray(0.0, S0.dtype),
            jnp.asarray(40, jnp.int32))
    got = solver._solve_jit(spec, S0, *args, check_every=6,
                            kernel="window3d", scheme="sor",
                            tol_type="change")
    ref = solver._solve_jit(spec, S0, *args, check_every=6, kernel=None,
                            scheme="sor", tol_type="change")
    assert int(got.iters) == int(ref.iters) == 40
    np.testing.assert_allclose(np.asarray(got.S), np.asarray(ref.S),
                               rtol=1e-10, atol=1e-10)
