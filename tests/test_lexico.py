# -*- coding: utf-8 -*-
"""Fixed-iteration parity: the lexicographic executor must reproduce the
reference's exact iterate sequence (numpy oracle implementing
numbas.py:216-416) after EVERY sweep — the BASELINE 'allclose at fixed
iteration count' target."""
import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import stencil
from xinvert_tpu.lexico import solve_fixed_lexicographic
from oracle import sor_standard_2d

UNDEF = -9.99e8


def _problem(yc, xc, seed=0, mask=False, cross=False):
    rng = np.random.default_rng(seed)
    A = np.abs(rng.normal(1.0, 0.1, (yc, xc))) + 0.5
    B = rng.normal(0.0, 0.05, (yc, xc)) if cross else np.zeros((yc, xc))
    C = np.abs(rng.normal(1.0, 0.1, (yc, xc))) + 0.5
    F = rng.normal(0.0, 1.0, (yc, xc))
    Fdef = np.ones((yc, xc), bool)
    if mask:
        Fdef[yc // 3:yc // 2, xc // 4:xc // 2] = False
    return A, B, C, F, Fdef


@pytest.mark.parametrize("bcy,bcx,mask,cross", [
    ("fixed", "fixed", False, False),
    ("fixed", "periodic", False, False),
    ("extend", "periodic", True, False),
    ("fixed", "fixed", True, True),
    ("extend", "fixed", False, False),
])
def test_lexicographic_matches_oracle_per_iteration(bcy, bcx, mask, cross):
    yc, xc = 17, 23
    dely, delx = 1.1e5, 1.0e5
    A, B, C, F, Fdef = _problem(yc, xc, seed=11, mask=mask, cross=cross)
    omega = 1.4
    spec = stencil.standard_2d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (dely, delx), (bcy, bcx),
                               include_cross=cross)
    Fm = np.where(Fdef, F, UNDEF)
    for iters in (1, 2, 7):
        ref = sor_standard_2d(np.zeros((yc, xc)), A, B, C, Fm, dely, delx,
                              bcy, bcx, omega, UNDEF, n_iters=iters, tol=0.0)
        got = np.asarray(solve_fixed_lexicographic(
            spec, jnp.zeros((yc, xc)), omega, iters))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(got, ref, rtol=1e-12,
                                   atol=1e-12 * scale,
                                   err_msg=f"iters={iters}")


def test_lexicographic_rejects_biharmonic():
    rng = np.random.default_rng(1)
    shape = (16, 20)
    A4 = np.full(shape, 5e3)
    zero = np.zeros(shape)
    spec = stencil.general_2d_bih(
        jnp.asarray(A4), zero, jnp.asarray(A4), zero, zero, zero, zero,
        zero, zero, jnp.asarray(rng.normal(0, 1e-7, shape)),
        jnp.ones(shape, bool), (5e4, 5e4), ("fixed", "fixed"))
    with pytest.raises(ValueError):
        solve_fixed_lexicographic(spec, jnp.zeros(shape), 1.0, 2)
