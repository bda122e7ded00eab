# -*- coding: utf-8 -*-
"""Tiled communication-avoiding Pallas kernel: interior results must be
bit-exact vs the global XLA sweep (interpret mode on CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import stencil
from xinvert_tpu.solver import _solve_fixed_xla
from xinvert_tpu.ops.pallas_sor_tiled import sor_sweeps_tiled


def _problem(bcs, ny=256, nx=64, mask=True, seed=0):
    rng = np.random.default_rng(seed)
    A = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    C = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0.0, 1.0, (ny, nx))
    Fdef = np.ones((ny, nx), bool)
    if mask:
        Fdef[60:80, 10:30] = False
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.1e5, 1.0e5), bcs, include_cross=False)
    return spec, jnp.zeros((ny, nx))


@pytest.mark.parametrize("bcs,k", [
    (("fixed", "fixed"), 2),
    (("fixed", "periodic"), 2),
    (("extend", "periodic"), 2),
    (("extend", "periodic"), 4),
])
def test_tiled_matches_global(bcs, k):
    spec, S0 = _problem(bcs)
    ref = np.asarray(_solve_fixed_xla(spec, S0, 1.6, 8))
    out = sor_sweeps_tiled(spec, S0, 1.6, 8, k_sweeps=k, tile=64,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10,
                               atol=1e-10 * np.abs(ref).max())


def test_tiled_biharmonic():
    rng = np.random.default_rng(5)
    ny, nx = 256, 48
    shape = (ny, nx)
    A4 = np.full(shape, 5e3)
    zero = np.zeros(shape)
    D = np.full(shape, -1e-6)
    H = np.full(shape, -1.8e-11)
    J = rng.normal(0, 1e-7, shape)
    spec = stencil.general_2d_bih(
        jnp.asarray(A4), zero + 1e2, jnp.asarray(A4), jnp.asarray(D), zero,
        jnp.asarray(D), zero, jnp.asarray(H), zero, jnp.asarray(J),
        jnp.ones(shape, bool), (5e4, 5e4), ("extend", "periodic"))
    S0 = jnp.zeros(shape)
    ref = np.asarray(_solve_fixed_xla(spec, S0, 1.0, 4))
    out = sor_sweeps_tiled(spec, S0, 1.0, 4, k_sweeps=2, tile=64,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10,
                               atol=1e-10 * np.abs(ref).max())
