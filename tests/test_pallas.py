# -*- coding: utf-8 -*-
"""Pallas fused-sweep kernel parity vs the XLA roll path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import stencil
from xinvert_tpu.solver import _solve_fixed_xla
from xinvert_tpu.ops.pallas_sor import sor_sweeps_pallas, pallas_applicable


def _standard(bcs, batch=0, seed=0, cross=False):
    rng = np.random.default_rng(seed)
    yc, xc = 14, 18
    A = np.abs(rng.normal(1.0, 0.1, (yc, xc))) + 0.5
    B = rng.normal(0.0, 0.05, (yc, xc)) if cross else np.zeros((yc, xc))
    C = np.abs(rng.normal(1.0, 0.1, (yc, xc))) + 0.5
    shape = ((batch, yc, xc) if batch else (yc, xc))
    F = rng.normal(0.0, 1.0, shape)
    Fdef = np.ones((yc, xc), bool)
    Fdef[4:6, 3:7] = False
    spec = stencil.standard_2d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.1e5, 1.0e5), bcs, include_cross=cross)
    return spec, jnp.zeros(shape)


@pytest.mark.parametrize("bcs,cross,batch", [
    (("fixed", "fixed"), False, 0),
    (("fixed", "periodic"), False, 0),
    (("extend", "periodic"), False, 0),
    (("extend", "fixed"), False, 0),
    (("fixed", "periodic"), True, 0),
    (("extend", "periodic"), False, 3),
])
def test_pallas_matches_xla_standard(bcs, cross, batch):
    spec, S0 = _standard(bcs, batch=batch, cross=cross)
    assert pallas_applicable(spec, S0.shape)
    ref = _solve_fixed_xla(spec, S0, 1.4, 25)
    out = sor_sweeps_pallas(spec, S0, 1.4, 25, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("bcs", [
    ("fixed", "fixed"),
    ("fixed", "periodic"),
    ("extend", "fixed"),
    ("extend", "periodic"),
])
def test_pallas_matches_xla_biharmonic(bcs):
    rng = np.random.default_rng(5)
    yc, xc = 16, 20
    shape = (yc, xc)
    A4 = np.full(shape, 5e3)
    zero = np.zeros(shape)
    D = np.full(shape, -1e-6)
    H = np.full(shape, -1.8e-11)
    J = rng.normal(0, 1e-7, shape)
    spec = stencil.general_2d_bih(
        jnp.asarray(A4), zero + 1e2, jnp.asarray(A4), jnp.asarray(D), zero,
        jnp.asarray(D), zero, jnp.asarray(H), zero, jnp.asarray(J),
        jnp.ones(shape, bool), (5e4, 5e4), bcs)
    S0 = jnp.zeros(shape)
    ref = _solve_fixed_xla(spec, S0, 1.0, 20)
    out = sor_sweeps_pallas(spec, S0, 1.0, 20, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-18)


def test_pallas_general_2d():
    rng = np.random.default_rng(7)
    yc, xc = 14, 18
    shape = (yc, xc)
    A = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    B = rng.normal(0.0, 0.02, shape)
    C = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    D = rng.normal(0, 1e-6, shape)
    E = rng.normal(0, 1e-6, shape)
    Fc = -np.abs(rng.normal(1e-10, 1e-11, shape))
    G = rng.normal(0, 1.0, shape)
    spec = stencil.general_2d(*map(jnp.asarray, (A, B, C, D, E, Fc, G)),
                              jnp.ones(shape, bool), (1.1e5, 1.0e5),
                              ("fixed", "periodic"))
    S0 = jnp.zeros(shape)
    ref = _solve_fixed_xla(spec, S0, 1.3, 30)
    out = sor_sweeps_pallas(spec, S0, 1.3, 30, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)
