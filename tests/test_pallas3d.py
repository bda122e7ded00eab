# -*- coding: utf-8 -*-
"""3-D VMEM-resident Pallas kernel parity vs the XLA roll path (interpret
mode on CPU; the same kernel compiles via Mosaic on TPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import stencil
from xinvert_tpu.solver import _solve_fixed_xla
from xinvert_tpu.ops.pallas_sor3d import (sor_sweeps_pallas3d,
                                          pallas3d_applicable)


def _standard3d(bcs, batch=0, seed=0):
    rng = np.random.default_rng(seed)
    zc, yc, xc = 6, 10, 14
    shape3 = (zc, yc, xc)
    A = np.abs(rng.normal(1.0, 0.1, shape3)) + 0.5
    B = np.abs(rng.normal(1.0, 0.1, shape3)) + 0.5
    C = np.abs(rng.normal(1.0, 0.1, shape3)) + 0.5
    shape = ((batch,) + shape3 if batch else shape3)
    F = rng.normal(0.0, 1.0, shape)
    Fdef = np.ones(shape3, bool)
    Fdef[2:4, 3:5, 4:8] = False
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (5e3, 1.1e5, 1.0e5), bcs)
    return spec, jnp.zeros(shape)


@pytest.mark.parametrize("bcs,batch", [
    (("fixed", "fixed", "fixed"), 0),
    (("fixed", "fixed", "periodic"), 0),
    (("fixed", "extend", "periodic"), 0),
    (("fixed", "extend", "fixed"), 0),
    (("fixed", "extend", "periodic"), 3),
])
def test_pallas3d_matches_xla_standard(bcs, batch):
    spec, S0 = _standard3d(bcs, batch=batch)
    assert pallas3d_applicable(spec, S0.shape)
    ref = _solve_fixed_xla(spec, S0, 1.2, 25)
    out = sor_sweeps_pallas3d(spec, S0, 1.2, 25, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)


def test_pallas3d_general():
    rng = np.random.default_rng(7)
    shape = (5, 12, 16)
    A = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    B = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    C = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    D = rng.normal(0, 1e-6, shape)
    E = rng.normal(0, 1e-6, shape)
    Fc = rng.normal(0, 1e-6, shape)
    G = -np.abs(rng.normal(1e-10, 1e-11, shape))
    H = rng.normal(0, 1.0, shape)
    spec = stencil.general_3d(*map(jnp.asarray, (A, B, C, D, E, Fc, G, H)),
                              jnp.ones(shape, bool), (5e3, 1.1e5, 1.0e5),
                              ("fixed", "fixed", "periodic"))
    S0 = jnp.zeros(shape)
    ref = _solve_fixed_xla(spec, S0, 1.2, 30)
    out = sor_sweeps_pallas3d(spec, S0, 1.2, 30, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)


def test_dispatch_selects_vmem3d(monkeypatch):
    """On a TPU backend, an f32 3-D problem that fits the raised budget
    dispatches to the VMEM-resident 3-D kernel; f64 stays on XLA."""
    import jax
    from xinvert_tpu import solver

    spec, S0 = _standard3d(("fixed", "extend", "periodic"))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    spec32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a, spec)
    assert solver._select_kernel(spec32, S0.astype(jnp.float32)) == "vmem3d"
    assert solver._select_kernel(spec, S0.astype(jnp.float64)) is None


def test_pallas3d_not_applicable_2d():
    rng = np.random.default_rng(1)
    shape = (10, 14)
    A = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    spec = stencil.standard_2d(jnp.asarray(A), jnp.zeros(shape),
                               jnp.asarray(A), jnp.asarray(
                                   rng.normal(0, 1, shape)),
                               jnp.ones(shape, bool), (1e5, 1e5),
                               ("fixed", "fixed"))
    assert not pallas3d_applicable(spec, shape)
