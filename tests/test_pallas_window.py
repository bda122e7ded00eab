# -*- coding: utf-8 -*-
"""Windowed >VMEM SOR kernel (ops/pallas_sor_window.py): bit-equality with
the XLA roll path in interpret mode, across BC combinations, masks, cross
offsets, and non-multiple sweep counts."""
import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import stencil, solver
from xinvert_tpu.ops.pallas_sor_window import (sor_sweeps_window, window_plan,
                                               window_applicable)


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
    (("fixed", "periodic"), True, False),
    (("extend", "periodic"), True, False),
    (("extend", "fixed"), False, True),
    (("fixed", "periodic"), True, True),
])
def test_window_matches_xla(bcs, mask, cross):
    ny, nx = 96, 128
    spec = _spec(ny, nx, bcs, mask=mask, cross=cross)
    S0 = jnp.zeros((ny, nx))
    omega = 1.5
    n = 10
    ref = solver.solve_fixed(spec, S0, omega, n, use_pallas=False)
    out = sor_sweeps_window(spec, S0, omega, n, interpret=True)
    assert np.array_equal(np.asarray(out), np.asarray(ref)), (
        np.abs(np.asarray(out) - np.asarray(ref)).max())


def test_window_nonmultiple_sweep_count():
    """The SMEM count clamps the last chunk: any n is bit-exact."""
    ny, nx = 96, 128
    spec = _spec(ny, nx, ("extend", "periodic"), mask=True)
    S0 = jnp.zeros((ny, nx))
    tile, k, halo = window_plan(spec, (ny, nx))
    for n in (1, k - 1, k + 1, 3 * k + 2):
        if n < 1:
            continue
        ref = solver.solve_fixed(spec, S0, 1.4, n, use_pallas=False)
        out = sor_sweeps_window(spec, S0, 1.4, n, interpret=True)
        assert np.array_equal(np.asarray(out), np.asarray(ref)), n


def test_window_plan_properties():
    spec = _spec(2048, 128, ("extend", "periodic"))
    plan = window_plan(spec, (2048, 128))
    assert plan is not None
    tile, k, halo = plan
    assert 2048 % tile == 0 and tile % 8 == 0
    assert halo >= 2 * k                      # covers the k-sweep cone
    assert halo % 8 == 0

    # batched shapes ride the leading grid dim (round 2); the whole
    # stacked result must still fit the raised scoped-VMEM budget
    assert window_applicable(spec, (4, 2048, 128))
    assert not window_applicable(spec, (4096, 2048, 128))


def test_window_applicability_vs_vmem():
    """Problems that fit VMEM keep the resident kernel; larger ones get a
    window plan (checked at the f32 sizes the TPU dispatch sees)."""
    from xinvert_tpu.ops.pallas_sor import pallas_applicable
    small = _spec(96, 128, ("fixed", "fixed"))
    small32 = stencil.StencilSpec(
        w=small.w.astype(jnp.float32), w0=small.w0.astype(jnp.float32),
        g=small.g.astype(jnp.float32), relax=small.relax.astype(jnp.float32),
        active=small.active, offsets=small.offsets, bcs=small.bcs,
        bih=small.bih, stop_on_zero_norm=small.stop_on_zero_norm)
    assert pallas_applicable(small32, (96, 128))
    assert not window_applicable(small32, (96, 128))


def test_window_squeezes_unit_batch():
    """A leading size-1 batch dim (the bench harness shape) squeezes away."""
    ny, nx = 96, 128
    spec = _spec(ny, nx, ("extend", "periodic"), mask=True)
    import dataclasses
    import jax.numpy as jnp
    specB = dataclasses.replace(
        spec, w0=spec.w0[None], g=spec.g[None], relax=spec.relax[None],
        active=spec.active[None])
    S0 = jnp.zeros((1, ny, nx))
    assert window_plan(specB, (1, ny, nx)) is not None
    out = sor_sweeps_window(spec, S0, 1.4, 6, interpret=True)
    ref = solver.solve_fixed(spec, jnp.zeros((ny, nx)), 1.4, 6,
                             use_pallas=False)
    assert np.array_equal(np.asarray(out)[0], np.asarray(ref))


@pytest.mark.parametrize("shared_weights", [True, False])
def test_window_batched_matches_xla(shared_weights):
    """Batch slices ride the leading grid dim — bit-exact vs XLA for both
    shared (broadcast) and per-slice coefficient planes."""
    ny, nx, B = 96, 128, 3
    rng = np.random.default_rng(3)
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    C = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0, 1, (ny, nx) if shared_weights else (B, ny, nx))
    Fdef = np.ones((ny, nx), bool)
    Fdef[10:20, 30:60] = False
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.3, 1.0), ("extend", "periodic"))
    S0 = jnp.zeros((B, ny, nx))
    ref = solver.solve_fixed(spec, S0, 1.5, 9, use_pallas=False)
    out = sor_sweeps_window(spec, S0, 1.5, 9, interpret=True)
    assert np.array_equal(np.asarray(out), np.asarray(ref)), (
        np.abs(np.asarray(out) - np.asarray(ref)).max())


def test_window_batched_extra_leading_dims():
    """Two non-core dims flatten onto the grid and reshape back."""
    ny, nx = 96, 128
    spec = _spec(ny, nx, ("fixed", "periodic"), mask=True)
    S0 = jnp.zeros((2, 2, ny, nx))
    ref = solver.solve_fixed(spec, S0, 1.5, 7, use_pallas=False)
    out = sor_sweeps_window(spec, S0, 1.5, 7, interpret=True)
    assert out.shape == (2, 2, ny, nx)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_window_extend_fold_close(monkeypatch):
    """FOLD_EXTEND=True folds the extend row copies into the weights: same
    fixed point and same iteration up to one fp reassociation per folded
    row (not bit-exact — that's why it is off by default)."""
    from xinvert_tpu.ops import pallas_sor_window as win
    ny, nx = 96, 128
    spec = _spec(ny, nx, ("extend", "periodic"), mask=True)
    S0 = jnp.zeros((ny, nx))
    ref = solver.solve_fixed(spec, S0, 1.5, 20, use_pallas=False)
    monkeypatch.setattr(win, "FOLD_EXTEND", True)
    out = sor_sweeps_window(spec, S0, 1.5, 20, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
