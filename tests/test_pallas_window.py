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
    k = window_plan(spec, (ny, nx)).k_sweeps
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
    tile, k, halo = plan.tile, plan.k_sweeps, plan.halo
    assert 2048 % tile == 0 and tile % 8 == 0
    assert halo >= 2 * k                      # covers the k-sweep cone
    assert halo % 8 == 0
    assert tile > halo                        # interior windows edge-free
    assert plan.y_chunk == 2048 and plan.b_chunk == 1   # single call

    # batched shapes ride the leading grid dim (round 2); beyond the
    # scoped-VMEM result cap the step splits into chunk calls, bounded at
    # _MAX_CHUNKS — absurd batch counts still fall back to XLA
    assert window_applicable(spec, (4, 2048, 128))
    assert not window_applicable(spec, (4096, 2048, 128))


def test_window_plan_chunked_shapes():
    """Beyond the result cap the plan splits: y-row chunks for one huge
    slice, batch groups for many moderate slices (f32 — the TPU dtype)."""
    from xinvert_tpu.ops.pallas_sor_window import (_RESULT_CAP,
                                                   _CHUNK_TARGET)

    def f32spec(ny, nx):
        # the plan reads only dtype/offsets/bcs/bih from the spec, so a
        # small spec stands in for the huge grid (building real 8192^2
        # coefficient planes took ~13 min of the CPU suite)
        import dataclasses
        s = _spec(64, 64, ("extend", "periodic"))
        return dataclasses.replace(
            s, w=s.w.astype(jnp.float32), w0=s.w0.astype(jnp.float32),
            g=s.g.astype(jnp.float32), relax=s.relax.astype(jnp.float32))

    # 8192^2 f32 = 256 MiB result: y-chunked, per-call result <= target
    plan = window_plan(f32spec(8192, 8192), (8192, 8192))
    assert plan is not None and plan.y_chunk < 8192
    assert plan.y_chunk % plan.tile == 0
    assert plan.y_chunk * 8192 * 4 <= _CHUNK_TARGET
    assert plan.tile > plan.halo

    # 64 x 1024^2 f32 = 256 MiB: batch groups of full-height slices
    plan = window_plan(f32spec(1024, 1024), (64, 1024, 1024))
    assert plan is not None and plan.y_chunk == 1024
    assert 1 <= plan.b_chunk < 64
    assert plan.b_chunk * 1024 * 1024 * 4 <= _RESULT_CAP


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


def _force_chunking(monkeypatch, cap, target):
    from xinvert_tpu.ops import pallas_sor_window as win
    monkeypatch.setattr(win, "_RESULT_CAP", cap)
    monkeypatch.setattr(win, "_CHUNK_TARGET", target)


# NOTE: chunked tests use shapes unique to this block — the module-level
# jits cache traces per shape, and the monkeypatched caps are only read at
# trace time.

@pytest.mark.parametrize("bcs,mask,cross", [
    (("extend", "periodic"), True, False),
    (("fixed", "fixed"), False, False),
    (("extend", "fixed"), True, True),
])
def test_window_chunked_matches_xla(monkeypatch, bcs, mask, cross):
    """Row-chunked multi-call execution (result above the scoped-VMEM cap)
    is bit-exact vs the XLA path."""
    from xinvert_tpu.ops.pallas_sor_window import window_plan
    _force_chunking(monkeypatch, 64 * 1024, 64 * 1024)
    ny, nx = 256, 128
    spec = _spec(ny, nx, bcs, mask=mask, cross=cross, seed=11)
    plan = window_plan(spec, (ny, nx))
    assert plan is not None and plan.y_chunk < ny, plan
    S0 = jnp.zeros((ny, nx))
    for n in (1, 9):
        ref = solver.solve_fixed(spec, S0, 1.4, n, use_pallas=False)
        out = sor_sweeps_window(spec, S0, 1.4, n, interpret=True)
        assert np.array_equal(np.asarray(out), np.asarray(ref)), (
            n, np.abs(np.asarray(out) - np.asarray(ref)).max())


def test_window_chunked_biharmonic(monkeypatch):
    """Two-ring (biharmonic) stencils row-chunk too: the per-chunk extend
    pre-pass touches only its own true domain end."""
    from xinvert_tpu import stencil as st
    from xinvert_tpu.ops.pallas_sor_window import window_plan
    _force_chunking(monkeypatch, 64 * 1024, 64 * 1024)
    rng = np.random.default_rng(13)
    ny, nx = 256, 128
    shape = (ny, nx)
    A4 = np.full(shape, 5e3)
    zero = np.zeros(shape)
    D = np.full(shape, -1e-6)
    H = np.full(shape, -1.8e-11)
    J = rng.normal(0, 1e-7, shape)
    for bcs in (("extend", "periodic"), ("extend", "fixed")):
        spec = st.general_2d_bih(
            jnp.asarray(A4), zero + 1e2, jnp.asarray(A4), jnp.asarray(D),
            zero, jnp.asarray(D), zero, jnp.asarray(H), zero,
            jnp.asarray(J), np.ones(shape, bool), (5e4, 5e4), bcs)
        plan = window_plan(spec, (ny, nx))
        assert plan is not None and plan.y_chunk < ny, plan
        S0 = jnp.zeros(shape)
        ref = solver.solve_fixed(spec, S0, 1.0, 7, use_pallas=False)
        out = sor_sweeps_window(spec, S0, 1.0, 7, interpret=True)
        assert np.array_equal(np.asarray(out), np.asarray(ref)), bcs


@pytest.mark.parametrize("shared_weights", [True, False])
def test_window_batch_groups_match_xla(monkeypatch, shared_weights):
    """Batch-group chunking (many moderate slices) is bit-exact, with
    shared or per-slice coefficient planes."""
    from xinvert_tpu.ops.pallas_sor_window import window_plan
    _force_chunking(monkeypatch, 128 * 1024, 128 * 1024)
    ny, nx, B = 64, 128, 5
    rng = np.random.default_rng(17)
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    C = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0, 1, (ny, nx) if shared_weights else (B, ny, nx))
    Fdef = np.ones((ny, nx), bool)
    Fdef[11:21, 31:61] = False
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.3, 1.0), ("extend", "periodic"))
    plan = window_plan(spec, (B, ny, nx))
    assert plan is not None and plan.b_chunk < B, plan
    S0 = jnp.zeros((B, ny, nx))
    ref = solver.solve_fixed(spec, S0, 1.5, 9, use_pallas=False)
    out = sor_sweeps_window(spec, S0, 1.5, 9, interpret=True)
    assert np.array_equal(np.asarray(out), np.asarray(ref)), (
        np.abs(np.asarray(out) - np.asarray(ref)).max())


def test_window_chunked_dynamic_count(monkeypatch):
    """Traced sweep counts run the chunked SMEM-count kernel path."""
    import jax
    from xinvert_tpu.ops.pallas_sor_window import window_plan
    _force_chunking(monkeypatch, 64 * 1024, 64 * 1024)
    ny, nx = 256, 128
    spec = _spec(ny, nx, ("extend", "periodic"), mask=True, seed=19)
    assert window_plan(spec, (ny, nx)).y_chunk < ny
    S0 = jnp.zeros((ny, nx))
    n = jnp.asarray(6)          # traced-count path (SMEM trip count)
    ref = solver.solve_fixed(spec, S0, 1.4, 6, use_pallas=False)
    out = sor_sweeps_window(spec, S0, 1.4, n, interpret=True)
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


def test_window_batch_groups_multidim(monkeypatch):
    """Multi-dim batch (e.g. time x member) with per-slice forcing through
    the batch-group chunked path: spec arrays flatten with the state."""
    from xinvert_tpu.ops.pallas_sor_window import window_plan
    _force_chunking(monkeypatch, 128 * 1024, 128 * 1024)
    ny, nx = 64, 160
    rng = np.random.default_rng(23)
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0, 1, (2, 2, ny, nx))            # (time, member, y, x)
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(A),
                               jnp.asarray(F), jnp.ones((ny, nx), bool),
                               (1.3, 1.0), ("extend", "periodic"))
    plan = window_plan(spec, (4, ny, nx))
    assert plan is not None and plan.b_chunk < 4, plan
    S0 = jnp.zeros((2, 2, ny, nx))
    ref = solver.solve_fixed(spec, S0, 1.5, 9, use_pallas=False)
    out = sor_sweeps_window(spec, S0, 1.5, 9, interpret=True)
    assert np.array_equal(np.asarray(out), np.asarray(ref)), (
        np.abs(np.asarray(out) - np.asarray(ref)).max())
