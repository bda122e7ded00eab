# -*- coding: utf-8 -*-
"""Windowed >VMEM 3-D Pallas kernel parity vs the XLA roll path (interpret
mode on CPU; the same kernel compiles via Mosaic on TPU).

The kernel targets the reference's deep-atmosphere omega workloads
(11_Omega_equation.ipynb interpolates the 37-level case to 73 levels —
too large for the VMEM-resident 3-D kernel), windowing along z."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xinvert_tpu import stencil
from xinvert_tpu.solver import _solve_fixed_xla
from xinvert_tpu.ops.pallas_sor3d_window import (sor_sweeps_window3d,
                                                 window3d_applicable,
                                                 window3d_plan)


def _standard3d(bcs, batch=0, seed=0, shape3=(24, 16, 20)):
    rng = np.random.default_rng(seed)
    zc, yc, xc = shape3
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


def test_window3d_plan_shapes():
    spec, S0 = _standard3d(("fixed", "extend", "periodic"))
    plan = window3d_plan(spec, S0.shape)
    assert plan is not None
    assert plan.tile >= plan.halo == 2 * plan.k_sweeps
    assert plan.tile + 2 * plan.halo <= plan.nzp
    assert plan.nzp % plan.tile == 0 and plan.nzp >= S0.shape[-3]
    # too-shallow z -> no plan
    spec2, S2 = _standard3d(("fixed", "fixed", "fixed"), shape3=(5, 16, 20))
    assert window3d_plan(spec2, S2.shape) is None
    # the reference's 73-level omega shape has a feasible f32 plan
    spec73, _ = _standard3d(("fixed", "extend", "periodic"))
    spec73 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a,
        spec73)
    assert window3d_plan(spec73, (73, 72, 288)) is not None


@pytest.mark.parametrize("bcs,batch", [
    (("fixed", "fixed", "fixed"), 0),
    (("fixed", "fixed", "periodic"), 0),
    (("fixed", "extend", "periodic"), 0),
    (("fixed", "extend", "fixed"), 0),
    (("fixed", "extend", "periodic"), 3),
])
def test_window3d_matches_xla_standard(bcs, batch):
    spec, S0 = _standard3d(bcs, batch=batch)
    ref = _solve_fixed_xla(spec, S0, 1.2, 11)
    out = sor_sweeps_window3d(spec, S0, 1.2, 11, interpret=True)
    # CPU-interpret comparisons see ~1-ulp FMA-contraction noise between
    # the two program structures (same convention as test_pallas3d; the
    # on-hardware check is tools/tpu_window3d_check.py)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


def test_window3d_general():
    rng = np.random.default_rng(7)
    shape = (24, 16, 20)
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
    ref = _solve_fixed_xla(spec, S0, 1.2, 9)
    out = sor_sweeps_window3d(spec, S0, 1.2, 9, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


def test_window3d_unpadded_z():
    """nz already a tile multiple: no pad path (nzp == nz)."""
    spec, S0 = _standard3d(("fixed", "extend", "periodic"), shape3=(32, 10, 12),
                           seed=5)
    plan = window3d_plan(spec, S0.shape)
    assert plan is not None
    ref = _solve_fixed_xla(spec, S0, 1.2, 8)
    out = sor_sweeps_window3d(spec, S0, 1.2, 8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


def test_window3d_dynamic_count():
    """Traced sweep counts run through the SMEM trip-count kernel."""
    spec, S0 = _standard3d(("fixed", "extend", "periodic"), seed=3)
    ref = _solve_fixed_xla(spec, S0, 1.3, 7)
    n = jnp.asarray(7, jnp.int32)
    out = sor_sweeps_window3d(spec, S0, 1.3, n, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


def test_window3d_batch_groups(monkeypatch):
    """Forcing a small result cap splits the batch into group calls."""
    from xinvert_tpu.ops import pallas_sor3d_window as m
    # unique shape so the forced-plan trace cannot collide with cached jits
    spec, S0 = _standard3d(("fixed", "extend", "periodic"), batch=4,
                           shape3=(24, 16, 24), seed=11)
    plan0 = m.window3d_plan(spec, S0.shape)
    slab3 = plan0.nzp * int(np.prod(S0.shape[-2:])) * 8      # f64 on CPU
    monkeypatch.setattr(m, "_RESULT_CAP", 2 * slab3)
    monkeypatch.setattr(m, "_CHUNK_TARGET", 2 * slab3)
    plan = m.window3d_plan(spec, S0.shape)
    assert plan is not None and plan.b_chunk == 2
    ref = _solve_fixed_xla(spec, S0, 1.2, 6)
    out = sor_sweeps_window3d(spec, S0, 1.2, 6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


def test_dispatch_selects_window3d(monkeypatch):
    """On a TPU backend, an f32 3-D problem too large for the VMEM-resident
    kernel but with a feasible window plan dispatches to window3d."""
    from xinvert_tpu import solver
    from xinvert_tpu.ops import pallas_sor3d

    spec, S0 = _standard3d(("fixed", "extend", "periodic"))
    spec32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a, spec)
    S32 = S0.astype(jnp.float32)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert solver._select_kernel(spec32, S32) == "vmem3d"
    monkeypatch.setattr(pallas_sor3d, "VMEM3D_BUDGET", 1024)
    assert solver._select_kernel(spec32, S32) == "window3d"


def test_dispatch_selects_window3d_wideflat(monkeypatch):
    """A SODA-class wide-flat f32 ocean volume (50x330x720) dispatches to
    window3d through the permuted plan on a TPU backend."""
    from xinvert_tpu import solver
    from xinvert_tpu.ops import pallas_sor3d_window as m
    shape = (50, 330, 720)
    a = jnp.ones(shape, jnp.float32)
    spec = stencil.standard_3d(a, a, a, a, jnp.ones(shape, bool),
                               (5e3, 1.1e5, 1.0e5),
                               ("fixed", "extend", "periodic"))
    assert m.window3d_plan(spec, shape) is None
    planned = m.window3d_plan_any(spec, shape)
    assert planned is not None and planned[1] is True
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert solver._select_kernel(spec, jnp.zeros(shape, jnp.float32)) \
        == "window3d"


def test_window3d_applicable_excludes_vmem3d():
    spec, S0 = _standard3d(("fixed", "extend", "periodic"))
    # fits VMEM-resident -> windowed path defers
    assert not window3d_applicable(spec, S0.shape)


def _force_permuted(monkeypatch, spec, shape):
    """Shrink the scoped-VMEM budget until the direct z-window plan fails
    but the z<->y permuted plan (wide-flat layout) still fits."""
    from xinvert_tpu.ops import pallas_sor3d_window as m
    monkeypatch.setattr(m, "_SCOPED_VMEM_KIB", 4096)
    assert m.window3d_plan(spec, shape) is None, "direct plan should fail"
    planned = m.window3d_plan_any(spec, shape)
    assert planned is not None and planned[1] is True
    return planned[0]


def test_window3d_permuted_plan(monkeypatch):
    """Wide-flat volumes (big ny, small nz) get a permuted plan; periodic y
    excludes the permuted layout (windowed-axis wrap would be real)."""
    spec, S0 = _standard3d(("fixed", "extend", "periodic"),
                           shape3=(10, 128, 24), seed=21)
    plan = _force_permuted(monkeypatch, spec, S0.shape)
    assert plan.tile >= plan.halo == 2 * plan.k_sweeps
    assert plan.nzp >= S0.shape[-2]          # padded PHYSICAL-y extent
    specp, Sp = _standard3d(("fixed", "periodic", "periodic"),
                            shape3=(10, 128, 24), seed=21)
    from xinvert_tpu.ops import pallas_sor3d_window as m
    assert m.window3d_plan_any(specp, Sp.shape) is None


@pytest.mark.parametrize("bcs,batch,shape3", [
    (("fixed", "fixed", "fixed"), 0, (10, 128, 24)),
    (("fixed", "extend", "periodic"), 0, (10, 128, 28)),
    (("fixed", "extend", "fixed"), 0, (12, 96, 20)),
    (("fixed", "extend", "periodic"), 3, (10, 64, 36)),
])
def test_window3d_permuted_matches_xla(bcs, batch, shape3, monkeypatch):
    """The permuted (y-windowed) kernel reproduces the XLA path on
    wide-flat volumes, including masked cells, extend BCs with x-corner
    clamping, and batches."""
    spec, S0 = _standard3d(bcs, batch=batch, seed=23, shape3=shape3)
    _force_permuted(monkeypatch, spec, S0.shape)
    ref = np.asarray(_solve_fixed_xla(spec, S0, 1.2, 9))
    out = sor_sweeps_window3d(spec, S0, 1.2, 9, interpret=True)
    # the permuted layout compiles with different FMA contractions than the
    # unpermuted XLA reference; tolerance is a few ulps of the field scale
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12,
                               atol=1e-14 * np.abs(ref).max())


def test_window3d_permuted_general(monkeypatch):
    """The general-3D family (invert_3DOcean's damped advective stencil)
    through the permuted wide-flat layout: first-derivative terms fold
    into asymmetric neighbor weights, which must survive the z<->y axis
    swap."""
    rng = np.random.default_rng(17)
    shape = (10, 128, 24)
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
    _force_permuted(monkeypatch, spec, S0.shape)
    ref = np.asarray(_solve_fixed_xla(spec, S0, 1.2, 9))
    out = sor_sweeps_window3d(spec, S0, 1.2, 9, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12,
                               atol=1e-14 * np.abs(ref).max())


def test_window3d_permuted_padded_axis(monkeypatch):
    """Physical ny not a tile multiple: the windowed axis pads with inert
    levels that are sliced off after the sweeps."""
    spec, S0 = _standard3d(("fixed", "extend", "periodic"),
                           shape3=(10, 44, 64), seed=29)
    plan = _force_permuted(monkeypatch, spec, S0.shape)
    assert plan.nzp > S0.shape[-2]
    ref = np.asarray(_solve_fixed_xla(spec, S0, 1.3, 8))
    out = sor_sweeps_window3d(spec, S0, 1.3, 8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12,
                               atol=1e-14 * np.abs(ref).max())


def test_window3d_permuted_dynamic_count(monkeypatch):
    spec, S0 = _standard3d(("fixed", "extend", "periodic"),
                           shape3=(12, 80, 24), seed=31)
    _force_permuted(monkeypatch, spec, S0.shape)
    ref = _solve_fixed_xla(spec, S0, 1.2, 7)
    out = sor_sweeps_window3d(spec, S0, 1.2, jnp.asarray(7, jnp.int32),
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("bcs,n_sweeps,shape3", [
    (("fixed", "extend", "periodic"), 9, (48, 18, 20)),
    (("fixed", "extend", "fixed"), 8, (64, 14, 24)),
])
def test_window3d_level_chunks(bcs, n_sweeps, shape3, monkeypatch):
    """Forcing a small per-call result target splits the windowed axis
    into level-chunk calls (chunk + neighbor-halo assembly per step)."""
    from xinvert_tpu.ops import pallas_sor3d_window as m
    spec, S0 = _standard3d(bcs, shape3=shape3, seed=37)
    slab = int(np.prod(shape3[-2:])) * 8                 # f64 on CPU
    monkeypatch.setattr(m, "_RESULT_CAP", 4 * slab)
    monkeypatch.setattr(m, "_CHUNK_TARGET", 16 * slab)   # 2 tiles of 8
    plan = m.window3d_plan(spec, S0.shape)
    assert plan is not None and plan.z_chunk < plan.nzp
    assert -(-plan.nzp // plan.z_chunk) >= 2
    ref = _solve_fixed_xla(spec, S0, 1.2, n_sweeps)
    out = sor_sweeps_window3d(spec, S0, 1.2, n_sweeps, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


def test_window3d_level_chunks_padded_dynamic(monkeypatch):
    """Level chunks + a padded windowed axis + a traced sweep count."""
    from xinvert_tpu.ops import pallas_sor3d_window as m
    spec, S0 = _standard3d(("fixed", "extend", "periodic"),
                           shape3=(44, 18, 16), seed=41)
    slab = int(np.prod(S0.shape[-2:])) * 8
    monkeypatch.setattr(m, "_RESULT_CAP", 4 * slab)
    monkeypatch.setattr(m, "_CHUNK_TARGET", 16 * slab)
    plan = m.window3d_plan(spec, S0.shape)
    assert plan is not None and plan.z_chunk < plan.nzp > S0.shape[-3]
    ref = _solve_fixed_xla(spec, S0, 1.3, 7)
    out = sor_sweeps_window3d(spec, S0, 1.3, jnp.asarray(7, jnp.int32),
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


def test_window3d_permuted_level_chunks(monkeypatch):
    """The SODA-ocean class: wide-flat volume through the PERMUTED layout
    with the windowed (physical-y) axis split into level chunks."""
    from xinvert_tpu.ops import pallas_sor3d_window as m
    spec, S0 = _standard3d(("fixed", "extend", "periodic"),
                           shape3=(10, 144, 40), seed=43)
    monkeypatch.setattr(m, "_SCOPED_VMEM_KIB", 4096)
    slab = 10 * 40 * 8                                  # permuted z-plane
    monkeypatch.setattr(m, "_RESULT_CAP", 24 * slab)
    monkeypatch.setattr(m, "_CHUNK_TARGET", 48 * slab)
    assert m.window3d_plan(spec, S0.shape) is None
    planned = m.window3d_plan_any(spec, S0.shape)
    assert planned is not None and planned[1] is True
    assert planned[0].z_chunk < planned[0].nzp
    ref = np.asarray(_solve_fixed_xla(spec, S0, 1.2, 9))
    out = sor_sweeps_window3d(spec, S0, 1.2, 9, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12,
                               atol=1e-14 * np.abs(ref).max())


def test_window3d_batch_groups_multidim(monkeypatch):
    """Multi-dim batch (e.g. time x member) with per-slice forcing through
    the batch-group chunked path: spec arrays flatten with the state."""
    from xinvert_tpu.ops import pallas_sor3d_window as m
    rng = np.random.default_rng(13)
    shape3 = (24, 16, 28)
    A = np.abs(rng.normal(1.0, 0.1, shape3)) + 0.5
    F = rng.normal(0.0, 1.0, (2, 2) + shape3)       # (time, member, z, y, x)
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(A),
                               jnp.asarray(A), jnp.asarray(F),
                               jnp.ones(shape3, bool), (5e3, 1.1e5, 1.0e5),
                               ("fixed", "extend", "periodic"))
    S0 = jnp.zeros((2, 2) + shape3)
    plan0 = m.window3d_plan(spec, S0.shape)
    slab3 = plan0.nzp * int(np.prod(shape3[-2:])) * 8
    monkeypatch.setattr(m, "_RESULT_CAP", 2 * slab3)
    monkeypatch.setattr(m, "_CHUNK_TARGET", 2 * slab3)
    assert m.window3d_plan(spec, S0.shape).b_chunk == 2
    ref = _solve_fixed_xla(spec, S0, 1.2, 6)
    out = sor_sweeps_window3d(spec, S0, 1.2, 6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)
