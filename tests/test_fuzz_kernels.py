# -*- coding: utf-8 -*-
"""Randomized property tests: every kernel/executor path must be
bit-identical to the XLA reference sweep on arbitrary (seeded) problem
configurations — shapes, BC combos, masks, cross terms, batch dims,
meshes.  This is the class of test that catches gate/geometry errors the
curated cases miss (e.g. round 4's by == ghost-width staleness).

Tolerance: a few ULPs of the state scale rather than strict bit-equality
— two separately-compiled XLA programs can make different FMA-contraction
choices at some shapes (observed: one-ulp f64 drift of the interpret-mode
3-D kernel vs the XLA sweep at 22x24x116; the hardware Mosaic kernels are
bit-exact on their curated on-chip checks).  A real geometry/gate bug
produces errors many orders larger."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from xinvert_tpu import stencil
from xinvert_tpu.solver import _solve_fixed_xla


def _ulps(ref, n=4):
    """n ULPs of the state scale (FMA-contraction headroom; see module
    docstring) with a tiny absolute floor for near-zero states."""
    eps = float(jnp.finfo(ref.dtype).eps)
    return n * eps * max(float(jnp.max(jnp.abs(ref))), 1e-30)


def _rand_2d(rng, ny, nx, bcs, cross, mask, B=0):
    A = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    Bc = rng.normal(0, 0.2, (ny, nx)) if cross else 0.0
    C = np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0, 1, ((B,) if B else ()) + (ny, nx))
    Fdef = np.ones((ny, nx), bool)
    if mask:
        # random rectangular holes
        for _ in range(rng.integers(1, 4)):
            y0, x0 = rng.integers(1, ny - 8), rng.integers(1, nx - 8)
            Fdef[y0:y0 + rng.integers(2, 8), x0:x0 + rng.integers(2, 8)] \
                = False
    spec = stencil.standard_2d(
        jnp.asarray(A), Bc if not cross else jnp.asarray(Bc),
        jnp.asarray(C), jnp.asarray(F), jnp.asarray(Fdef), (1.3, 1.0), bcs)
    return spec, jnp.zeros(((B,) if B else ()) + (ny, nx))


_BCS = [("fixed", "fixed"), ("extend", "periodic"), ("extend", "fixed"),
        ("fixed", "periodic")]


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_windowed_kernel(seed):
    """Random shapes/BCs/masks/cross/batch: the windowed kernel (interpret
    mode) is bit-identical to the XLA sweep wherever it plans."""
    from xinvert_tpu.ops.pallas_sor_window import (sor_sweeps_window,
                                                   window_plan)
    rng = np.random.default_rng(100 + seed)
    ny = 8 * int(rng.integers(9, 40))          # 72..312 rows
    nx = int(rng.integers(96, 300))
    bcs = _BCS[rng.integers(0, len(_BCS))]
    B = int(rng.integers(0, 3))
    spec, S0 = _rand_2d(rng, ny, nx, bcs, cross=bool(rng.integers(0, 2)),
                        mask=bool(rng.integers(0, 2)), B=B)
    if window_plan(spec, S0.shape) is None:
        pytest.skip(f"no plan for {S0.shape}")
    n = int(rng.integers(1, 11))
    out = sor_sweeps_window(spec, S0, 1.4, n, interpret=True)
    ref = _solve_fixed_xla(spec, S0, 1.4, n)
    assert float(jnp.max(jnp.abs(out - ref))) <= _ulps(ref), \
        (ny, nx, bcs, B, n)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_sharded_windowed(seed):
    """Random meshes x problems: the sharded windowed executor is
    bit-identical wherever halo_window_applicable says yes."""
    from xinvert_tpu.parallel.halo_window import (solve_fixed_halo_window,
                                                  halo_window_applicable)
    rng = np.random.default_rng(200 + seed)
    devs = np.asarray(jax.devices()[:8])
    layouts = [((8,), ("y",)), ((4,), ("y",)), ((2, 4), ("y", "x")),
               ((4, 2), ("y", "x")), ((2, 2, 2), ("batch", "y", "x")),
               ((2, 4), ("batch", "y"))]
    shape, names = layouts[rng.integers(0, len(layouts))]
    mesh = Mesh(devs[:int(np.prod(shape))].reshape(shape), names)
    my_ = mesh.shape.get("y", 1)
    mx = mesh.shape.get("x", 1)
    mb = mesh.shape.get("batch", 1)
    ny = int(rng.integers(64 * my_, 100 * my_))       # often non-divisible
    nx = 128 * mx * int(rng.integers(1, 3))
    bcs = _BCS[rng.integers(0, len(_BCS))]
    B = mb * int(rng.integers(1, 3)) if mb > 1 else int(rng.integers(0, 2))
    spec, S0 = _rand_2d(rng, ny, nx, bcs, cross=bool(rng.integers(0, 2)),
                        mask=True, B=B)
    if not halo_window_applicable(spec, S0.shape, mesh):
        pytest.skip(f"not applicable: {S0.shape} over {dict(mesh.shape)}")
    n = int(rng.integers(1, 10))
    out = solve_fixed_halo_window(spec, S0, 1.4, n, mesh=mesh)
    ref = _solve_fixed_xla(spec, S0, 1.4, n)
    assert float(jnp.max(jnp.abs(out - ref))) <= _ulps(ref), \
        (ny, nx, bcs, B, n, dict(mesh.shape))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sharded_3d(seed):
    """Random 3-D volumes over row meshes: bit-identical wherever
    halo_window3d_applicable says yes."""
    from xinvert_tpu.parallel.halo_window3d import (
        solve_fixed_halo_window3d, halo_window3d_applicable)
    rng = np.random.default_rng(300 + seed)
    devs = np.asarray(jax.devices())
    ndev = int(rng.choice([2, 4, 8]))
    mesh = Mesh(devs[:ndev].reshape(ndev), ("y",))
    nz = int(rng.integers(10, 40))
    ny = ndev * int(rng.integers(9, 30))
    nx = int(rng.integers(96, 200))
    bcs = ("fixed", ["fixed", "extend"][rng.integers(0, 2)],
           ["fixed", "periodic"][rng.integers(0, 2)])
    sh = (nz, ny, nx)
    A = ((np.abs(rng.normal(1.0, 0.1, sh)) + 0.5) * 2e-4)
    Bc = np.abs(rng.normal(1.0, 0.1, sh)) + 0.5
    F = rng.normal(0.0, 1e-9, sh)
    Fdef = np.ones(sh, bool)
    Fdef[nz // 3:nz // 2, ny // 4:ny // 2, nx // 4:nx // 2] = False
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(Bc),
                               jnp.asarray(Bc), jnp.asarray(F),
                               jnp.asarray(Fdef), (5e3, 1.1e5, 1.0e5),
                               tuple(bcs))
    S0 = jnp.zeros(sh)
    if not halo_window3d_applicable(spec, sh, mesh):
        pytest.skip(f"not applicable: {sh} over {ndev}")
    n = int(rng.integers(1, 10))
    out = solve_fixed_halo_window3d(spec, S0, 1.2, n, mesh=mesh)
    ref = _solve_fixed_xla(spec, S0, 1.2, n)
    assert float(jnp.max(jnp.abs(out - ref))) <= _ulps(ref), \
        (sh, bcs, n, ndev)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_checked_sharded_3d(seed):
    """Random 3-D volumes over ('batch','y') meshes: the CHECKED sharded
    solve at tol=0 runs exactly n sweeps and matches the XLA sweep
    (round 5 — reference stopping semantics on-mesh)."""
    from xinvert_tpu.parallel.halo_window3d import (
        solve_halo_window3d, halo_window3d_applicable)
    rng = np.random.default_rng(400 + seed)
    devs = np.asarray(jax.devices())
    layouts = [((2,), ("y",)), ((4,), ("y",)), ((8,), ("y",)),
               ((2, 4), ("batch", "y")), ((2, 4), ("y", "x")),
               ((2, 2, 2), ("batch", "y", "x"))]
    shape, names = layouts[rng.integers(0, len(layouts))]
    mesh = Mesh(devs[:int(np.prod(shape))].reshape(shape), names)
    d = dict(zip(names, shape))
    mb, ndev, mx = d.get("batch", 1), d.get("y", 1), d.get("x", 1)
    nz = int(rng.integers(10, 40))
    ny = ndev * int(rng.integers(9, 30))
    nx = (128 * mx * int(rng.integers(1, 3)) if mx > 1
          else int(rng.integers(96, 200)))
    bcs = ("fixed", ["fixed", "extend"][rng.integers(0, 2)],
           ["fixed", "periodic"][rng.integers(0, 2)])
    sh = (nz, ny, nx)
    A = ((np.abs(rng.normal(1.0, 0.1, sh)) + 0.5) * 2e-4)
    Bc = np.abs(rng.normal(1.0, 0.1, sh)) + 0.5
    B = mb * int(rng.integers(1, 3)) if mb > 1 else 0
    F = rng.normal(0.0, 1e-9, ((B,) if B else ()) + sh)
    Fdef = np.ones(sh, bool)
    Fdef[nz // 3:nz // 2, ny // 4:ny // 2, nx // 4:nx // 2] = False
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(Bc),
                               jnp.asarray(Bc), jnp.asarray(F),
                               jnp.asarray(Fdef), (5e3, 1.1e5, 1.0e5),
                               tuple(bcs))
    S0 = jnp.zeros(((B,) if B else ()) + sh)
    if not halo_window3d_applicable(spec, S0.shape, mesh):
        pytest.skip(f"not applicable: {S0.shape} over {dict(mesh.shape)}")
    n = int(rng.integers(1, 12))
    ce = int(rng.integers(1, 6))
    tt = ("change", "residual")[rng.integers(0, 2)]
    res = solve_halo_window3d(spec, S0, 1.2, 0.0, n, check_every=ce,
                              mesh=mesh, tol_type=tt)
    ref = _solve_fixed_xla(spec, S0, 1.2, n)
    assert np.all(np.asarray(res.iters) == n), (sh, bcs, n, ce, tt)
    assert float(jnp.max(jnp.abs(res.S - ref))) <= _ulps(ref), \
        (sh, bcs, n, ce, tt, dict(mesh.shape))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_checked_sharded_2d(seed):
    """Random 2-D problems over random meshes: the CHECKED sharded solve
    (both stopping rules) at tol=0 runs exactly n sweeps and matches the
    XLA sweep — includes non-divisible ny (inert-row padding) and
    x-splits (round 5)."""
    from xinvert_tpu.parallel.halo_window import (solve_halo_window,
                                                  halo_window_applicable)
    rng = np.random.default_rng(500 + seed)
    devs = np.asarray(jax.devices()[:8])
    layouts = [((8,), ("y",)), ((4,), ("y",)), ((2, 4), ("y", "x")),
               ((2, 4), ("batch", "y")), ((2, 2, 2), ("batch", "y", "x"))]
    shape, names = layouts[rng.integers(0, len(layouts))]
    mesh = Mesh(devs[:int(np.prod(shape))].reshape(shape), names)
    my_ = mesh.shape.get("y", 1)
    mx = mesh.shape.get("x", 1)
    mb = mesh.shape.get("batch", 1)
    ny = int(rng.integers(64 * my_, 100 * my_))
    nx = 128 * mx * int(rng.integers(1, 3))
    bcs = _BCS[rng.integers(0, len(_BCS))]
    B = mb * int(rng.integers(1, 3)) if mb > 1 else int(rng.integers(0, 2))
    spec, S0 = _rand_2d(rng, ny, nx, bcs, cross=bool(rng.integers(0, 2)),
                        mask=True, B=B)
    if not halo_window_applicable(spec, S0.shape, mesh):
        pytest.skip(f"not applicable: {S0.shape} over {dict(mesh.shape)}")
    n = int(rng.integers(1, 12))
    ce = int(rng.integers(1, 6))
    tt = ("change", "residual")[rng.integers(0, 2)]
    res = solve_halo_window(spec, S0, 1.4, 0.0, n, check_every=ce,
                            mesh=mesh, tol_type=tt)
    ref = _solve_fixed_xla(spec, S0, 1.4, n)
    assert np.all(np.asarray(res.iters) == n), (ny, nx, bcs, n, ce, tt)
    assert float(jnp.max(jnp.abs(res.S - ref))) <= _ulps(ref), \
        (ny, nx, bcs, B, n, ce, tt, dict(mesh.shape))
