# -*- coding: utf-8 -*-
"""DIRECT per-iteration parity against the actual reference kernels.

The reference's numba kernels (/root/reference/xinvert/numbas.py) are pure
Python under ``@nb.jit``; with numba stubbed they run as-is (slow, so tiny
grids only).  This drives THE reference implementation — not a
reimplementation — as the oracle for the lexicographic executor
(xinvert_tpu/lexico.py), which claims the reference's exact iterate
sequence.  Skipped when the reference mount is absent (CI): the
reimplemented oracle (tests/oracle.py) covers the same contract there.

No reference code is copied; the read-only mount is imported at test time.

DISCOVERED off-by-one (encoded below, documented in docs/PARITY.md): the
reference's loop control tests ``loop >= mxLoop`` BEFORE incrementing
(numbas.py:401-414), so a call with mxLoop=m executes m+1 sweeps while
flags[2] reports m.  This framework runs exactly mxLoop sweeps; parity is
therefore reference(mxLoop=m) == ours(n_sweeps=m+1), verified here.

DISCOVERED index typos in the reference (documented in docs/PARITY.md):
the periodic WEST-column cross-term stanza of invert_standard_2D
(numbas.py:327-328) and invert_standard_2D_test (numbas.py:538-539) reads
``B[j+1,1] * (S[j+1,1]-S[j+1,-1]) - B[j-1,0] * (S[j-1,0]-S[j-1,-1])``
where the interior pattern (numbas.py:356-357) calls for
``B[j+1,0] * (S[j+1,1]-S[j+1,-1]) - B[j-1,0] * (S[j-1,1]-S[j-1,-1])``.
This framework discretizes the west column symmetrically (the physically
consistent flux form); exact per-iteration parity for cross-term problems
with periodic x therefore holds when B vanishes on columns 0-1 (where the
typo'd and symmetric forms coincide) — tested below — and
test_reference_west_stanza_typo demonstrates the quirk is real (the
reference disagrees with its own interior discretization there).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import stencil
from xinvert_tpu.lexico import (solve_fixed_lexicographic,
                                solve_fixed_lexicographic_1d,
                                solve_fixed_lexicographic_3d,
                                solve_fixed_lexicographic_bih)

REF_NUMBAS = "/root/reference/xinvert/numbas.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_NUMBAS),
                                reason="reference mount not available")

UNDEF = -9.99e8


@pytest.fixture(scope="module")
def ref():
    """Load the reference numbas.py standalone with numba stubbed out
    (bypassing the xinvert package __init__, which needs xarray/dask)."""
    if "numba" not in sys.modules:
        fake = types.ModuleType("numba")

        def jit(*args, **kwargs):
            def deco(f):
                return f
            return deco

        fake.jit = jit
        sys.modules["numba"] = fake
    spec = importlib.util.spec_from_file_location("_ref_numbas", REF_NUMBAS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _coeffs2d(ny, nx, seed=0, cross=False, mask=False, b_west_zero=False):
    rng = np.random.default_rng(seed)
    A = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    B = rng.normal(0.0, 0.2, (ny, nx)) if cross else np.zeros((ny, nx))
    if cross and b_west_zero:
        B[:, :2] = 0.0      # typo'd and symmetric west stanzas coincide
    C = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    F = rng.normal(0.0, 1.0, (ny, nx))
    if mask:
        F[ny // 3:ny // 2, nx // 4:nx // 2] = UNDEF
    return A, B, C, F


@pytest.mark.parametrize("bcs,cross,mask", [
    (("fixed", "fixed"), False, False),
    (("extend", "periodic"), False, False),
    (("extend", "periodic"), False, True),
    (("fixed", "fixed"), True, False),
    (("fixed", "periodic"), True, False),   # B zeroed at west (module doc)
    (("extend", "fixed"), False, False),
])
def test_standard_2d_matches_reference_kernel(ref, bcs, cross, mask):
    ny, nx = 10, 14
    dely, delx = 1.1e5, 1.0e5
    omega = 1.3
    b_west_zero = cross and bcs[1] == "periodic"
    A, B, C, F = _coeffs2d(ny, nx, cross=cross, mask=mask,
                           b_west_zero=b_west_zero)
    Fdef = F != UNDEF
    spec = stencil.standard_2d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(np.where(Fdef, F, 0.0)),
                               jnp.asarray(Fdef), (dely, delx), bcs)
    ratio = delx / dely
    for m in (1, 3, 7):
        Sref = np.zeros((ny, nx))
        flags = np.zeros(3)
        ref.invert_standard_2D(Sref, A, B, C, F, ny, nx, dely, delx,
                               bcs[0], bcs[1], delx ** 2, ratio / 4.0,
                               ratio ** 2, omega, UNDEF, flags, m, 0.0)
        # reference mxLoop=m -> m+1 sweeps (reported as m); see module doc
        ours = np.asarray(solve_fixed_lexicographic(
            spec, jnp.zeros((ny, nx)), omega, m + 1))
        np.testing.assert_allclose(ours, Sref, rtol=1e-12, atol=1e-12,
                                   err_msg=f"m={m} bcs={bcs}")
        assert flags[2] == m


def test_standard_2d_e_matches_reference_kernel(ref):
    """The +E(psi) form (invert_standard_2D_test, numbas.py:421)."""
    ny, nx = 10, 14
    dely, delx = 1.1e5, 1.0e5
    omega = 1.2
    rng = np.random.default_rng(5)
    A, B, C, F = _coeffs2d(ny, nx, seed=5)
    D = C.copy()                     # reference form: D multiplies S_xx
    E = -np.abs(rng.normal(1e-10, 1e-11, (ny, nx)))
    bcs = ("extend", "periodic")
    spec = stencil.standard_2d_e(jnp.asarray(A), jnp.asarray(B),
                                 jnp.asarray(C), jnp.asarray(D),
                                 jnp.asarray(E), jnp.asarray(F),
                                 jnp.ones((ny, nx), bool), (dely, delx), bcs)
    ratio = delx / dely
    for m in (1, 4):
        Sref = np.zeros((ny, nx))
        flags = np.zeros(3)
        ref.invert_standard_2D_test(Sref, A, B, C, D, E, F, ny, nx, dely,
                                    delx, bcs[0], bcs[1], delx ** 2,
                                    ratio / 4.0, ratio ** 2, omega, UNDEF,
                                    flags, m, 0.0)
        ours = np.asarray(solve_fixed_lexicographic(
            spec, jnp.zeros((ny, nx)), omega, m + 1))
        np.testing.assert_allclose(ours, Sref, rtol=1e-12, atol=1e-12,
                                   err_msg=f"m={m}")


def test_general_2d_matches_reference_kernel(ref):
    """A S_yy + B S_yx + C S_xx + D S_y + E S_x + F S = G
    (invert_general_2D, numbas.py:988)."""
    ny, nx = 10, 14
    dely, delx = 1.1e5, 1.0e5
    omega = 1.1
    rng = np.random.default_rng(7)
    A = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    B = rng.normal(0.0, 0.1, (ny, nx))
    C = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    D = rng.normal(0.0, 1e-6, (ny, nx))
    E = rng.normal(0.0, 1e-6, (ny, nx))
    Fc = -np.abs(rng.normal(1e-10, 1e-11, (ny, nx)))
    G = rng.normal(0.0, 1.0, (ny, nx))
    bcs = ("fixed", "periodic")
    spec = stencil.general_2d(*map(jnp.asarray, (A, B, C, D, E, Fc, G)),
                              jnp.ones((ny, nx), bool), (dely, delx), bcs)
    ratio = delx / dely
    for m in (1, 4):
        Sref = np.zeros((ny, nx))
        flags = np.zeros(3)
        ref.invert_general_2D(Sref, A, B, C, D, E, Fc, G, ny, nx, dely,
                              delx, bcs[0], bcs[1], delx ** 2, ratio,
                              ratio / 4.0, ratio ** 2, omega, UNDEF,
                              flags, m, 0.0)
        ours = np.asarray(solve_fixed_lexicographic(
            spec, jnp.zeros((ny, nx)), omega, m + 1))
        np.testing.assert_allclose(ours, Sref, rtol=1e-12, atol=1e-12,
                                   err_msg=f"m={m}")


def test_standard_3d_matches_reference_kernel(ref):
    ny, nx, nz = 8, 10, 6
    delz, dely, delx = 5e3, 1.1e5, 1.0e5
    omega = 1.2
    rng = np.random.default_rng(3)
    shape = (nz, ny, nx)
    A = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    B = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    C = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    F = rng.normal(0.0, 1.0, shape)
    bcs = ("fixed", "extend", "periodic")
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.ones(shape, bool),
                               (delz, dely, delx), bcs)
    r1, r2 = delx / dely, delx / delz
    for m in (1, 3):
        Sref = np.zeros(shape)
        flags = np.zeros(3)
        # signature order is (ratio2Sqr, ratio1Sqr): z-ratio first
        # (numbas.py:17-18; apps.py:2201-2204 defines ratio1=dx/dy, ratio2=dx/dz)
        ref.invert_standard_3D(Sref, A, B, C, F, nz, ny, nx, delz, dely,
                               delx, bcs[0], bcs[1], bcs[2], delx ** 2,
                               r2 ** 2, r1 ** 2, omega, UNDEF, flags, m, 0.0)
        ours = np.asarray(solve_fixed_lexicographic_3d(
            spec, jnp.zeros(shape), omega, m + 1))
        np.testing.assert_allclose(ours, Sref, rtol=1e-12, atol=1e-12,
                                   err_msg=f"m={m}")


@pytest.mark.parametrize("bcx", ["fixed", "extend", "periodic"])
def test_standard_1d_matches_reference_kernel(ref, bcx):
    """d/dx(A Sx) + B S = F (invert_standard_1D, numbas.py:633) —
    per-iteration parity for all three x BCs, completing the direct-drive
    matrix for the 1-D family."""
    nx = 17
    delx = 1.0e5
    omega = 1.4
    rng = np.random.default_rng(23)
    A = np.abs(rng.normal(1.0, 0.1, nx)) + 0.5
    B = -np.abs(rng.normal(1e-10, 1e-11, nx))
    F = rng.normal(0.0, 1.0, nx)
    spec = stencil.standard_1d(jnp.asarray(A), jnp.asarray(B),
                               jnp.asarray(F), jnp.ones(nx, bool),
                               (delx,), (bcx,))
    for m in (1, 5):
        Sref = np.zeros(nx)
        flags = np.zeros(3)
        ref.invert_standard_1D(Sref, A, B, F, nx, delx, bcx, delx ** 2,
                               omega, UNDEF, flags, m, 0.0)
        ours = np.asarray(solve_fixed_lexicographic_1d(
            spec, jnp.zeros(nx), omega, m + 1))
        np.testing.assert_allclose(ours, Sref, rtol=1e-12, atol=1e-12,
                                   err_msg=f"m={m} bcx={bcx}")
        assert flags[2] == m


@pytest.mark.parametrize("bcs", [
    ("fixed", "fixed", "fixed"),
    ("fixed", "extend", "periodic"),
])
def test_general_3d_matches_reference_kernel(ref, bcs):
    """A S_zz + B S_yy + C S_xx + D S_z + E S_y + F S_x + G S = H
    (invert_general_3D, numbas.py:746) — per-iteration parity, completing
    the direct-drive matrix for the 3-D general family."""
    nz, ny, nx = 6, 8, 10
    delz, dely, delx = 5e3, 1.1e5, 1.0e5
    omega = 1.1
    rng = np.random.default_rng(13)
    shape = (nz, ny, nx)
    A = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    B = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    C = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
    D = rng.normal(0.0, 1e-6, shape)
    E = rng.normal(0.0, 1e-6, shape)
    F = rng.normal(0.0, 1e-6, shape)
    G = -np.abs(rng.normal(1e-10, 1e-11, shape))
    H = rng.normal(0.0, 1.0, shape)
    spec = stencil.general_3d(*map(jnp.asarray, (A, B, C, D, E, F, G, H)),
                              jnp.ones(shape, bool), (delz, dely, delx), bcs)
    r2, r1 = delx / delz, delx / dely
    for m in (1, 3):
        Sref = np.zeros(shape)
        flags = np.zeros(3)
        ref.invert_general_3D(Sref, A, B, C, D, E, F, G, H, nz, ny, nx,
                              delz, dely, delx, bcs[0], bcs[1], bcs[2],
                              delx ** 2, r2, r1, r2 ** 2, r1 ** 2, omega,
                              UNDEF, flags, m, 0.0)
        ours = np.asarray(solve_fixed_lexicographic_3d(
            spec, jnp.zeros(shape), omega, m + 1))
        np.testing.assert_allclose(ours, Sref, rtol=1e-12, atol=1e-12,
                                   err_msg=f"m={m} bcs={bcs}")
        assert flags[2] == m


def _coeffs_bih(ny, nx, seed=17, b_east_zero=False):
    rng = np.random.default_rng(seed)
    A = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    B = rng.normal(0.0, 0.1, (ny, nx))
    if b_east_zero:
        B[:, -2:] = 0.0     # the reference's stale-index east stanzas
        # (numbas.py:1495-1497, :1526-1528) scale with B on those columns
    C = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    D = -np.abs(rng.normal(1.0, 0.1, (ny, nx))) * 1e-10
    E = rng.normal(0.0, 1e-11, (ny, nx))
    F = -np.abs(rng.normal(1.0, 0.1, (ny, nx))) * 1e-10
    G = rng.normal(0.0, 1e-16, (ny, nx))
    H = rng.normal(0.0, 1e-16, (ny, nx))
    I = np.abs(rng.normal(1.0, 0.1, (ny, nx))) * 1e-20
    J = rng.normal(0.0, 1.0, (ny, nx))
    return A, B, C, D, E, F, G, H, I, J


def _drive_bih(ref, coeffs, bcs, omega, m, dely=1.1e5, delx=1.0e5):
    A, B, C, D, E, F, G, H, I, J = coeffs
    ny, nx = A.shape
    ratio = delx / dely
    Sref = np.zeros((ny, nx))
    flags = np.zeros(3)
    ref.invert_general_bih_2D(Sref, A, B, C, D, E, F, G, H, I, J, ny, nx,
                              dely, delx, bcs[0], bcs[1], delx ** 4,
                              delx ** 3, delx ** 2, ratio, ratio ** 4,
                              ratio / 4.0, ratio ** 2, omega, UNDEF, flags,
                              m, 0.0)
    return Sref, flags


@pytest.mark.parametrize("bcs,b_east_zero", [
    (("fixed", "fixed"), False),
    (("extend", "fixed"), False),
    (("fixed", "periodic"), True),
    (("extend", "periodic"), True),
])
def test_general_bih_2d_matches_reference_kernel(ref, bcs, b_east_zero):
    """The 13/17-point biharmonic family (invert_general_bih_2D,
    numbas.py:1205) — per-iteration parity wherever the reference is
    self-consistent: everywhere for fixed x (the periodic stanzas do not
    run), and for periodic x when B vanishes on the east columns, where the
    reference's stale-index B-cross reads (numbas.py:1495-1497) are scaled
    away (test_reference_bih_east_stanza_stale_index demonstrates the
    defect is real)."""
    ny, nx = 12, 14
    omega = 1.0
    coeffs = _coeffs_bih(ny, nx, b_east_zero=b_east_zero)
    spec = stencil.general_2d_bih(*map(jnp.asarray, coeffs),
                                  jnp.ones((ny, nx), bool), (1.1e5, 1.0e5),
                                  bcs)
    for m in (1, 4):
        Sref, flags = _drive_bih(ref, coeffs, bcs, omega, m)
        ours = np.asarray(solve_fixed_lexicographic_bih(
            spec, jnp.zeros((ny, nx)), omega, m + 1))
        scale = max(np.abs(Sref).max(), 1e-300)
        np.testing.assert_allclose(ours / scale, Sref / scale,
                                   rtol=0, atol=1e-12,
                                   err_msg=f"m={m} bcs={bcs}")
        assert flags[2] == m


def test_reference_bih_east_stanza_stale_index(ref):
    """Demonstrate the reference's east periodic stanzas read a STALE loop
    index for the B-cross term (numbas.py:1495-1497 and :1526-1528 use
    ``S[j+-2, i-4]`` / ``S[j+-2, i-3]`` with ``i`` left at xc-3 by the
    inner loop — columns xc-7 / xc-6 instead of the intended -4 / -3).
    With B nonzero on the east columns the reference kernel deviates from
    the intended symmetric form, and the deviation originates at the east
    columns."""
    ny, nx = 12, 14
    omega = 1.0
    bcs = ("fixed", "periodic")
    coeffs = _coeffs_bih(ny, nx, b_east_zero=False)
    B = coeffs[1]
    assert np.abs(B[:, -2:]).max() > 0
    spec = stencil.general_2d_bih(*map(jnp.asarray, coeffs),
                                  jnp.ones((ny, nx), bool), (1.1e5, 1.0e5),
                                  bcs)
    # ONE reference sweep (mxLoop=0 -> 1 sweep; module doc) vs one of ours:
    # within a single sweep the stale reads corrupt only the east columns
    # of each row (later rows then read those corrupted values, so deeper
    # runs spread the error westward)
    Sref, _ = _drive_bih(ref, coeffs, bcs, omega, 0)
    ours = np.asarray(solve_fixed_lexicographic_bih(
        spec, jnp.zeros((ny, nx)), omega, 1))
    err = np.abs(ours - Sref)
    scale = np.abs(Sref).max()
    assert err[:, -2:].max() > 1e-9 * scale, "stale-index defect not observed"
    assert err[:, -2:].max() >= err[:, :-2].max(), (
        "east columns should carry the deviation")


def test_reference_west_stanza_typo(ref):
    """Demonstrate the reference's west-column cross-term index typo
    (numbas.py:327-328) is real: with B nonzero near the periodic west
    column, the reference kernel and the symmetric (interior-pattern) form
    agree at every column EXCEPT i=0, where they differ."""
    ny, nx = 10, 14
    dely, delx = 1.1e5, 1.0e5
    omega = 1.3
    bcs = ("fixed", "periodic")
    A, B, C, F = _coeffs2d(ny, nx, seed=11, cross=True)
    assert np.abs(B[:, :2]).max() > 0
    spec = stencil.standard_2d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.ones((ny, nx), bool),
                               (dely, delx), bcs)
    ratio = delx / dely
    m = 3
    Sref = np.zeros((ny, nx))
    flags = np.zeros(3)
    ref.invert_standard_2D(Sref, A, B, C, F, ny, nx, dely, delx,
                           bcs[0], bcs[1], delx ** 2, ratio / 4.0,
                           ratio ** 2, omega, UNDEF, flags, m, 0.0)
    ours = np.asarray(solve_fixed_lexicographic(
        spec, jnp.zeros((ny, nx)), omega, m + 1))
    # the discrepancy originates at column 0 (and spreads within-sweep via
    # the already-updated west neighbour), so the west column carries the
    # largest error; the b_west_zero parametrized case above proves the two
    # forms agree exactly when B vanishes there
    err = np.abs(ours - Sref)
    scale = np.abs(Sref).max()
    assert err[:, 0].max() > 1e-9 * scale, "typo not observed at west column"
    assert err[:, 0].max() >= err[:, 1:].max(), (
        "west-column discrepancy should carry the global max")


def test_red_black_same_fixed_point_as_reference(ref):
    """The throughput engine converges to the reference kernel's own fixed
    point (run both deep, compare)."""
    from xinvert_tpu.solver import solve_fixed
    ny, nx = 10, 14
    dely, delx = 1.1e5, 1.0e5
    A, B, C, F = _coeffs2d(ny, nx, seed=1)
    # fixed y-walls keep the problem well-posed: with (extend, periodic) the
    # operator has a constant nullspace and random F is incompatible, so both
    # solvers drift (at different rates) instead of converging to one point
    bcs = ("fixed", "periodic")
    spec = stencil.standard_2d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.ones((ny, nx), bool),
                               (dely, delx), bcs)
    ratio = delx / dely
    Sref = np.zeros((ny, nx))
    flags = np.zeros(3)
    ref.invert_standard_2D(Sref, A, B, C, F, ny, nx, dely, delx,
                           bcs[0], bcs[1], delx ** 2, ratio / 4.0,
                           ratio ** 2, 1.3, UNDEF, flags, 4000, 1e-14)
    ours = np.asarray(solve_fixed(spec, jnp.zeros((ny, nx)), 1.3, 4000))
    scale = np.abs(Sref).max()
    np.testing.assert_allclose(ours, Sref, atol=1e-8 * scale)
