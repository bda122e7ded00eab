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


def test_lexicographic_3d_matches_generic_oracle():
    """3-D ordering parity vs the in-place generic oracle (standard_3d)."""
    import numpy as np
    from xinvert_tpu.lexico import solve_fixed_lexicographic_3d
    from oracle import lexicographic_from_spec
    from xinvert_tpu.solver import _apply_extend

    rng = np.random.default_rng(3)
    nz, ny, nx = 6, 9, 12
    shape = (nz, ny, nx)
    A = np.abs(rng.normal(1, .1, shape)) + 0.5
    B = np.abs(rng.normal(1, .1, shape)) + 0.5
    C = np.abs(rng.normal(1, .1, shape)) + 0.5
    F = rng.normal(0, 1, shape)
    Fdef = np.ones(shape, bool)
    Fdef[2:4, 3:5, 4:8] = False
    for bcs in (("fixed", "fixed", "fixed"),
                ("fixed", "fixed", "periodic"),
                ("fixed", "extend", "periodic")):
        spec = stencil.standard_3d(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(C), jnp.asarray(F),
            jnp.asarray(Fdef), (9e3, 1.1e5, 1.0e5), bcs)
        omega = 1.3

        def ext(S):
            return np.asarray(_apply_extend(spec, jnp.asarray(S)))

        for iters in (1, 3):
            ref = lexicographic_from_spec(spec, np.zeros(shape), omega,
                                          iters, extend_fn=ext)
            got = np.asarray(solve_fixed_lexicographic_3d(
                spec, jnp.zeros(shape), omega, iters))
            scale = max(np.abs(ref).max(), 1.0)
            np.testing.assert_allclose(got, ref, rtol=1e-12,
                                       atol=1e-12 * scale,
                                       err_msg=f"{bcs} iters={iters}")


def test_lexicographic_batched_state():
    """Leading batch dims ride through the 2-D executor; each slice matches
    its standalone run."""
    import numpy as np
    yc, xc = 15, 18
    A, B, C, F, Fdef = _problem(yc, xc, seed=5)
    spec = stencil.standard_2d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.1e5, 1.0e5), ("fixed", "periodic"),
                               include_cross=False)
    rng = np.random.default_rng(9)
    S0 = jnp.asarray(rng.normal(0, 1e3, (3, yc, xc)))
    batched = np.asarray(solve_fixed_lexicographic(spec, S0, 1.4, 5))
    for b in range(3):
        single = np.asarray(solve_fixed_lexicographic(spec, S0[b], 1.4, 5))
        np.testing.assert_allclose(batched[b], single, rtol=1e-13,
                                   atol=1e-13 * max(np.abs(single).max(), 1))


@pytest.mark.parametrize("family", ["standard_2d_e", "general_2d"])
@pytest.mark.parametrize("bcx", ["fixed", "periodic"])
def test_lexicographic_other_families(family, bcx):
    """Per-iteration ordering parity for the standard+E and general-2D
    families via the generic in-place oracle."""
    import numpy as np
    from oracle import lexicographic_from_spec
    from xinvert_tpu.solver import _apply_extend

    rng = np.random.default_rng(8)
    yc, xc = 14, 18
    shape = (yc, xc)
    Fdef = np.ones(shape, bool)
    Fdef[4:6, 3:8] = False
    if family == "standard_2d_e":
        A = np.abs(rng.normal(1, .1, shape)) + 0.5
        B = rng.normal(0, 0.05, shape)
        C = rng.normal(0, 0.05, shape)
        D = np.abs(rng.normal(1, .1, shape)) + 0.5
        E = -np.abs(rng.normal(0, 1e-12, shape))
        F = rng.normal(0, 1, shape)
        spec = stencil.standard_2d_e(*map(jnp.asarray, (A, B, C, D, E, F)),
                                     jnp.asarray(Fdef), (1.1e5, 1.0e5),
                                     ("fixed", bcx))
    else:
        A = np.abs(rng.normal(1, .1, shape)) + 0.5
        B = rng.normal(0, 0.02, shape)
        C = np.abs(rng.normal(1, .1, shape)) + 0.5
        D = rng.normal(0, 1e-6, shape)
        E = rng.normal(0, 1e-6, shape)
        Fc = -np.abs(rng.normal(1e-10, 1e-11, shape))
        G = rng.normal(0, 1, shape)
        spec = stencil.general_2d(*map(jnp.asarray, (A, B, C, D, E, Fc, G)),
                                  jnp.asarray(Fdef), (1.1e5, 1.0e5),
                                  ("extend", bcx))

    def ext(S):
        return np.asarray(_apply_extend(spec, jnp.asarray(S)))

    omega = 1.2
    for iters in (1, 3):
        ref = lexicographic_from_spec(spec, np.zeros(shape), omega, iters,
                                      extend_fn=ext)
        got = np.asarray(solve_fixed_lexicographic(
            spec, jnp.zeros(shape), omega, iters))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12 * scale)


def test_lexico_scheme_batched_spec():
    """scheme='lexico' with BATCHED spec data leaves (the shape the app
    builders produce for any multi-slice forcing) for the vmap-lifted
    families: each batch element must match its own unbatched solve
    bit for bit (regression: the sweeper used to vmap only the state,
    colliding with the closed-over batched spec arrays)."""
    import numpy as np
    import jax.numpy as jnp
    from xinvert_tpu import stencil, solver

    rng = np.random.default_rng(7)
    nz, ny, nx, B = 5, 7, 9, 2
    one3 = np.ones((nz, ny, nx))
    gb = rng.standard_normal((B, nz, ny, nx))

    def spec_of(g):
        return stencil.standard_3d(one3, one3, one3, g,
                                   np.ones((nz, ny, nx), bool),
                                   deltas=(1., 1., 1.),
                                   bcs=("fixed", "fixed", "periodic"))

    r = solver.solve(spec_of(gb), jnp.zeros((B, nz, ny, nx)), omega=1.2,
                     tol=1e-9, max_iters=300, check_every=1,
                     scheme="lexico")
    for b in range(B):
        rb = solver.solve(spec_of(gb[b]), jnp.zeros((nz, ny, nx)),
                          omega=1.2, tol=1e-9, max_iters=300,
                          check_every=1, scheme="lexico")
        assert int(rb.iters) == int(np.asarray(r.iters)[b])
        assert np.array_equal(np.asarray(rb.S), np.asarray(r.S)[b])

    # batched 1-D (vmap-lifted) smoke: runs and converges per slice
    g1 = rng.standard_normal((3, 24))
    spec1 = stencil.standard_1d(np.ones(24), np.full(24, -0.1), g1,
                                np.ones(24, bool), deltas=(1.0,),
                                bcs=("fixed",))
    r1 = solver.solve(spec1, jnp.zeros((3, 24)), omega=1.4, tol=1e-11,
                      max_iters=500, check_every=1, scheme="lexico")
    assert (np.asarray(r1.rel_change) < 1e-11).all()


def _reference_stopping_loop(spec, shape, omega, tol, cap):
    """Host replication of the reference stopping rule over
    solve_fixed_lexicographic iterates (shared by the property tests)."""
    import jax.numpy as jnp
    from xinvert_tpu.lexico import solve_fixed_lexicographic

    S, prev, loops = jnp.zeros(shape), -1.0, 0
    while loops < cap:
        S = solve_fixed_lexicographic(spec, S, omega, 1)
        norm = float(jnp.mean(jnp.abs(S)))
        loops += 1
        rel = abs(norm - prev) / prev if prev > 0 else 1.0
        if rel < tol or norm == 0:
            break
        prev = norm
    return S, loops


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_checked_lexico_stopping_matches_python_loop(seed):
    """Property: solve(scheme='lexico') stops at EXACTLY the sweep where a
    host python loop applying the reference stopping rule (per-sweep
    masked-mean-|S| relative change, sweep/increment/test) over
    solve_fixed_lexicographic iterates would stop, and returns that very
    iterate."""
    import numpy as np
    import jax.numpy as jnp
    from xinvert_tpu import stencil, solver

    rng = np.random.default_rng(seed)
    ny, nx = int(rng.integers(10, 24)), int(rng.integers(12, 30))
    bcs = (("fixed", "extend", "periodic")[seed % 3], 
           ("periodic", "fixed", "extend")[seed % 3])
    bcs = ("extend" if bcs[0] == "periodic" else bcs[0], bcs[1])
    one = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    g = rng.standard_normal((ny, nx))
    spec = stencil.standard_2d(one, np.zeros((ny, nx)),
                               np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5,
                               g, np.ones((ny, nx), bool),
                               deltas=(1.0, 1.0), bcs=bcs)
    omega, tol, cap = 1.6, 10.0 ** -rng.integers(6, 10), 800

    res = solver.solve(spec, jnp.zeros((ny, nx)), omega=omega, tol=tol,
                       max_iters=cap, check_every=1, scheme="lexico")

    S, loops = _reference_stopping_loop(spec, (ny, nx), omega, tol, cap)
    assert int(res.iters) == loops
    assert np.allclose(np.asarray(res.S), np.asarray(S), rtol=1e-13)


@pytest.mark.parametrize("seed", [10, 11])
def test_checked_lexico_stopping_general2d_masked(seed):
    """Same stopping-rule property for the general-2D family with cross/
    advective terms and an interior mask."""
    import numpy as np
    import jax.numpy as jnp
    from xinvert_tpu import stencil, solver

    rng = np.random.default_rng(seed)
    ny, nx = int(rng.integers(12, 20)), int(rng.integers(14, 26))
    one = np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5
    Fdef = np.ones((ny, nx), bool)
    Fdef[ny // 3:ny // 2, nx // 4:nx // 2] = False
    spec = stencil.general_2d(
        one, rng.normal(0, 0.05, (ny, nx)),
        np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5,
        rng.normal(0, 0.1, (ny, nx)), rng.normal(0, 0.1, (ny, nx)),
        -np.abs(rng.normal(0.5, 0.1, (ny, nx))),
        rng.standard_normal((ny, nx)), Fdef,
        deltas=(1.0, 1.0), bcs=("fixed", "periodic"))
    omega, tol, cap = 1.4, 1e-8, 600

    res = solver.solve(spec, jnp.zeros((ny, nx)), omega=omega, tol=tol,
                       max_iters=cap, check_every=1, scheme="lexico")

    S, loops = _reference_stopping_loop(spec, (ny, nx), omega, tol, cap)
    assert int(res.iters) == loops
    assert np.allclose(np.asarray(res.S), np.asarray(S), rtol=1e-13)
