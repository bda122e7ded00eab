# -*- coding: utf-8 -*-
"""Thomas / cyclic-Thomas solvers vs the reference's golden vectors
(/root/reference/tests/test_trace.py:12-38)."""
import numpy as np

from xinvert_tpu import trace, traceCyclic


def test_trace():
    a = np.array([2., 2., 0.])
    b = np.array([3., 3., 3., 3.])
    c = np.array([0., 1., 1.])
    d = np.array([5., 9., 9., 8.])

    res = trace(a, b, c, d)
    expect = np.array([
        1.6666666666666667,
        1.5238095238095233,
        1.0952380952380958,
        2.6666666666666665])
    assert np.isclose(np.asarray(res), expect).all()


def test_trace_cyclic():
    a = np.array([2., 2., 0.])
    b = np.array([3., 3., 3., 3.])
    c = np.array([0., 1., 1.])
    d = np.array([5., 9., 9., 8.])

    res = traceCyclic(a, b, c, d, 5.2, 3.9)
    expect = np.array([
        2.35815602836879370,
        0.49316109422492393,
        2.80420466058763960,
        -0.39893617021276560])
    assert np.isclose(np.asarray(res), expect).all()


def test_trace_random_vs_dense():
    rng = np.random.default_rng(3)
    n = 17
    b = rng.normal(4.0, 0.3, n)
    a = rng.normal(1.0, 0.2, n - 1)
    c = rng.normal(1.0, 0.2, n - 1)
    d = rng.normal(0.0, 1.0, n)
    M = np.diag(b) + np.diag(a, -1) + np.diag(c, 1)
    x = np.linalg.solve(M, d)
    assert np.allclose(np.asarray(trace(a, b, c, d)), x)

    a0, cn = 0.7, -0.4
    M[0, -1] += a0
    M[-1, 0] += cn
    x = np.linalg.solve(M, d)
    assert np.allclose(np.asarray(traceCyclic(a, b, c, d, a0, cn)), x)


def test_pscan_matches_sequential_thomas():
    """The log-depth associative-scan Thomas (tridiag_solve_pscan /
    tridiag_cyclic_pscan) matches the sequential solvers to roundoff,
    across sizes, batches, and cyclic corner couplings."""
    import numpy as np
    import jax.numpy as jnp
    from xinvert_tpu.ops.tridiag import (tridiag_solve, tridiag_solve_pscan,
                                         traceCyclic, tridiag_cyclic_pscan)

    rng = np.random.default_rng(0)
    for n in (5, 17, 64, 257):
        b = 2.0 + np.abs(rng.normal(0, 0.3, n))
        a = rng.normal(0, 0.4, n - 1)
        c = rng.normal(0, 0.4, n - 1)
        d = rng.standard_normal(n)
        assert np.allclose(np.asarray(tridiag_solve_pscan(a, b, c, d)),
                           np.asarray(tridiag_solve(a, b, c, d)),
                           rtol=1e-10, atol=1e-12)
        assert np.allclose(
            np.asarray(tridiag_cyclic_pscan(a, b, c, d, 0.3, -0.2)),
            np.asarray(traceCyclic(a, b, c, d, 0.3, -0.2)),
            rtol=1e-9, atol=1e-12)
    # batched, per-line corners
    B, n = 7, 33
    b = 2.0 + np.abs(rng.normal(0, 0.3, (B, n)))
    a = rng.normal(0, 0.4, (B, n - 1))
    c = rng.normal(0, 0.4, (B, n - 1))
    d = rng.standard_normal((B, n))
    a0 = rng.normal(0, 0.3, B)
    cn = rng.normal(0, 0.3, B)
    yb = np.asarray(tridiag_cyclic_pscan(a, b, c, d, a0, cn))
    for i in range(B):
        yi = np.asarray(traceCyclic(a[i], b[i], c[i], d[i], a0[i], cn[i]))
        assert np.allclose(yb[i], yi, rtol=1e-9, atol=1e-11)
    # complex systems (the direct solver's per-mode path)
    br = (2.0 + np.abs(rng.normal(0, 0.3, n))) + 0.3j * rng.standard_normal(n)
    ar = rng.normal(0, 0.3, n - 1) + 0.1j * rng.standard_normal(n - 1)
    cr = rng.normal(0, 0.3, n - 1) + 0.1j * rng.standard_normal(n - 1)
    dr = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = np.asarray(tridiag_solve_pscan(ar, br, cr, dr))
    T = np.diag(br) + np.diag(ar, -1) + np.diag(cr, 1)
    assert np.allclose(T @ x, dr, rtol=1e-9, atol=1e-11)


def test_pscan_dtype_promotion_and_rhs_batch():
    """Contract checks from review: a complex rhs with real bands promotes
    (no silent imaginary-part loss), and rhs-only leading batch axes work
    with 1-D bands (the Moebius elimination is computed once per matrix)."""
    import numpy as np
    from xinvert_tpu.ops.tridiag import tridiag_solve, tridiag_solve_pscan

    rng = np.random.default_rng(1)
    n = 21
    b = 2.0 + np.abs(rng.normal(0, 0.3, n))
    a = rng.normal(0, 0.4, n - 1)
    c = rng.normal(0, 0.4, n - 1)
    d = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = np.asarray(tridiag_solve_pscan(a, b, c, d))
    assert np.iscomplexobj(x)
    T = np.diag(b) + np.diag(a, -1) + np.diag(c, 1)
    assert np.allclose(T @ x, d, rtol=1e-9, atol=1e-11)

    D = rng.standard_normal((4, n))
    X = np.asarray(tridiag_solve_pscan(a, b, c, D))
    assert X.shape == (4, n)
    for i in range(4):
        assert np.allclose(X[i], np.asarray(tridiag_solve(a, b, c, D[i])),
                           rtol=1e-10, atol=1e-12)
