# -*- coding: utf-8 -*-
"""Tridiagonal (Thomas) solvers, plain and cyclic.

TPU-native equivalents of the reference's exported ``trace``/``traceCyclic``
(/root/reference/xinvert/numbas.py:1590-1685): the Thomas elimination is a
linear recurrence expressed with ``lax.scan`` so it jits/vmaps cleanly; the
cyclic variant removes the periodic corner entries with the standard
Sherman-Morrison bordering used by the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["trace", "traceCyclic", "tridiag_solve"]


@jax.jit
def tridiag_solve(a, b, c, d):
    """Solve a tridiagonal system: a sub-diagonal (N-1), b diagonal (N),
    c super-diagonal (N-1), d rhs (N)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)
    n = b.shape[0]
    a_full = jnp.concatenate([jnp.zeros((1,), a.dtype), a])      # a[i] couples i,i-1
    c_full = jnp.concatenate([c, jnp.zeros((1,), c.dtype)])

    # forward elimination: cp[i] = c[i]/(b[i]-a[i]*cp[i-1]),
    #                      dp[i] = (d[i]-a[i]*dp[i-1])/(b[i]-a[i]*cp[i-1])
    def fwd(carry, x):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = x
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    (_, _), (cp, dp) = jax.lax.scan(
        fwd, (jnp.zeros((), b.dtype), jnp.zeros((), b.dtype)),
        (a_full, b, c_full, d))

    # back substitution: x[i] = dp[i] - cp[i]*x[i+1]
    def bwd(x_next, t):
        cpi, dpi = t
        x = dpi - cpi * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros((), b.dtype), (cp, dp), reverse=True)
    return xs


def trace(a, b, c, d):
    """Reference-compatible Thomas solve (numbas.py:1590-1636)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)
    n = b.shape[0]
    if a.shape[0] != n - 1 or c.shape[0] != n - 1 or d.shape[0] != n:
        raise ValueError("lengths of given arrays are not satisfied")
    return tridiag_solve(a, b, c, d)


def traceCyclic(a, b, c, d, a0, cn):
    """Cyclic tridiagonal solve with corner couplings a0 (row 0 -> col N-1)
    and cn (row N-1 -> col 0), via bordering (numbas.py:1640-1685)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)
    n = b.shape[0]
    dtype = b.dtype
    e1 = jnp.zeros((n,), dtype).at[0].set(1.0)
    en = jnp.zeros((n,), dtype).at[n - 1].set(1.0)
    # columns of the correction: A x = d with A = T + a0*e1 en^T + cn*en e1^T
    u1 = tridiag_solve(a, b, c, e1 * a0)   # T^-1 (a0 e1)
    u2 = tridiag_solve(a, b, c, en * cn)   # T^-1 (cn en)
    x0 = tridiag_solve(a, b, c, d)
    # Bordering: A = T + a0*e1*en^T + cn*en*e1^T, so
    #   x = x0 - u1 * x_{n-1} - u2 * x_0
    # (u1 multiplies x_{n-1}: a0 couples row 0 to column n-1;
    #  u2 multiplies x_0:     cn couples row n-1 to column 0).
    # Evaluating that identity at rows 0 and n-1 gives the 2x2 system
    #   (1 + u2[0]) x_0   + u1[0] x_{n-1}       = x0[0]
    #   u2[n-1] x_0       + (1 + u1[n-1]) x_{n-1} = x0[n-1]
    det = (1.0 + u2[0]) * (1.0 + u1[n - 1]) - u1[0] * u2[n - 1]
    x0c = ((1.0 + u1[n - 1]) * x0[0] - u1[0] * x0[n - 1]) / det
    xN1 = ((1.0 + u2[0]) * x0[n - 1] - u2[n - 1] * x0[0]) / det
    return x0 - u1 * xN1 - u2 * x0c
