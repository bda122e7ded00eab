# -*- coding: utf-8 -*-
"""Differentiable inversions (round 5): jax.grad through the solver.

The solved systems are linear, so the VJP of an inversion is ONE adjoint
solve on the transpose stencil (`xinvert_tpu.transpose_spec`) — the same
engine and kernels at forward-solve speed, with no O(iters) memory.
This enables workflows the reference's numba loops cannot express:

1. SENSITIVITY: which forcing cells does a target diagnostic care about?
2. PARAMETER ESTIMATION: fit a physical coefficient plane to
   observations by gradient descent THROUGH the solver.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses
import numpy as np
import jax.numpy as jnp
from xinvert_tpu import stencil, solve_implicit

ny, nx = 48, 64
rng = np.random.default_rng(0)
A_true = jnp.asarray(1.0 + 0.4 * np.exp(
    -((np.linspace(-1, 1, ny)[:, None]) ** 2
      + (np.linspace(-1, 1, nx)[None, :]) ** 2) / 0.3))
C = jnp.ones((ny, nx))
F = jnp.asarray(rng.normal(0, 1, (ny, nx)))
Fdef = jnp.ones((ny, nx), bool)


def forward(Ap, g):
    sp = stencil.standard_2d(Ap, 0.0, C, g, Fdef, (1.0, 1.0),
                             ("fixed", "periodic"))
    return solve_implicit(sp, jnp.zeros((ny, nx)), tol=1e-13,
                          max_iters=40000, check_every=8)


# ---- 1) sensitivity of a regional average to the forcing field
S = forward(A_true, F)
region = jnp.zeros((ny, nx)).at[30:40, 40:55].set(1.0)

sens = jax.grad(lambda g: jnp.sum(forward(A_true, g) * region))(F)
print("sensitivity map: dL/dF nonzero at",
      int((np.abs(np.asarray(sens)) > 1e-6 * np.abs(sens).max()).sum()),
      "of", ny * nx, "cells; peak inside the target region:",
      bool(np.abs(np.asarray(sens))[30:40, 40:55].max()
           == np.abs(np.asarray(sens)).max()))

# ---- 2) recover the diffusivity bump from observations of S
S_obs = forward(A_true, F)


def misfit(theta):
    # parameterised coefficient: uniform + one Gaussian bump (3 params)
    amp, cy, cx = theta
    yy = jnp.linspace(-1, 1, ny)[:, None]
    xx = jnp.linspace(-1, 1, nx)[None, :]
    Ap = 1.0 + amp * jnp.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 0.3)
    return jnp.mean((forward(Ap, F) - S_obs) ** 2)


theta = jnp.asarray([0.1, 0.3, -0.3])        # wrong start
vg = jax.value_and_grad(misfit)
lr = jnp.asarray([2.0, 1.0, 1.0])
for it in range(30):
    L, gth = vg(theta)
    theta = theta - lr * gth / (jnp.abs(gth).max() + 1e-12) * 0.05
print(f"fit after 30 gradient steps: amp={float(theta[0]):.3f} "
      f"(true 0.400), centre=({float(theta[1]):.3f}, "
      f"{float(theta[2]):.3f}) (true 0, 0), misfit {float(L):.2e}")
assert abs(float(theta[0]) - 0.4) < 0.1
assert abs(float(theta[1])) < 0.15 and abs(float(theta[2])) < 0.15
print("OK: physical parameters recovered by gradient descent through "
      "the solver")
