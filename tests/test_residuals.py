# -*- coding: utf-8 -*-
"""Discrete-residual oracle across ALL 17 problem families.

For every coefficient builder, construct a small well-posed problem, solve it
tightly, and verify the folded linear system is actually satisfied:
``sum_k w_k S[.+off_k] + w0 S + g ~ 0`` at every active point.  This checks
the coefficient construction, the stencil folding, the boundary handling and
the SOR engine end-to-end, independent of any golden value.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import solve
from xinvert_tpu.grid import Grid
from xinvert_tpu.models import problems
from xinvert_tpu.models.params import default_mParams, merge_params
from xinvert_tpu.solver import _neighbor_sum


def _residual(spec, S):
    r = np.asarray(_neighbor_sum(spec, jnp.asarray(S)) + spec.w0 * jnp.asarray(S))
    return np.where(np.asarray(spec.active), r, 0.0)


def _gauss(shape, centers=(0.45,), width=0.08, seed=0):
    """Smooth multi-blob forcing over [0,1]^nd."""
    grids = np.meshgrid(*[np.linspace(0, 1, n) for n in shape], indexing="ij")
    out = np.zeros(shape)
    for k, c in enumerate(centers):
        blob = np.ones(shape)
        for g in grids:
            blob = blob * np.exp(-((g - c) ** 2) / width)
        out += blob * (1 if k % 2 == 0 else -1)
    return out


LAT2D = Grid.make(("lat", "lon"),
                  (np.linspace(-80, 80, 24), np.linspace(0, 345, 24)),
                  "lat-lon", bcs=("fixed", "periodic"))
# finer grid for problems with first-derivative (advection-like) terms whose
# cell-Peclet number must stay < 1 for SOR diagonal dominance
LAT2D_FINE = Grid.make(("lat", "lon"),
                       (np.linspace(-88, 88, 73), np.linspace(0, 357.5, 144)),
                       "lat-lon", bcs=("fixed", "periodic"))
CART2D = Grid.make(("y", "x"),
                   (np.linspace(0, 1e6, 24), np.linspace(0, 2e6, 28)),
                   "cartesian", bcs=("fixed", "fixed"))
ZLAT = Grid.make(("lev", "lat"),
                 (np.linspace(100000, 10000, 19), np.linspace(-88, -70, 25)),
                 "z-lat", bcs=("fixed", "fixed"))
LAT1D = Grid.make(("lat",), (np.linspace(-70, -20, 51),), "lat",
                  bcs=("fixed",))
LAT3D = Grid.make(("lev", "lat", "lon"),
                  (np.linspace(100000, 10000, 8),
                   np.linspace(-80, 80, 12),
                   np.linspace(0, 337.5, 16)),
                  "lat-lon", bcs=("fixed", "fixed", "periodic"))
LAT3D_FINE = Grid.make(("lev", "lat", "lon"),
                       (np.linspace(100000, 10000, 8),
                        np.linspace(-84, 84, 37),
                        np.linspace(0, 355, 72)),
                       "lat-lon", bcs=("fixed", "fixed", "periodic"))


def _mp(extra=None):
    mp = merge_params(default_mParams, extra or {})
    return mp


def _smooth2d(grid, scale=1.0, base=1.0, seed=1):
    rng = np.random.default_rng(seed)
    return base + scale * 0.1 * rng.standard_normal(grid.shape)


CASES = {
    "poisson": (LAT2D, {}, 1e-10),
    "refstate": (ZLAT, {"Gamma": 1e-6}, 1e-10),
    "geoadjustment": (LAT1D, {}, 1e-12),
    "refstateswm": (LAT1D, {"M0": None, "C0": None}, 1e-12),  # filled below
    "pv2d": (ZLAT, {"f0": -1e-4, "beta": 0.0, "N2": 2e-4}, 1e-10),
    "eliassen": (ZLAT, {"A": None, "B": None, "C": None}, 1e-10),
    "gillmatsuno": (LAT2D_FINE, {"epsilon": 1e-5, "Phi": 5000}, 1e-10),
    "gillmatsuno_test": (LAT2D_FINE, {"epsilon": 1e-5, "Phi": 5000}, 1e-10),
    "stommel": (CART2D, {"beta": 1.8e-11, "R": 8e-4, "D": 200}, 1e-10),
    "stommel_test": (CART2D, {"f0": 1e-4, "beta": 1.8e-11, "R": 8e-4,
                              "D": 200}, 1e-10),
    "stommelmunk": (CART2D, {"A4": 5e3, "beta": 1.8e-11, "R": 1e-4,
                             "D": 200}, 1e-8),
    "stommelarons": (LAT2D_FINE, {"f0": 1e-5, "beta": 2e-11, "epsilon": 1e-5},
                     1e-10),
    "geostrophic": (LAT2D, {}, 1e-10),
    "brethertonhaidvogel": (CART2D, {"f0": 1e-4, "D": 1000,
                                     "lambda": 1e-15}, 1e-10),
    "fofonoff": (CART2D, {"f0": 1e-4, "beta": 2e-11, "c0": 8e-9,
                          "c1": 1e-4}, 1e-10),
    "omega": (LAT3D, {"N2": 2e-4}, 1e-10),
    "3docean": (LAT3D_FINE, {"f0": 1e-5, "beta": 2e-11, "epsilon": 1e-5,
                             "N2": 2e-4, "k": 1e-5}, 1e-10),
}

# over-relaxation overrides: the grid-optimal omega formula assumes the
# symmetric Laplacian; for the biharmonic family and the damped problems
# with strong first-derivative/cross terms the reference's own tests pass
# an explicit optArg (1.0 for Munk, 1.4 for Gill-Matsuno, test_MunkWBC.py:43,
# test_GillMatsuno.py:33) — same here
OMEGA = {"stommelmunk": 1.0, "gillmatsuno": 1.4, "gillmatsuno_test": 1.4,
         "stommelarons": 1.4, "3docean": 1.4}


@pytest.mark.parametrize("key", sorted(CASES))
def test_discrete_residual(key):
    grid, extra, rtol = CASES[key]
    mp = _mp({k: v for k, v in extra.items() if v is not None})

    # problem-specific field parameters
    if key == "eliassen":
        # smooth elliptic coefficients: A, C > 0, B small cross term
        mp["A"] = _smooth2d(grid, base=2e-8, scale=1e-8, seed=2) * 1e0
        mp["C"] = _smooth2d(grid, base=5e-12, scale=2e-12, seed=3)
        mp["B"] = np.zeros(grid.shape) + 1e-11
    if key == "refstateswm":
        lat = grid.coords[0]
        mp["M0"] = 1e14 * (np.sin(np.deg2rad(lat)) + 1.0)
        mp["C0"] = 1e9 * (np.cos(np.deg2rad(lat)) + 0.5)

    F = _gauss(grid.shape, centers=(0.35, 0.6)) * 1e-10
    if key == "refstate":
        F = np.abs(F) + 1e-9       # PV must be positive (divides C)
    if key == "geoadjustment":
        F = 1500.0 + 20.0 * (np.linspace(0, 1, grid.shape[0]) > 0.5)

    Fdef = np.ones(grid.shape, bool)
    spec = problems.BUILDERS[key](jnp.asarray(F), jnp.asarray(Fdef), grid, mp)

    S0 = jnp.zeros(grid.shape)
    res = solve(spec, S0, omega=OMEGA.get(key), tol=1e-15, max_iters=60000)
    assert not bool(np.asarray(res.overflow).any()), f"{key} overflowed"
    S = np.asarray(res.S)
    assert np.isfinite(S).all(), f"{key} produced non-finite output"

    r = _residual(spec, S)
    active = np.asarray(spec.active)
    # residual floor is machine-epsilon relative to the diagonal term w0*S
    # (the largest intermediate in the update), not to g
    scale = max(np.abs(np.asarray(spec.g))[active].max(),
                np.abs(np.asarray(spec.w0 * res.S))[active].max())
    if scale == 0:
        scale = 1.0
    assert np.abs(r).max() < rtol * scale, (
        f"{key}: residual {np.abs(r).max():.3e} vs scale {scale:.3e}")


# ---------------------------------------------------------------------------
# alternate-coords sweep: every builder's OTHER coordinate branch (the table
# above exercises one branch per problem; the reference supports lat-lon AND
# cartesian for most, apps.py coefficient builders branch on coords)
# ---------------------------------------------------------------------------

CART2D_POS = Grid.make(("y", "x"),
                       (np.linspace(1e5, 1e6, 24), np.linspace(2e5, 2e6, 28)),
                       "cartesian", bcs=("fixed", "fixed"))
CART2D_FINE = Grid.make(("y", "x"),
                        (np.linspace(-3e6, 3e6, 61), np.linspace(0, 6e6, 80)),
                        "cartesian", bcs=("fixed", "fixed"))
CART3D = Grid.make(("lev", "y", "x"),
                   (np.linspace(100000, 10000, 8),
                    np.linspace(-2e6, 2e6, 12),
                    np.linspace(0, 4e6, 16)),
                   "cartesian", bcs=("fixed", "fixed", "fixed"))

ALT_CASES = {
    "poisson": (CART2D, {}, 1e-10),
    "poisson@zlat": (ZLAT, {}, 1e-10),
    "refstate": (CART2D_POS, {"Gamma": 1e-6, "Ang0": 2e5}, 1e-10),
    "pv2d": (CART2D, {"f0": 1e-4, "beta": 0.0, "N2": 2e-4}, 1e-10),
    "gillmatsuno": (CART2D_FINE, {"f0": 0.0, "beta": 2e-11,
                                  "epsilon": 1e-5, "Phi": 5000}, 1e-10),
    "gillmatsuno_test": (CART2D_FINE, {"f0": 0.0, "beta": 2e-11,
                                       "epsilon": 1e-5, "Phi": 5000}, 1e-10),
    "stommelarons": (CART2D_FINE, {"f0": 1e-5, "beta": 2e-11,
                                   "epsilon": 1e-5}, 1e-10),
    # lat-lon branch needs the fine grid + strong enough Rayleigh friction
    # for cell-Peclet < 1 on the beta term (2.5-degree cells; the 15-degree
    # LAT2D cells lose diagonal dominance and diverge, like the reference),
    # and a damped omega like the reference's own advective tests
    "stommel": (LAT2D_FINE, {"R": 5e-3, "D": 200}, 1e-10),
    "stommel_test": (LAT2D_FINE, {"f0": 1e-4, "R": 5e-3, "D": 200}, 1e-10),
    "stommelmunk": (LAT2D_FINE, {"A4": 5e3, "R": 2e-3, "D": 100}, 1e-8),
    "geostrophic": (CART2D, {"f0": 1e-4, "beta": 1e-11}, 1e-10),
    "brethertonhaidvogel": (LAT2D, {"D": 1000, "lambda": 1e-15}, 1e-10),
    "fofonoff": (LAT2D, {"c0": 8e-9, "c1": 1e-4}, 1e-10),
    "omega": (CART3D, {"f0": 1e-4, "beta": 0.0, "N2": 2e-4}, 1e-10),
    "3docean": (CART3D, {"f0": 1e-5, "beta": 2e-11, "epsilon": 1e-5,
                         "N2": 2e-4, "k": 1e-5}, 1e-10),
}


ALT_OMEGA = {"stommel": 1.4, "stommel_test": 1.4}


@pytest.mark.parametrize("key", sorted(ALT_CASES))
def test_discrete_residual_alt_coords(key):
    problem = key.split("@")[0]
    grid, extra, rtol = ALT_CASES[key]
    mp = _mp(extra)

    F = _gauss(grid.shape, centers=(0.35, 0.6)) * 1e-10
    if problem == "refstate":
        F = np.abs(F) + 1e-9

    Fdef = np.ones(grid.shape, bool)
    spec = problems.BUILDERS[problem](jnp.asarray(F), jnp.asarray(Fdef),
                                      grid, mp)

    S0 = jnp.zeros(grid.shape)
    res = solve(spec, S0, omega=ALT_OMEGA.get(key, OMEGA.get(problem)),
                tol=1e-15, max_iters=60000)
    assert not bool(np.asarray(res.overflow).any()), f"{key} overflowed"
    S = np.asarray(res.S)
    assert np.isfinite(S).all(), f"{key} produced non-finite output"

    r = _residual(spec, S)
    active = np.asarray(spec.active)
    scale = max(np.abs(np.asarray(spec.g))[active].max(),
                np.abs(np.asarray(spec.w0 * res.S))[active].max())
    if scale == 0:
        scale = 1.0
    assert np.abs(r).max() < rtol * scale, (
        f"{key}: residual {np.abs(r).max():.3e} vs scale {scale:.3e}")
