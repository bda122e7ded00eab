# -*- coding: utf-8 -*-
"""Multigrid for the damped advective general families (VERDICT r2 item 4):
Gill-Matsuno / Stommel / Stommel-Arons (general-2D) and 3DOcean
(general-3D), with upwind-stabilised coarse operators.

Oracles: V-cycle residual reaching tol in tens of cycles where the
reference needs hundreds-to-thousands of sweeps (apps.py:1609, notebook
07), and agreement with the SOR fixed point of the same (centered, fine)
discretisation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xinvert_tpu.grid import Grid
from xinvert_tpu.models import problems
from xinvert_tpu.models.params import default_mParams
from xinvert_tpu.mg import (build_pyramid_general2d, build_pyramid_general3d,
                            solve_mg)
from xinvert_tpu.solver import solve, _residual_norm, _residual_scale
from xinvert_tpu.field import Field


def _gm_problem(ny=73, nx=144):
    lat = np.linspace(-88.75, 88.75, ny)
    lon = np.linspace(0.0, 360.0 - 360.0 / nx, nx)
    grid = Grid.make(("lat", "lon"), (lat, lon), "lat-lon",
                     bcs=("fixed", "periodic"))
    llat = np.deg2rad(lat)[:, None]
    llon = np.deg2rad(lon)[None, :]
    Q = -0.1 * np.exp(-((llat) / 0.3) ** 2) * np.cos(3 * llon)
    Qdef = np.ones((ny, nx), bool)
    mp = dict(default_mParams)
    mp["epsilon"] = 1e-5
    mp["Phi"] = 5000.0
    return grid, jnp.asarray(Q), jnp.asarray(Qdef), mp


def test_gillmatsuno_mg_converges_fast():
    """73x144 Gill-Matsuno (the notebook-07 size, where the reference runs
    355-600 sweeps to only ~1e-5): V-cycles reach a 1e-6 residual in tens
    of cycles and land on the SOR fixed point."""
    grid, Q, Qdef, mp = _gm_problem()
    A, B, C, D, E, Fc, G = problems.gillmatsuno_coeffs(Q, Qdef, grid, mp)
    pyr = build_pyramid_general2d(A, B, C, D, E, Fc, G, Qdef,
                                  grid.deltas, grid.bcs)
    assert pyr[0].smoother == "xline"     # polar 1/cos^2 anisotropy
    S, cycles, res, conv = solve_mg(pyr, tol=1e-6, max_cycles=40)
    assert conv and cycles <= 30

    spec = problems.build_gillmatsuno(Q, Qdef, grid, mp)
    r = solve(spec, jnp.zeros(grid.shape), omega=1.4, tol=1e-12,
              max_iters=5000, check_every=8)
    scale = float(jnp.max(jnp.abs(r.S)))
    assert float(jnp.max(jnp.abs(S - r.S))) < 1e-5 * scale


def test_gillmatsuno_mg_masked():
    """Interior mask (island): damped correction keeps the cycle stable
    and the masked cells stay at their initial value."""
    grid, Q, Qdef, mp = _gm_problem(37, 72)
    Qdef = np.asarray(Qdef).copy()
    Qdef[14:20, 20:30] = False
    Qdef = jnp.asarray(Qdef)
    A, B, C, D, E, Fc, G = problems.gillmatsuno_coeffs(Q, Qdef, grid, mp)
    pyr = build_pyramid_general2d(A, B, C, D, E, Fc, G, Qdef,
                                  grid.deltas, grid.bcs)
    S, cycles, res, conv = solve_mg(pyr, tol=1e-6, max_cycles=40)
    assert conv
    assert float(jnp.max(jnp.abs(S[14:20, 20:30]))) == 0.0


def test_stommel_mg_beta_upwind():
    """Cartesian Stommel gyre: the beta term dominates at coarse spacings
    (western boundary layer); upwinded coarse operators keep the V-cycle
    convergent and the answer is still the fine centered discretisation's
    SOR fixed point."""
    ny, nx = 64, 64
    y = np.linspace(0.0, 6e6, ny)
    x = np.linspace(0.0, 1e7, nx)
    grid = Grid.make(("y", "x"), (y, x), "cartesian", bcs=("fixed", "fixed"))
    curl = -1e-7 * np.sin(np.pi * y / 6e6)[:, None] * np.ones((1, nx))
    cdef = jnp.ones((ny, nx), bool)
    mp = dict(default_mParams)
    mp["R"] = 2e-4
    mp["D"] = 100.0
    mp["beta"] = 2e-11
    A, B, C, D, E, Fc, G = problems.stommel_coeffs(
        jnp.asarray(curl), cdef, grid, mp)
    pyr = build_pyramid_general2d(A, B, C, D, E, Fc, G, cdef,
                                  grid.deltas, grid.bcs)
    assert len(pyr) >= 3
    S, cycles, res, conv = solve_mg(pyr, tol=1e-8, max_cycles=60)
    assert conv

    spec = problems.build_stommel(jnp.asarray(curl), cdef, grid, mp)
    r = solve(spec, jnp.zeros((ny, nx)), omega=1.4, tol=1e-14,
              max_iters=30000, check_every=8)
    scale = float(jnp.max(jnp.abs(r.S)))
    assert float(jnp.max(jnp.abs(S - r.S))) < 1e-5 * scale


def test_stommelarons_mg():
    ny, nx = 36, 72
    lat = np.linspace(-60.0, 60.0, ny)     # no exact-equator point
    lon = np.linspace(0.0, 360.0 - 360.0 / nx, nx)
    grid = Grid.make(("lat", "lon"), (lat, lon), "lat-lon",
                     bcs=("fixed", "periodic"))
    rng = np.random.default_rng(2)
    Q = rng.normal(0.0, 1e-6, (ny, nx))
    Qdef = jnp.ones((ny, nx), bool)
    mp = dict(default_mParams)
    mp["epsilon"] = 7e-6
    A, B, C, D, E, Fc, G = problems.stommelarons_coeffs(
        jnp.asarray(Q), Qdef, grid, mp)
    pyr = build_pyramid_general2d(A, B, C, D, E, Fc, G, Qdef,
                                  grid.deltas, grid.bcs)
    S, cycles, res, conv = solve_mg(pyr, tol=1e-6, max_cycles=40)
    assert conv

    spec = problems.build_stommelarons(jnp.asarray(Q), Qdef, grid, mp)
    r = solve(spec, jnp.zeros((ny, nx)), omega=1.4, tol=1e-13,
              max_iters=30000, check_every=8)
    scale = float(jnp.max(jnp.abs(r.S)))
    assert float(jnp.max(jnp.abs(S - r.S))) < 1e-5 * scale


def test_ocean3d_mg_semicoarsened():
    """3DOcean volume (VERDICT target): semicoarsened V-cycles with z-line
    smoothing reach 1e-6 in a few cycles and match the SOR fixed point."""
    nz, ny, nx = 8, 36, 64
    lev = np.linspace(0.0, 2100.0, nz)
    lat = np.linspace(-60.0, 60.0, ny)
    lon = np.linspace(0.0, 360.0 - 360.0 / nx, nx)
    grid = Grid.make(("lev", "lat", "lon"), (lev, lat, lon), "lat-lon",
                     bcs=("fixed", "extend", "periodic"))
    rng = np.random.default_rng(1)
    F = rng.normal(0.0, 1e-11, (nz, ny, nx))
    Fdef = np.ones((nz, ny, nx), bool)
    Fdef[:, 14:20, 20:30] = False
    mp = dict(default_mParams)
    mp["epsilon"] = 7e-6
    mp["k"] = 1e-5
    mp["N2"] = 1e-5
    A, B, C, D, E, Fc, G, H = problems.ocean3d_coeffs(
        jnp.asarray(F), jnp.asarray(Fdef), grid, mp)
    pyr = build_pyramid_general3d(A, B, C, D, E, Fc, G, H, Fdef,
                                  grid.deltas, grid.bcs)
    assert pyr[0].smoother in ("zline", "zxline")
    S, cycles, res, conv = solve_mg(pyr, tol=1e-6, max_cycles=30)
    assert conv and cycles <= 15

    spec = problems.build_ocean3d(jnp.asarray(F), jnp.asarray(Fdef),
                                  grid, mp)
    r = solve(spec, jnp.zeros((nz, ny, nx)), omega=1.4, tol=1e-13,
              max_iters=10000, check_every=8)
    scale = float(jnp.max(jnp.abs(r.S)))
    assert float(jnp.max(jnp.abs(S - r.S))) < 1e-5 * scale


def test_api_gillmatsuno_mg_matches_sor():
    """The public invert_GillMatsuno_mg lands on invert_GillMatsuno's
    converged answer (same coefficients end-to-end)."""
    from xinvert_tpu import invert_GillMatsuno, invert_GillMatsuno_mg

    ny, nx = 37, 72
    lat = np.linspace(-88.75, 88.75, ny)
    lon = np.linspace(0.0, 360.0 - 360.0 / nx, nx)
    llat = np.deg2rad(lat)[:, None]
    llon = np.deg2rad(lon)[None, :]
    Q = -0.1 * np.exp(-((llat) / 0.3) ** 2) * np.cos(3 * llon)
    Qf = Field(Q, ("lat", "lon"), {"lat": lat, "lon": lon})
    mp = {"epsilon": 1e-5, "Phi": 5000.0}
    iP = {"BCs": ["fixed", "periodic"], "tolerance": 1e-12,
          "mxLoop": 5000, "optArg": 1.4, "printInfo": False}
    ref = invert_GillMatsuno(Qf, dims=["lat", "lon"], iParams=iP,
                             mParams=mp)
    out = invert_GillMatsuno_mg(Qf, dims=["lat", "lon"], iParams=iP,
                                mParams=mp, tol=1e-7)
    scale = np.nanmax(np.abs(ref.values))
    assert np.nanmax(np.abs(out.values - ref.values)) < 1e-4 * scale


def test_api_3docean_mg_matches_sor():
    from xinvert_tpu import invert_3DOcean, invert_3DOcean_mg

    nz, ny, nx = 8, 20, 30
    lev = np.linspace(0.0, 2100.0, nz)
    lat = np.linspace(-60.0, 60.0, ny)
    lon = np.linspace(0.0, 360.0 - 360.0 / nx, nx)
    rng = np.random.default_rng(3)
    F = rng.normal(0.0, 1e-11, (nz, ny, nx))
    Ff = Field(F, ("LEV", "lat", "lon"),
               {"LEV": lev, "lat": lat, "lon": lon})
    mp = {"epsilon": 7e-6, "k": 1e-5, "N2": 1e-5}
    iP = {"BCs": ["fixed", "extend", "periodic"], "tolerance": 1e-12,
          "mxLoop": 4000, "optArg": 1.4, "printInfo": False}
    ref = invert_3DOcean(Ff, dims=["LEV", "lat", "lon"], iParams=iP,
                         mParams=mp)
    out = invert_3DOcean_mg(Ff, dims=["LEV", "lat", "lon"], iParams=iP,
                            mParams=mp, tol=1e-7)
    scale = np.nanmax(np.abs(ref.values))
    assert np.nanmax(np.abs(out.values - ref.values)) < 1e-4 * scale


def test_upwind_row_sum_consistency():
    """Upwinded weights keep the advective row sum at zero (a constant
    field has zero first derivative) and strengthen the diagonal."""
    from xinvert_tpu import stencil

    rng = np.random.default_rng(4)
    ny, nx = 12, 16
    A = jnp.asarray(np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5)
    C = jnp.asarray(np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5)
    D = jnp.asarray(rng.normal(0, 1.0, (ny, nx)))
    E = jnp.asarray(rng.normal(0, 1.0, (ny, nx)))
    G = jnp.asarray(rng.normal(0, 1, (ny, nx)))
    Fdef = jnp.ones((ny, nx), bool)
    z = jnp.zeros((ny, nx))
    cen = stencil.general_2d(A, z, C, D, E, z, G, Fdef, (1.3, 1.0),
                             ("fixed", "fixed"))
    up = stencil.general_2d(A, z, C, D, E, z, G, Fdef, (1.3, 1.0),
                            ("fixed", "fixed"), upwind=1.0)
    rs_c = cen.w.sum(0) + cen.w0
    rs_u = up.w.sum(0) + up.w0
    np.testing.assert_allclose(np.asarray(rs_u), np.asarray(rs_c),
                               rtol=1e-12, atol=1e-12)
    # diagonal never weakens
    act = np.asarray(up.active)
    assert np.all((-np.asarray(up.w0))[act] >= (-np.asarray(cen.w0))[act]
                  - 1e-12)


def test_mg_general2d_regionally_mixed_sign():
    """Coefficient planes whose diffusion sign flips regionally (each
    region is sign-definite elliptic — rows of the union system are just
    negated) upwind with each region's own orientation; a single global
    sign would orient the minority region downwind and the coarse smoother
    could diverge there."""
    from xinvert_tpu.mg import build_pyramid_general2d, solve_mg
    ny, nx = 128, 128
    rng = np.random.default_rng(31)
    sgn = np.ones((ny, nx))
    sgn[:, nx // 2:] = -1.0          # right half: equation times -1
    A = C = sgn * 1.0
    # fine-level Peclet 0.4 (centered level 0 smooths fine, like the
    # reference families); doubled coarse spacings cross Pe > 1 by level 2
    # so the coarse upwinding orientation is what is under test.  The old
    # GLOBAL sign diverges here (measured res ~6e171 at 60 cycles).
    D = sgn * 0.8
    E = sgn * 0.48
    F = sgn * -0.05
    G = rng.normal(0, 1, (ny, nx))
    Fdef = np.ones((ny, nx), bool)
    pyr = build_pyramid_general2d(A, 0.0, C, D, E, F, G, Fdef,
                                  (1.0, 1.0), ("fixed", "fixed"))
    assert len(pyr) >= 4             # really exercises coarse operators
    S, k, res, ok = solve_mg(pyr, tol=1e-6, max_cycles=60, accel="auto")
    assert ok, (k, res)
    assert k <= 30


def test_api_std2d_mg_entries_match_sor():
    """Round-4 standard-2D-family MG entries (PV2D / Eliassen /
    geostrophic) agree with their SOR counterparts."""
    import numpy as np
    from xinvert_tpu.models import api as mapi
    from xinvert_tpu.field import Field

    rng = np.random.default_rng(0)
    ny, nx = 64, 96
    z = np.linspace(0, 9000, ny)
    y = np.linspace(0, 4.75e6, nx)
    iP = {"BCs": ["fixed", "fixed"], "undef": np.nan, "mxLoop": 4000,
          "tolerance": 1e-12, "printInfo": False}
    iPmg = {"BCs": ["fixed", "fixed"], "undef": np.nan, "printInfo": False}

    F = Field(rng.normal(0, 1e-9, (ny, nx)), ("lev", "yc"),
              {"lev": z, "yc": y})
    mP = {"f0": 1e-4, "N2": 2e-4}
    ref = mapi.invert_PV2D(F, dims=["lev", "yc"], coords="cartesian",
                           mParams=mP, iParams=iP)
    got = mapi.invert_PV2D_mg(F, dims=["lev", "yc"], coords="cartesian",
                              mParams=mP, iParams=iPmg, tol=1e-10)
    a, b = np.asarray(ref), np.asarray(got)
    assert np.abs(a - b).max() <= 1e-8 * np.abs(a).max()

    mPe = {"A": 1e-6, "B": 1e-9, "C": 1e-4}       # cross-coupled pyramid
    fe = Field(rng.normal(0, 1e-12, (ny, nx)), ("lev", "yc"),
               {"lev": z, "yc": y})
    refe = mapi.invert_Eliassen(fe, dims=["lev", "yc"], coords="cartesian",
                                mParams=mPe, iParams=iP)
    gote = mapi.invert_Eliassen_mg(fe, dims=["lev", "yc"],
                                   coords="cartesian", mParams=mPe,
                                   iParams=iPmg, tol=1e-10)
    a, b = np.asarray(refe), np.asarray(gote)
    assert np.abs(a - b).max() <= 1e-8 * np.abs(a).max()

    ny2, nx2 = 64, 128
    lat = np.linspace(20, 60, ny2)
    lon = np.linspace(0, 360 - 360 / nx2, nx2)
    Fg = Field(rng.normal(0, 1e-9, (ny2, nx2)), ("lat", "lon"),
               {"lat": lat, "lon": lon})
    iPg = {"BCs": ["fixed", "periodic"], "undef": np.nan, "mxLoop": 6000,
           "tolerance": 1e-13, "printInfo": False}
    refg = mapi.invert_geostrophic(Fg, dims=["lat", "lon"], iParams=iPg)
    gotg = mapi.invert_geostrophic_mg(
        Fg, dims=["lat", "lon"], tol=1e-10,
        iParams={"BCs": ["fixed", "periodic"], "undef": np.nan,
                 "printInfo": False})
    a, b = np.asarray(refg), np.asarray(gotg)
    assert np.abs(a - b).max() <= 1e-9 * np.abs(a).max()


def test_api_std2de_mg_entries_match_sor():
    """Round-5 +Eψ-family MG entries (Fofonoff / Bretherton-Haidvogel /
    GillMatsuno_test / Stommel_test / RefState) agree with their SOR
    counterparts.  Coarse levels of the +Eψ pyramid re-express the
    cross-flux advection in upwinded general form (the antisymmetric
    B = -C beta term is advection in disguise: d/dy(B Sx) + d/dx(C Sy)
    = B_y Sx + C_x Sy when B + C = 0)."""
    import numpy as np
    from xinvert_tpu.models import api as mapi
    from xinvert_tpu.field import Field

    rng = np.random.default_rng(0)
    iP = {"BCs": ["fixed", "fixed"], "mxLoop": 8000, "tolerance": 1e-14,
          "optArg": 1.2, "printInfo": False}
    iPmg = {"BCs": ["fixed", "fixed"], "printInfo": False}

    # Fofonoff (cartesian, screening -c0 psi)
    xc = np.linspace(0, 600000, 257)
    yc = np.linspace(0, 500000, 193)
    F = Field(np.broadcast_to(yc[:, None] - xc[None, :], (193, 257)),
              ("y", "x"), {"y": yc, "x": xc})
    mP = {"f0": 1e-4, "beta": 2e-11, "c0": 8e-9, "c1": 1e-4}
    ref = mapi.invert_Fofonoff(F, dims=["y", "x"], coords="cartesian",
                               iParams=iP, mParams=mP)
    got = mapi.invert_Fofonoff_mg(F, dims=["y", "x"], coords="cartesian",
                                  iParams=iPmg, mParams=mP, tol=1e-10)
    a, b = np.asarray(ref), np.asarray(got)
    assert np.abs(a - b).max() <= 1e-9 * np.abs(a).max()
    assert int(mapi.LAST_SOLVE.iters) <= 15

    # Bretherton-Haidvogel (cartesian topography)
    ny, nx = 129, 193
    ycb = np.linspace(0, 1e6, ny)
    xcb = np.linspace(0, 1.5e6, nx)
    h = 500 * np.exp(-((ycb[:, None] - 5e5) / 2e5) ** 2
                     - ((xcb[None, :] - 7e5) / 3e5) ** 2)
    Fh = Field(h, ("y", "x"), {"y": ycb, "x": xcb})
    mPb = {"f0": 1e-4, "beta": 2e-11, "D": 1000.0, "lambda": 1e-12}
    refb = mapi.invert_BrethertonHaidvogel(Fh, dims=["y", "x"],
                                           coords="cartesian", iParams=iP,
                                           mParams=mPb)
    gotb = mapi.invert_BrethertonHaidvogel_mg(
        Fh, dims=["y", "x"], coords="cartesian", iParams=iPmg,
        mParams=mPb, tol=1e-10)
    a, b = np.asarray(refb), np.asarray(gotb)
    assert np.abs(a - b).max() <= 1e-8 * np.abs(a).max()

    # Stommel_test (lat-lon, antisymmetric beta cross fluxes)
    ny, nx = 65, 128
    lat2 = np.linspace(15, 60, ny)
    lon2 = np.linspace(0, 60, nx)
    curl = rng.normal(0, 1e-7, (ny, nx))
    cf = Field(curl, ("lat", "lon"), {"lat": lat2, "lon": lon2})
    mPs = {"f0": 1e-4, "R": 5e-3, "D": 200.0, "rho0": 1027.0}
    iPs = {"BCs": ["fixed", "fixed"], "tolerance": 1e-13, "mxLoop": 8000,
           "optArg": 1.4, "printInfo": False}
    refs = mapi.invert_Stommel_test(cf, dims=["lat", "lon"], iParams=iPs,
                                    mParams=mPs)
    gots = mapi.invert_Stommel_test_mg(cf, dims=["lat", "lon"],
                                       iParams=iPmg, mParams=mPs,
                                       tol=1e-8)
    a, b = np.asarray(refs), np.asarray(gots)
    assert np.abs(a - b).max() <= 1e-6 * np.abs(a).max()

    # GillMatsuno_test (lat-lon periodic, +E damping)
    lat = np.linspace(-64, 64, ny)
    lon = np.linspace(0, 360 - 360 / nx, nx)
    llat = np.deg2rad(lat)[:, None]
    llon = np.deg2rad(lon)[None, :]
    Q = -0.1 * np.exp(-(llat / 0.3) ** 2) * np.cos(3 * llon)
    Qf = Field(Q, ("lat", "lon"), {"lat": lat, "lon": lon})
    mPg = {"epsilon": 7e-5, "Phi": 5000.0}
    iPg = {"BCs": ["fixed", "periodic"], "tolerance": 1e-13,
           "mxLoop": 8000, "optArg": 1.4, "printInfo": False}
    refg = mapi.invert_GillMatsuno_test(Qf, dims=["lat", "lon"],
                                        iParams=iPg, mParams=mPg)
    gotg = mapi.invert_GillMatsuno_test_mg(
        Qf, dims=["lat", "lon"],
        iParams={"BCs": ["fixed", "periodic"], "printInfo": False},
        mParams=mPg, tol=1e-8)
    a, b = np.asarray(refg), np.asarray(gotg)
    assert np.abs(a - b).max() <= 1e-7 * np.abs(a).max()

    # RefState (cartesian warm-core vortex; PV-dependent C plane)
    nt, nr = 41, 81
    theta = np.linspace(300.0, 380.0, nt)
    r = np.linspace(10e3, 810e3, nr)
    Q = 1e-6 + 4e-6 * np.exp(-(r[None, :] / 150e3) ** 2) \
        * np.exp(-((theta[:, None] - 330.0) / 25.0) ** 2)
    Fq = Field(Q, ("theta", "r"), {"theta": theta, "r": r})
    iPr = {"BCs": ["fixed", "fixed"], "mxLoop": 8000, "tolerance": 1e-14,
           "optArg": 1.4, "printInfo": False}
    mPr = {"Ang0": 2e5, "Gamma": 1e-6}
    refr = mapi.invert_RefState(Fq, dims=["theta", "r"],
                                coords="cartesian", iParams=iPr,
                                mParams=mPr)
    gotr = mapi.invert_RefState_mg(Fq, dims=["theta", "r"],
                                   coords="cartesian", iParams=iPmg,
                                   mParams=mPr, tol=1e-10)
    a, b = np.asarray(refr), np.asarray(gotr)
    assert np.abs(a - b).max() <= 1e-9 * np.abs(a).max()


def test_std2de_coarsest_omega_gate():
    """The coarsest-level optimal-omega shortcut must NOT fire for
    antisymmetric B = -C cross fluxes (hidden beta advection with
    B + C == 0 — code-review finding r5): those coarsest levels need
    plain GS like the general-family pyramid.  Pure-diffusion +E
    pyramids (B = C = 0) keep the fast factor."""
    import jax.numpy as jnp
    from xinvert_tpu.mg import build_pyramid_standard2d_e
    from xinvert_tpu.grid import optimal_omega

    ny, nx = 65, 128
    one = jnp.ones((ny, nx))
    zero = jnp.zeros((ny, nx))
    f = jnp.broadcast_to(jnp.linspace(1e-5, 1e-4, ny)[:, None], (ny, nx))
    Fdef = np.ones((ny, nx), bool)
    adv = build_pyramid_standard2d_e(-1e-3 * one, -f, f, -1e-3 * one,
                                     zero, zero, Fdef, (1e5, 1e5),
                                     ("fixed", "fixed"))
    assert float(adv[-1].omega) == 1.0
    dif = build_pyramid_standard2d_e(one, zero, zero, one, -1e-9 * one,
                                     zero, Fdef, (1e5, 1e5),
                                     ("fixed", "fixed"))
    nyc = dif[-1].spec.w0.shape[-2:]
    assert float(dif[-1].omega) == pytest.approx(
        float(optimal_omega(nyc)))
