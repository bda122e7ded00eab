# -*- coding: utf-8 -*-
"""Probe window3d plan variants at the 73-level omega shape on hardware.

Each variant forces a (tile, k) plan by monkeypatching window3d_plan and
uses a DISTINCT static sweep count so the jit traces fresh (plans are read
at trace time; identical shapes would otherwise hit a stale cache).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_probe_w3d_plans.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from xinvert_tpu import stencil
from xinvert_tpu.ops import pallas_sor3d_window as m


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    nz, ny, nx = 73, 72, 288
    shape = (nz, ny, nx)
    dt = np.float32
    A = (np.abs(rng.normal(1.0, 0.1, shape)) + 0.5).astype(dt) * 2e-4
    B = (np.abs(rng.normal(1.0, 0.1, shape)) + 0.5).astype(dt)
    C = (np.abs(rng.normal(1.0, 0.1, shape)) + 0.5).astype(dt)
    F = rng.normal(0.0, 1e-12, shape).astype(dt)
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.ones(shape, bool),
                               (5e3, 1.1e5, 1.0e5),
                               ("fixed", "extend", "periodic"))
    S0 = jnp.zeros(shape, dt)
    om = np.float32(1.4)
    npts = nz * ny * nx

    variants = [
        ("tile=16 k=4 (default)", 16, 4, 500),
        ("tile=8  k=4", 8, 4, 504),
        ("tile=16 k=2", 16, 2, 508),
        ("tile=24 k=4", 24, 4, 512),
        ("tile=8  k=2", 8, 2, 516),
    ]

    for name, tile, k, iters in variants:
        halo = 2 * k
        nzp = -(-nz // tile) * tile
        if tile + 2 * halo > nzp or tile < halo:
            print(f"{name}: infeasible", flush=True)
            continue
        plan = m.Window3dPlan(tile, k, halo, nzp, 1, nzp)
        orig = m.window3d_plan_any
        m.window3d_plan_any = lambda s, sh: (plan, False)
        try:
            def run(n_chain):
                S = S0
                t0 = time.perf_counter()
                for _ in range(n_chain):
                    S = m.sor_sweeps_window3d(spec, S, om, iters)
                v = float(jnp.sum(jnp.abs(S)))
                dtm = time.perf_counter() - t0
                assert np.isfinite(v)
                return dtm

            t0 = time.perf_counter()
            run(1)
            print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s",
                  flush=True)
            rates = []
            for _ in range(3):
                tl = run(6)
                ts = run(1)
                per = max((tl - ts) / 5, 1e-9)
                rates.append(npts * iters / per)
            print(f"{name}: {float(np.median(rates)):.3e} pt-sweeps/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e).splitlines()[:2]}", flush=True)
        finally:
            m.window3d_plan_any = orig


if __name__ == "__main__":
    main()
