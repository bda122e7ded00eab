# -*- coding: utf-8 -*-
"""Biharmonic windowed-kernel roofline probe (round 5, VERDICT r4 #1).

The round-4 bih rate (1.05e10 pt-sweeps/s at 2048^2 Stommel-Munk) ran at
<50% of the effective bandwidth the 5-point kernel proves attainable.
Two levers, probed here on the real chip:

1. PLANE PRUNING (stencil.prune_zero_offsets): the Munk class zeroes the
   (+-2,+-2) cross and (+-1,+-1) planes — 8 of 16 offsets — cutting the
   coefficient stream from 20 to 12 plane-equivalents (~1.6x traffic).
2. k/tile ablation on the pruned spec, mirroring tools/tpu_k_probe.py:
   the radius-2 cone makes halo = round8(4k), so k=2 halves the k=4
   halo (8 vs 16) and k=8 doubles it (32) but amortises the stream over
   twice the sweeps.  Traffic factors (P+1)*win/(tile*k), pruned P=11:
   (128,4): 3.75   (128,2): 6.75   (128,8): 2.25   (64,8): 3.0
   vs the round-4 unpruned (128,4): 6.25.

Parity: every config is checked against the unpruned XLA sweep at 30
sweeps (ULP tolerance — pruning is arithmetically exact but a different
XLA compile contracts FMAs differently; same class the fuzz suite
documents).

    python tools/tpu_bih_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _munk(ny, nx, seed=0):
    from xinvert_tpu import stencil
    rng = np.random.default_rng(seed)
    dt = np.float32
    A4 = np.full((ny, nx), 5e3, dt)
    Z = np.zeros((ny, nx), dt)
    beta = np.full((ny, nx), 2e-11, dt)
    J = rng.normal(0, 1e-7, (ny, nx)).astype(dt)
    Fdef = np.ones((ny, nx), bool)
    Fdef[ny // 3: ny // 2, nx // 4: nx // 2] = False
    return stencil.general_2d_bih(
        jnp.asarray(A4), jnp.asarray(Z), jnp.asarray(A4),
        jnp.asarray(Z), jnp.asarray(Z), jnp.asarray(Z),
        jnp.asarray(Z), jnp.asarray(-beta), jnp.asarray(Z),
        jnp.asarray(J), jnp.asarray(Fdef), (5e4, 5e4),
        ("fixed", "fixed"))


def main():
    print("backend:", jax.default_backend())
    from xinvert_tpu.stencil import prune_zero_offsets
    from xinvert_tpu.ops.pallas_sor_window import (
        WindowPlan, WINDOW_COMPILER_OPTS, _round8, _run_group, window_plan)
    from xinvert_tpu.solver import _solve_fixed_xla

    ny = nx = 2048
    spec = _munk(ny, nx)
    pruned = prune_zero_offsets(spec)
    print("offsets:", len(spec.offsets), "->", len(pruned.offsets))
    S0 = jnp.zeros((1, ny, nx), jnp.float32)
    om = np.float32(1.0)
    iters = 500

    print("auto plan unpruned:", window_plan(spec, (1, ny, nx)))
    print("auto plan pruned:  ", window_plan(pruned, (1, ny, nx)))

    # parity oracle: 30 unpruned XLA sweeps
    t0 = time.perf_counter()
    ref30 = np.asarray(_solve_fixed_xla(spec, S0, om, 30))
    print(f"xla 30-sweep oracle {time.perf_counter() - t0:.1f}s")
    scale = float(np.abs(ref30).max())
    ulp = 8 * np.finfo(np.float32).eps * scale

    configs = [
        ("unpruned 128/4 (r4 base)", spec, 128, 4),
        ("pruned   128/4", pruned, 128, 4),
        ("pruned   128/8", pruned, 128, 8),
        ("pruned    64/8", pruned, 64, 8),
        ("pruned   128/2", pruned, 128, 2),
    ]
    results = []
    for name, sp, tile, k in configs:
        halo = _round8(2 * 2 * k)
        if tile <= halo:
            print(name, "skipped: tile <= halo")
            continue
        plan = WindowPlan(tile, k, halo, ny, 1)

        fn = jax.jit(
            functools.partial(_run_group, n_sweeps=iters, plan=plan,
                              interpret=False, fold=False),
            compiler_options=WINDOW_COMPILER_OPTS)
        fn30 = jax.jit(
            functools.partial(_run_group, n_sweeps=30, plan=plan,
                              interpret=False, fold=False),
            compiler_options=WINDOW_COMPILER_OPTS)

        try:
            t0 = time.perf_counter()
            out30 = np.asarray(fn30(sp, S0, om))
            d = float(np.abs(out30 - ref30).max())
            print(f"{name}: parity maxdiff {d:.2e} "
                  f"({'OK' if d <= ulp else 'FAIL'}), "
                  f"compile {time.perf_counter() - t0:.1f}s")
            if d > ulp:
                continue

            def run(n_chain):
                S = S0
                t0 = time.perf_counter()
                for _ in range(n_chain):
                    S = fn(sp, S, om)
                v = float(jnp.sum(jnp.abs(S)))
                dt = time.perf_counter() - t0
                assert np.isfinite(v)
                return dt

            run(1)                       # warm the 500-sweep compile
            rates = []
            for _ in range(3):
                t_long = run(4)
                t_short = run(1)
                per = max((t_long - t_short) / 3, 1e-9)
                rates.append(ny * nx * iters / per)
            rate = float(np.median(rates))
            results.append((name, rate))
            print(f"{name}: {rate:.3e} pt-sweeps/s")
        except Exception as e:                        # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")

    print("\n==== summary ====")
    for name, rate in sorted(results, key=lambda r: -r[1]):
        print(f"{rate:.3e} pt-sweeps/s  {name}")


if __name__ == "__main__":
    main()
