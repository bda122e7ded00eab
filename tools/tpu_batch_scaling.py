# -*- coding: utf-8 -*-
"""Real-chip batch-scaling rows for SCALING.json (round 5, VERDICT r4 #7).

Multi-chip hardware is not reachable from this box, but single-chip BATCH
scaling (1 -> 2 -> 4 -> 8 stacked slices of the same problem) is the
measurable half of the data-parallel story: it shows whether the kernels
keep their per-point rate as the batch dim grows (grid-dim batching /
batch-group chunking) — the per-device workload of a data-parallel pod.

Appends a ``v5e_batch`` table to SCALING.json (other tables untouched).

    python tools/tpu_batch_scaling.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _poisson_batch(B, ny, nx, seed=0):
    from xinvert_tpu import stencil
    rng = np.random.default_rng(seed)
    dt = np.float32
    A = (np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5).astype(dt)
    C = (np.abs(rng.normal(1.0, 0.1, (ny, nx))) + 0.5).astype(dt)
    F = rng.normal(0, 1e-9, ((B, ny, nx) if B else (ny, nx))).astype(dt)
    Fdef = np.ones((ny, nx), bool)
    Fdef[ny // 3: ny // 2, nx // 4: nx // 2] = False
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.2e5, 1.0e5), ("extend", "periodic"))
    return spec, jnp.zeros(F.shape, jnp.float32)


def _rate(fn, S0, pts, iters, chains=3):
    """Median chained-call rate (relay-safe timing: chained dependent
    calls, scalar fetch, 1-call baseline subtracted — see bench.py)."""
    def run(n):
        S = S0
        t0 = time.perf_counter()
        for _ in range(n):
            S = fn(S)
        assert np.isfinite(float(jnp.sum(jnp.abs(S))))
        return time.perf_counter() - t0

    run(1)                                # warm
    rates = []
    for _ in range(chains):
        t_long = run(4)
        t_short = run(1)
        per = max((t_long - t_short) / 3, 1e-9)
        rates.append(pts * iters / per)
    return float(np.median(rates))


def main():
    print("backend:", jax.default_backend())
    assert jax.default_backend() == "tpu", "run on the TPU box"
    from xinvert_tpu.solver import solve_fixed, _select_kernel

    iters = 500
    rows = []
    for ny, batches in ((1024, (1, 2, 4, 8)), (2048, (1, 2, 4))):
        nx = ny
        base = None
        for B in batches:
            spec, S0 = _poisson_batch(B, ny, nx)
            kern = _select_kernel(spec, S0)
            fn = functools.partial(solve_fixed, spec, omega=1.9,
                                   n_iters=iters)
            rate = _rate(lambda S: fn(S), S0, B * ny * nx, iters)
            if base is None:
                base = rate
            # a SINGLE slice already saturates HBM at these grids, so the
            # honest batch-scaling statement is the AGGREGATE rate staying
            # at the roofline as the batch grows (through batch-group
            # chunking included) — not per-slice speedup
            rows.append({"grid": f"{ny}x{nx}", "batch": B,
                         "kernel": kern,
                         "pt_sweeps_per_s": float(f"{rate:.4e}"),
                         "per_slice": float(f"{rate / B:.4e}"),
                         "aggregate_vs_b1": round(rate / base, 3)})
            print(rows[-1], flush=True)

    path = os.path.join(ROOT, "SCALING.json")
    with open(path) as fh:
        out = json.load(fh)
    out["tables"]["v5e_batch"] = rows
    out["v5e_batch_note"] = (
        "REAL-CHIP single-device batch scaling (v5e, f32, 500-sweep "
        "solve_fixed calls, masked Poisson, relay-safe chained timing): "
        "the per-device workload of a data-parallel pod.  One slice "
        "already saturates HBM at these grids, so 'aggregate_vs_b1' "
        "(total rate vs the batch-1 run) staying ~1.0 is the target: "
        "batched solves keep the roofline rate, including through "
        "result-cap batch-group chunking.")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("updated SCALING.json with", len(rows), "v5e_batch rows")


if __name__ == "__main__":
    main()
