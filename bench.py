# -*- coding: utf-8 -*-
"""Headline benchmark: masked spherical Poisson SOR throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric is SOR grid-point updates per second (grid points x sweeps / wall
second) on the flagship masked Poisson problem.  Baseline is the only
quantitative wall-clock figure the reference publishes: the QG-omega notebook
(/root/reference/docs/source/notebooks/11_Omega_equation.ipynb, "time used:
2920.08 s") — 4 inversions x 500 sweeps over a 37x72x288 grid on the author's
CPU = 767,232 pts x 2,000 sweeps / 2,920 s = 5.255e5 point-sweeps/s.
"""
import json
import time

import numpy as np

BASELINE_PTS_PER_S = 37 * 72 * 288 * 2000 / 2920.08


def _health_probe(q):
    # child body must be module-level for the spawn-context pickler
    try:
        import jax
        import jax.numpy as _jnp
        ok = jax.default_backend() == "tpu"
        float(_jnp.sum(_jnp.ones((8, 8))))
        q.put(ok)
    except Exception:
        q.put(False)


def _tpu_healthy(wait_s: float = 240.0) -> bool:
    """Fail-fast backend probe in a child process (see tools/tpu_health.py):
    when the remote tile behind the relay is down, backend init retries
    internally for ~25 min before raising — probing in a child keeps the
    bench from hanging, and terminating an INIT (unlike a mid-compile
    kill) does not wedge the relay."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_health_probe, args=(q,))
    p.start()
    p.join(wait_s)
    if p.is_alive():
        p.terminate()
        p.join()
        return False
    try:
        return bool(q.get(timeout=5))
    except Exception:
        return False


def main():
    import os
    expected_tpu = "axon" in os.environ.get("JAX_PLATFORMS", "")
    tpu_down = expected_tpu and not _tpu_healthy()
    import jax
    if tpu_down:
        # honest CPU fallback, clearly labelled: never report a number the
        # hardware didn't produce, never hang the driver on a dead relay
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _poisson_problem
    from xinvert_tpu.solver import solve_fixed

    platform = jax.devices()[0].platform
    # large single-chip grid on an accelerator; smaller on CPU so the bench
    # stays fast in local runs
    if platform == "cpu":
        batch, ny, nx, iters, chain = 1, 512, 512, 50, 2
    else:
        # 500 sweeps per call amortises the per-call W-stack build the way
        # a real convergence run does (the 2048^2 Poisson needs thousands
        # of sweeps); at 100 sweeps/call the fixed overhead hid ~15% of
        # the kernel rate
        batch, ny, nx, iters, chain = 1, 2048, 2048, 500, 4

    spec, S0, grid = _poisson_problem(batch=batch, ny=ny, nx=nx,
                                      dtype=np.float32)
    omega = grid.omega_opt

    def run(n_chain):
        """Chain n_chain dependent solve calls and force a scalar fetch —
        robust against async dispatch that returns from block_until_ready
        before device execution finishes (observed through the TPU relay)."""
        S = S0
        t0 = time.perf_counter()
        for _ in range(n_chain):
            S = solve_fixed(spec, S, omega, iters)
        v = float(jnp.sum(jnp.abs(S)))   # forces the whole chain
        dt = time.perf_counter() - t0
        assert np.isfinite(v), "diverged"
        return dt

    run(1)            # warmup / compile
    # the remote-compile relay's host timing jitters by up to ~3x between
    # trials: repeat the chained measurement and take the median rate
    rates = []
    for _ in range(5):
        t_long = run(chain)
        t_short = run(1)
        per_call = max((t_long - t_short) / (chain - 1), 1e-9)
        rates.append(batch * ny * nx * iters / per_call)
    pts_per_s = float(np.median(rates))
    unit = "grid-point-sweeps/s"
    if tpu_down:
        unit += " (CPU fallback - TPU relay unavailable at bench time;" \
            " last validated TPU figure 6.54e10, docs/BENCH.md)"
    print(json.dumps({
        "metric": "masked_poisson_sor_point_sweeps_per_s",
        "value": pts_per_s,
        "unit": unit,
        "vs_baseline": pts_per_s / BASELINE_PTS_PER_S,
    }))


if __name__ == "__main__":
    main()
