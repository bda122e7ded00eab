# -*- coding: utf-8 -*-
"""On-TPU validation + timing of the PERMUTED (y-windowed) >VMEM 3-D
kernel on a wide-flat ocean-model volume (big ny*nx plane, shallow z —
the reference's 3-D ocean workloads, e.g. SODA's 0.5-degree grid).  The
direct z-windowed plan is infeasible there (a z window's (y, x) slab is
too large); the kernel transposes to (y, z, x) and windows physical y.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_window3d_perm_check.py
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from xinvert_tpu import stencil
from xinvert_tpu.solver import _solve_fixed_xla, _select_kernel
from xinvert_tpu.ops.pallas_sor3d import pallas3d_applicable
from xinvert_tpu.ops.pallas_sor3d_window import (sor_sweeps_window3d,
                                                 window3d_plan,
                                                 window3d_plan_any)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(30, 330, 720))
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--chain", type=int, default=6)
    args = ap.parse_args()
    args.chain = max(2, args.chain)

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    nz, ny, nx = args.shape
    shape = (nz, ny, nx)
    dt = np.float32
    A = (np.abs(rng.normal(1.0, 0.1, shape)) + 0.5).astype(dt) * 2e-4
    B = (np.abs(rng.normal(1.0, 0.1, shape)) + 0.5).astype(dt)
    C = (np.abs(rng.normal(1.0, 0.1, shape)) + 0.5).astype(dt)
    F = rng.normal(0.0, 1e-12, shape).astype(dt)
    Fdef = np.ones(shape, bool)
    Fdef[:, ny // 3:ny // 2, nx // 4:nx // 3] = False   # land-mask block
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (5e3, 1.1e5, 1.0e5),
                               ("fixed", "extend", "periodic"))
    S0 = jnp.zeros(shape, dt)
    om = np.float32(1.4)

    assert not pallas3d_applicable(spec, shape), "fits VMEM-resident"
    assert window3d_plan(spec, shape) is None, "direct plan feasible" \
        " — use tpu_window3d_check.py"
    planned = window3d_plan_any(spec, shape)
    print("plan:", planned, "| dispatch:", _select_kernel(spec, S0),
          flush=True)
    assert planned is not None and planned[1] is True

    # --- parity, 30 sweeps ---
    t0 = time.perf_counter()
    ref = np.asarray(_solve_fixed_xla(spec, S0, om, 30))
    print(f"xla 30-sweep compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    out = np.asarray(sor_sweeps_window3d(spec, S0, om, 30))
    print(f"window3d-perm 30-sweep compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    d = np.max(np.abs(out - ref))
    rel = d / max(np.abs(ref).max(), 1e-30)
    print(f"max |perm - xla| = {d} (rel {rel:.2e})", flush=True)

    # --- timing, chained ---
    iters = args.iters
    npts = nz * ny * nx

    def run(fn, n_chain):
        S = S0
        t0 = time.perf_counter()
        for _ in range(n_chain):
            S = fn(spec, S, om, iters)
        v = float(jnp.sum(jnp.abs(S)))
        dtm = time.perf_counter() - t0
        assert np.isfinite(v)
        return dtm

    for name, fn in (("window3d-perm", sor_sweeps_window3d),
                     ("xla", _solve_fixed_xla)):
        run(fn, 1)  # warm
        rates = []
        for _ in range(3):
            t_long = run(fn, args.chain)
            t_short = run(fn, 1)
            per = max((t_long - t_short) / (args.chain - 1), 1e-9)
            rates.append(npts * iters / per)
        r = float(np.median(rates))
        print(f"{name}: {r:.3e} pt-sweeps/s "
              f"({npts * iters / r * 1e3:.2f} ms / {iters} sweeps)",
              flush=True)


if __name__ == "__main__":
    main()
