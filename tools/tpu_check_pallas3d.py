# -*- coding: utf-8 -*-
"""On-TPU validation + timing of the 3-D VMEM-resident kernel at the
flagship omega shape (37x72x288).  Run on the real chip:

    python tools/tpu_check_pallas3d.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from xinvert_tpu import stencil
from xinvert_tpu.solver import _solve_fixed_xla
from xinvert_tpu.ops.pallas_sor3d import (sor_sweeps_pallas3d,
                                          pallas3d_applicable)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    nz, ny, nx = 37, 72, 288
    shape = (nz, ny, nx)
    dt = np.float32
    A = (np.abs(rng.normal(1.0, 0.1, shape)) + 0.5).astype(dt) * 2e-4
    B = (np.abs(rng.normal(1.0, 0.1, shape)) + 0.5).astype(dt)
    C = (np.abs(rng.normal(1.0, 0.1, shape)) + 0.5).astype(dt)
    F = rng.normal(0.0, 1e-12, shape).astype(dt)
    Fdef = np.ones(shape, bool)
    spec = stencil.standard_3d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (5e3, 1.1e5, 1.0e5),
                               ("fixed", "fixed", "periodic"))
    S0 = jnp.zeros(shape, dt)
    assert pallas3d_applicable(spec, shape), "not applicable?!"
    om = np.float32(1.4)

    # --- parity, 30 sweeps ---
    t0 = time.perf_counter()
    ref = np.asarray(_solve_fixed_xla(spec, S0, om, 30))
    print(f"xla 30-sweep compile+run {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    out = np.asarray(sor_sweeps_pallas3d(spec, S0, om, 30))
    print(f"pallas3d 30-sweep compile+run {time.perf_counter()-t0:.1f}s")
    err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-30)
    print(f"max rel err vs xla: {err:.3e}")
    assert err < 1e-5, "PARITY FAIL"

    # --- timing, 500 sweeps, chained ---
    iters = 500
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

    for name, fn in (("pallas3d", sor_sweeps_pallas3d),
                     ("xla", _solve_fixed_xla)):
        run(fn, 1)  # warm
        rates = []
        for _ in range(3):
            t_long = run(fn, 6)
            t_short = run(fn, 1)
            per = max((t_long - t_short) / 5, 1e-9)
            rates.append(npts * iters / per)
        r = float(np.median(rates))
        print(f"{name}: {r:.3e} pt-sweeps/s "
              f"({npts * iters / r * 1e3:.2f} ms / 500 sweeps)")


if __name__ == "__main__":
    main()
