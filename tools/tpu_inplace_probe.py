# -*- coding: utf-8 -*-
"""Re-profile the in-place shifted-load kernel (INPLACE_KERNEL) after the
center-weight fix (W_ref[K] -> W_ref[0, K]): correctness vs the XLA sweep
and speed vs the roll-based windowed kernel at the 2048^2 flagship.

The flag is read at import (env XINVERT_INPLACE=1), and the launch jits
cache their kernel choice at trace time, so each mode runs in a fresh
process:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_inplace_probe.py
"""
import os
import subprocess
import sys

_CHILD = """
import time
import numpy as np
import jax.numpy as jnp
import __graft_entry__ as g
from xinvert_tpu.ops import pallas_sor_window as win
from xinvert_tpu.solver import _solve_fixed_xla

spec, S0, grid = g._poisson_problem(batch=1, ny=2048, nx=2048,
                                    dtype=np.float32)
om = np.float32(grid.omega_opt)
N = 500
out = win.sor_sweeps_window(spec, S0, om, N)
ref = _solve_fixed_xla(spec, S0, om, N)
same = bool(jnp.all(out == ref))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    r = win.sor_sweeps_window(spec, S0, om, N)
    float(jnp.sum(jnp.abs(r)))
    ts.append(time.perf_counter() - t0)
t = float(np.median(ts))
print(f"INPLACE={win.INPLACE_KERNEL}: bit-equal -> {same}; "
      f"{t*1e3:.1f} ms / {N} sweeps "
      f"({2048 * 2048 * N / t:.3e} pt-sweeps/s)")
"""


def main():
    for flag in ("0", "1"):
        env = dict(os.environ, XINVERT_INPLACE=flag)
        subprocess.run([sys.executable, "-c", _CHILD], env=env, check=True)


if __name__ == "__main__":
    main()
