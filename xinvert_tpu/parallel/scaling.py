# -*- coding: utf-8 -*-
"""Multi-host entry and the scaling-efficiency harness.

The BASELINE north star is >= 85% scaling efficiency from 1 chip to 1 host
to N hosts.  This module provides

- :func:`initialize_distributed` — the ``jax.distributed.initialize``
  wrapper for multi-host runs (no-op when single-process or already
  initialised; parameters autodetect from the environment on TPU pods);
- :func:`make_hybrid_mesh` — a DCN-aware ('batch', 'y', 'x') mesh: the
  slower inter-host (DCN) links carry the batch/data axis whose traffic is
  zero during a solve, while the stencil's halo exchanges and the
  convergence all-reduce ride intra-slice ICI (SURVEY §2.4);
- :func:`scaling_bench` — one command producing the BASELINE efficiency
  table: per-device throughput vs device count for the flagship masked
  spherical Poisson at a fixed per-device problem size (weak scaling) or a
  fixed global size (strong scaling), on whatever devices exist (the
  virtual CPU mesh in this environment; the same harness runs unchanged on
  real slices).
"""
from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import make_grid_mesh, shard_problem

__all__ = ["initialize_distributed", "make_hybrid_mesh", "scaling_bench",
           "format_scaling_table"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialise the multi-host JAX runtime (DCN).  Returns True when a
    multi-process runtime is active after the call.

    On TPU pods all three parameters autodetect from the metadata server /
    environment; elsewhere pass them explicitly (the standard
    ``jax.distributed.initialize`` contract).  Safe to call repeatedly and
    in single-process runs.
    """
    if jax.process_count() > 1:
        return True
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        # already initialised, or single-process with no coordinator: the
        # single-host path needs no runtime
        pass
    return jax.process_count() > 1


def make_hybrid_mesh(batch: int = 1, devices: Optional[Sequence] = None):
    """A ('batch', 'y', 'x') mesh whose DCN (inter-host) dimension maps to
    the batch axis.

    Per-sweep halo exchange and the convergence norm are the only
    communication in a solve; placing whole grid replicas (batch members)
    per host keeps both on ICI and sends nothing over DCN until results are
    gathered.  Falls back to the flat near-square mesh on one host.
    """
    if devices is None:
        devices = jax.devices()
    n_proc = jax.process_count()
    n = len(devices)
    if n_proc > 1 and batch % n_proc == 0:
        try:
            from jax.experimental import mesh_utils
            from jax.sharding import Mesh
            per_host = n // n_proc
            batch_ici = batch // n_proc           # replicas per host
            ny, nx = _spatial_factor(per_host // batch_ici)
            # per-host (ICI) shape x inter-host (DCN) shape, elementwise
            arr = mesh_utils.create_hybrid_device_mesh(
                (batch_ici, ny, nx), dcn_mesh_shape=(n_proc, 1, 1),
                devices=devices)
            return Mesh(arr, ("batch", "y", "x"))
        except Exception:
            pass
    return make_grid_mesh(batch=batch, devices=devices)


def _spatial_factor(n: int):
    a = int(np.sqrt(n))
    while a > 1 and n % a:
        a -= 1
    return a, n // a


def _omega_problem3(nz, ny, nx, dtype):
    """Synthetic omega-class 3-D problem for the 3-D scaling rows."""
    from ..stencil import standard_3d
    rng = np.random.default_rng(0)
    sh = (nz, ny, nx)
    A = ((np.abs(rng.normal(1.0, 0.1, sh)) + 0.5) * 2e-4).astype(dtype)
    B = (np.abs(rng.normal(1.0, 0.1, sh)) + 0.5).astype(dtype)
    F = rng.normal(0.0, 1e-9, sh).astype(dtype)
    spec = standard_3d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(B),
                       jnp.asarray(F), np.ones(sh, bool),
                       (5e3, 1.1e5, 1.0e5), ("fixed", "extend", "periodic"))
    return spec, jnp.zeros(sh, dtype)


def _bench_once(spec, S0, mesh, omega, n_iters, reps=3,
                executor="gspmd", k_sweeps=1):
    """Median wall time of a fixed-iteration sharded solve, timed by
    chaining dependent runs and forcing a scalar fetch (robust against
    async dispatch through the TPU relay).

    ``executor='gspmd'`` lets the partitioner derive the halo traffic from
    sharding annotations; ``'halo'`` uses the explicit ppermute executor
    (``k_sweeps>1`` for its communication-avoiding mode — the right
    comparison point for latency-bound DCN meshes)."""
    if executor == "gspmd":
        from ..solver import solve_fixed
        spec_sh, S_sh = shard_problem(spec, S0, mesh)
        fn = lambda s: solve_fixed(spec_sh, s, omega, n_iters)
    elif executor in ("halo_window", "halo_window_xy"):
        from .halo_window import solve_fixed_halo_window
        S_sh = S0
        fn = lambda s: solve_fixed_halo_window(spec, s, omega, n_iters,
                                               mesh=mesh)
    elif executor == "halo_window3d":
        from .halo_window3d import solve_fixed_halo_window3d
        S_sh = S0
        fn = lambda s: solve_fixed_halo_window3d(spec, s, omega, n_iters,
                                                 mesh=mesh)
    else:
        from .halo import solve_fixed_halo
        S_sh = S0
        fn = lambda s: solve_fixed_halo(spec, s, omega, n_iters,
                                        mesh=mesh, k_sweeps=k_sweeps)
    fn(S_sh)                       # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        v = float(jnp.sum(jnp.abs(fn(S_sh))))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(v)
    return float(np.median(times))


def scaling_bench(device_counts: Optional[Sequence[int]] = None,
                  base_ny: int = 256, base_nx: int = 256,
                  n_iters: int = 50, mode: str = "weak",
                  dtype=None, executor: str = "gspmd", k_sweeps: int = 1):
    """Throughput vs device count for the flagship masked Poisson.

    ``mode='weak'``: the grid grows with the device count (fixed per-device
    work) — efficiency = per-device throughput / single-device throughput.
    ``mode='strong'``: the global grid is fixed at (base_ny, base_nx).

    Returns a list of row dicts (the BASELINE efficiency-table schema):
    ``{'devices', 'mesh', 'grid', 'pts_per_s', 'pts_per_s_per_device',
    'efficiency'}``.
    """
    import sys
    sys.path.insert(0, __file__.rsplit("/xinvert_tpu/", 1)[0])
    from __graft_entry__ import _poisson_problem

    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    if device_counts is None:
        n = jax.device_count()
        device_counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n]

    rows = []
    base_rate = None
    for c in device_counts:
        if executor == "halo_window":
            # rows-only decomposition
            from jax.sharding import Mesh
            mesh = Mesh(np.array(jax.devices()[:c]).reshape(c, 1),
                        ("y", "x"))
        elif executor == "halo_window3d":
            from jax.sharding import Mesh
            mesh = Mesh(np.array(jax.devices()[:c]).reshape(c), ("y",))
        else:
            # near-square ('y','x') factorization (incl. halo_window_xy:
            # the windowed executor's round-4 column splits)
            mesh = make_grid_mesh(n_devices=c)
        my_, mx_ = mesh.shape["y"], mesh.shape.get("x", 1)
        if mode == "weak":
            ny, nx = base_ny * my_, base_nx * mx_
        else:
            ny, nx = base_ny, base_nx
        if ny % my_ or nx % mx_:
            continue
        if executor == "halo_window3d":
            nz = 24
            spec, S0 = _omega_problem3(nz, ny, nx, dtype)
            dt = _bench_once(spec, S0, mesh, 1.2, n_iters,
                             executor=executor)
            pts0 = nz * ny * nx
        else:
            spec, S0, grid = _poisson_problem(batch=0, ny=ny, nx=nx,
                                              dtype=dtype)
            dt = _bench_once(spec, S0, mesh, grid.omega_opt, n_iters,
                             executor=executor, k_sweeps=k_sweeps)
            pts0 = ny * nx
        pts = pts0 * n_iters / dt
        per_dev = pts / c
        if base_rate is None:
            base_rate = per_dev
        rows.append({
            "devices": c,
            "mesh": f"{my_}x{mx_}",
            "grid": f"{ny}x{nx}",
            "pts_per_s": pts,
            "pts_per_s_per_device": per_dev,
            "efficiency": per_dev / base_rate,
        })
    return rows


def format_scaling_table(rows) -> str:
    head = (f"{'devices':>8} {'mesh':>6} {'grid':>12} "
            f"{'pt-sweeps/s':>12} {'per-device':>12} {'eff':>6}")
    lines = [head]
    for r in rows:
        lines.append(f"{r['devices']:>8} {r['mesh']:>6} {r['grid']:>12} "
                     f"{r['pts_per_s']:>12.3e} "
                     f"{r['pts_per_s_per_device']:>12.3e} "
                     f"{r['efficiency']:>6.2f}")
    return "\n".join(lines)


if __name__ == "__main__":
    rows = scaling_bench()
    print(format_scaling_table(rows))
