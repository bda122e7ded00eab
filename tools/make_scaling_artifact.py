# -*- coding: utf-8 -*-
"""Produce SCALING.json: weak+strong scaling tables on the virtual CPU mesh.

Multi-chip TPU hardware is not available in this environment, so these runs
are a CORRECTNESS CALIBRATION of the sharded executors on N virtual CPU
devices sharing one host's cores — the efficiency columns exercise the
harness and the collective schedule, not ICI.  The same harness runs
unchanged on real slices (parallel/scaling.py).

    python tools/make_scaling_artifact.py          # writes SCALING.json
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    from xinvert_tpu.parallel.scaling import scaling_bench

    note = ("virtual-mesh correctness calibration: 8 CPU devices emulated "
            "on one host's shared cores — validates the sharded executors "
            "and the harness schema, NOT an ICI efficiency measurement "
            "(no multi-chip TPU hardware in this environment; per-device "
            "rates on shared cores can exceed 1.0 'efficiency' when the "
            "single-device baseline underuses the host)")
    out = {"note": note, "platform": "cpu-virtual", "tables": {}}

    for mode in ("weak", "strong"):
        rows = scaling_bench(device_counts=[1, 2, 4, 8],
                             base_ny=256, base_nx=256, n_iters=50,
                             mode=mode, dtype=np.float32)
        out["tables"][f"gspmd_{mode}"] = rows
        print(f"gspmd {mode}: {[f'{r['efficiency']:.2f}' for r in rows]}",
              flush=True)

    # explicit ppermute halo executor, packed (k=1) and comm-avoiding (k=4)
    for k in (1, 4):
        rows = scaling_bench(device_counts=[1, 2, 4, 8],
                             base_ny=256, base_nx=256, n_iters=50,
                             mode="weak", dtype=np.float32,
                             executor="halo", k_sweeps=k)
        out["tables"][f"halo_k{k}_weak"] = rows
        print(f"halo k={k} weak: "
              f"{[f'{r['efficiency']:.2f}' for r in rows]}", flush=True)

    # sharded windowed-Pallas executor (interpret-mode kernel on CPU —
    # pure correctness calibration; Mosaic per-device on a real slice)
    rows = scaling_bench(device_counts=[1, 2, 4, 8],
                         base_ny=128, base_nx=128, n_iters=8,
                         mode="weak", dtype=np.float32,
                         executor="halo_window")
    out["tables"]["halo_window_weak_interpret"] = rows
    print(f"halo_window weak: "
          f"{[f'{r['efficiency']:.2f}' for r in rows]}", flush=True)

    # round 4: ('y','x') column-split windowed executor (near-square
    # meshes, 128-aligned ghost columns) and the sharded 3-D z-windowed
    # executor — correctness-calibration rows like the above
    rows = scaling_bench(device_counts=[1, 2, 4, 8],
                         base_ny=128, base_nx=128, n_iters=8,
                         mode="weak", dtype=np.float32,
                         executor="halo_window_xy")
    out["tables"]["halo_window_xy_weak_interpret"] = rows
    print(f"halo_window_xy weak: "
          f"{[f'{r['efficiency']:.2f}' for r in rows]}", flush=True)

    rows = scaling_bench(device_counts=[1, 2, 4, 8],
                         base_ny=32, base_nx=144, n_iters=8,
                         mode="weak", dtype=np.float32,
                         executor="halo_window3d")
    out["tables"]["halo_window3d_weak_interpret"] = rows
    print(f"halo_window3d weak: "
          f"{[f'{r['efficiency']:.2f}' for r in rows]}", flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING.json")


if __name__ == "__main__":
    main()
