# -*- coding: utf-8 -*-
"""Quick TPU-relay health probe.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_health.py

Reports backend identity and round-trips a tiny computation.  Through the
axon relay a healthy init takes seconds; when the remote tile is wedged or
down, backend init retries internally for ~25 minutes before raising
UNAVAILABLE — this probe caps its own wait so a cron/driver check fails
fast.  Exit 0 = healthy, 1 = unavailable/timeout.

Known failure mode (2026-08-18): killing a python mid-TPU-compile leaves
the session's grant held; subsequent backend inits hang/err UNAVAILABLE
until the server side recovers (observed multi-hour).  Never run the CPU
test suite concurrently with a TPU compile, and never `timeout`-kill a
process that may be mid-compile — use generous budgets instead.
"""
import multiprocessing as mp
import sys
import time


def _probe(q):
    t0 = time.time()
    try:
        import jax
        import jax.numpy as jnp
        backend = jax.default_backend()
        val = float(jnp.sum(jnp.ones((256, 256))))
        q.put(("ok", backend, val, time.time() - t0))
    except Exception as e:  # noqa: BLE001 - report any init failure
        q.put(("err", type(e).__name__, str(e)[:200], time.time() - t0))


def main(wait_s: float = 120.0) -> int:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_probe, args=(q,))
    p.start()
    p.join(wait_s)
    if p.is_alive():
        # init still retrying; losing an INIT (not a compile) is safe
        p.terminate()
        p.join()
        print(f"UNHEALTHY: backend init still blocked after {wait_s:.0f}s "
              "(relay wedged or remote tile down)")
        return 1
    kind, *rest = q.get()
    if kind == "ok":
        backend, val, dt = rest
        print(f"HEALTHY: backend={backend}, 256x256 sum={val:.0f} "
              f"({dt:.1f}s)")
        return 0
    name, msg, dt = rest
    print(f"UNHEALTHY: {name} after {dt:.0f}s: {msg}")
    return 1


if __name__ == "__main__":
    wait = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    sys.exit(main(wait))
