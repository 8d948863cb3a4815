"""Trusted device timing through the axon TPU tunnel.

Two facts about this environment (measured, 2026-08-21):
  * The tunnel RTT is ~25 ms; any per-iteration host sync is swamped by it.
  * ``jax.block_until_ready`` on LARGE device buffers returns before the
    computation finishes (small results are inlined by the relay and do
    block).  Naive timeit loops report impossible numbers (3215 TFLOP/s).

Protocol: queue ``reps`` dispatches (the device runs them serially), then
force completion with a tiny dependent probe (first element of every leaf,
fetched to host).  exec_time = (total - RTT) / reps.  Keep the queued work
under ~2 s — flooding the queue with un-synced multi-GB programs has wedged
the backend (FAILED_PRECONDITION on every readback for ~1 min).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import tree_util


@jax.jit
def _probe_leaf(t):
    return jax.lax.slice(t.ravel(), (0,), (1,))


def sync(out) -> None:
    """Force completion of every array leaf in ``out`` via a host fetch."""
    for leaf in tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            np.asarray(_probe_leaf(leaf))


_RTT: float | None = None


def rtt() -> float:
    """One-way-and-back latency of a tiny dispatch + readback."""
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1)
        z = jnp.zeros((), jnp.float32)
        np.asarray(f(z))
        t0 = time.time()
        for _ in range(10):
            np.asarray(f(z))
        _RTT = (time.time() - t0) / 10
    return _RTT


def _nbytes(out) -> int:
    return sum(leaf.nbytes for leaf in tree_util.tree_leaves(out)
               if isinstance(leaf, jax.Array))


def device_time(fn, *args, reps: int = 0, budget_s: float = 1.5,
                max_reps: int = 64, mem_budget: int = 4 << 30) -> float:
    """Seconds of device execution per call of ``fn(*args)``.

    Warm-up (compile) first, then a calibration run picks ``reps`` so the
    queued work stays under ``budget_s`` while amortizing the RTT.  Queued
    outputs all stay live until the sync, so groups are capped at
    ``mem_budget`` bytes of output to avoid device OOM.
    """
    out = fn(*args)
    sync(out)
    r = rtt()
    if not reps:
        t0 = time.time()
        sync(fn(*args))
        one = max(time.time() - t0 - r, 1e-5)
        reps = max(1, min(max_reps, int(budget_s / one)))
    group = max(1, min(reps, mem_budget // max(_nbytes(out), 1)))
    done, total = 0, 0.0
    while done < reps:
        g = min(group, reps - done)
        t0 = time.time()
        outs = [fn(*args) for _ in range(g)]
        sync(outs[-1])
        total += time.time() - t0 - r
        done += g
        del outs
    return max(total / reps, 0.0)


def report(name: str, fn, *args, work: float | None = None,
           unit: str = "op", **kw) -> float:
    dt = device_time(fn, *args, **kw)
    rate = f"  {work/dt/1e6:10.2f} M {unit}/s" if work else ""
    print(f"  {name:36s} {dt*1000:9.2f} ms{rate}")
    return dt
