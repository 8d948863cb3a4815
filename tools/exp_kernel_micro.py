"""Microbenchmark the Pallas field/curve kernels on the real chip.

Answers: what is the raw Fp-mul and G1-add throughput, and how much of the
MSM scan's time is per-step sequencing vs compute?  Run on TPU:

    python tools/exp_kernel_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_plonk_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plonk_tpu.field import FP
from plonk_tpu.curve import g1_device as g1, pallas_g1
from plonk_tpu.curve.bls12_381 import G1

REPS = int(os.environ.get("REPS", "5"))


def timeit(name, fn, *args, work=None, unit="op"):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    rate = f"  {work/dt/1e6:10.1f} M {unit}/s" if work else ""
    print(f"  {name:34s} {dt*1000:9.2f} ms{rate}")
    return out, dt


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(7)

    # Fp mul throughput
    N = 1 << 21
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(FP.L, N), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(FP.L, N), dtype=np.uint32))
    f_mul = jax.jit(FP.mul)
    timeit(f"Fp mul (N=2^21)", f_mul, a, b, work=N, unit="mul")

    # G1 padd kernel throughput (projective, fused)
    M = 1 << 19
    base = G1.generator()
    pt = g1.to_device([base] * 1)
    p = jnp.broadcast_to(pt, (3, FP.L, M))
    f_padd = jax.jit(g1.padd)
    timeit(f"G1 padd (N=2^19)", f_padd, p, p, work=M, unit="add")

    # scan: block sweep at the MSM's actual shape Wn=2^20, affine inputs
    Wn = 1 << 20
    aff = jnp.broadcast_to(pt[:2], (2, FP.L, Wn))
    for blk in (32, 64, 128, 256):
        f = jax.jit(lambda x, blk=blk: pallas_g1.prefix_scan_affine_parts(
            x, blk))
        timeit(f"affine scan parts blk={blk}", f, aff, work=Wn, unit="add")

    # LANE_TILE effect: env PLONK_G1_TILE must be set before import, so just
    # note the current value
    print(f"  (LANE_TILE={pallas_g1.LANE_TILE})")


if __name__ == "__main__":
    main()
