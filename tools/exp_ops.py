"""Raw VPU op-rate microbench inside Pallas: u32 vs f32 multiply, add, fma.

Each kernel does R repetitions of an elementwise op over a (24, T) tile and
writes one output, so per-lane op count is known.  Usage: exp_ops.py [log2T].
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

ROWS = 24
TILE = int(os.environ.get('EXP_TILE', '256'))
R = int(os.environ.get('EXP_R', '64'))


def make(op, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        a, b = a_ref[:], b_ref[:]
        acc = b
        for _ in range(R):
            acc = op(acc, a)
        o_ref[:] = acc

    @jax.jit
    def call(a, b):
        n = a.shape[-1]
        spec = pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, n), dtype),
            grid=(n // TILE,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(a, b)

    return call


CASES = {
    "u32_mul": (lambda x, y: x * y, jnp.uint32),
    "u32_mul16": (lambda x, y: (x & jnp.uint32(0xFFFF)) * (y & jnp.uint32(0xFFFF)), jnp.uint32),
    "u32_add": (lambda x, y: x + y, jnp.uint32),
    "u32_shift": (lambda x, y: (x >> 16) + y, jnp.uint32),
    "f32_mul": (lambda x, y: x * y, jnp.float32),
    "f32_fma": (lambda x, y: x * y + y, jnp.float32),
}


def main():
    log2t = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log2t
    rs = np.random.RandomState(0)

    def sync(x):
        return np.asarray(x[..., :1])

    for name, (op, dtype) in CASES.items():
        if dtype == jnp.uint32:
            a = jnp.asarray(rs.randint(0, 1 << 16, size=(ROWS, n), dtype=np.uint32))
            b = jnp.asarray(rs.randint(0, 1 << 16, size=(ROWS, n), dtype=np.uint32))
        else:
            a = jnp.asarray(rs.rand(ROWS, n).astype(np.float32))
            b = jnp.asarray(rs.rand(ROWS, n).astype(np.float32))
        f = make(op, dtype)
        sync(f(a, b))
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            sync(f(a, b))
        dt = (time.time() - t0) / reps
        ops = ROWS * n * R
        print(f"{name:10s}: {dt*1e3:7.2f} ms  {ops/dt/1e9:8.1f} G ops/s")


CASES = {k: v for k, v in CASES.items() if k in os.environ.get("EXP_CASES", " ".join(CASES)).split()}

if __name__ == "__main__":
    main()
