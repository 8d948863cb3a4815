"""Experiment: column-sum strategies for the schoolbook limb convolution.

The Montgomery mul kernel's cost is dominated not by the 576 limb products
but by gathering them into the 49 output columns.  Variants:
  v1 gather: per-column single-sublane-row slices (current pallas_mont)
  v2 roll:   pad lo/hi to (K,T) once per i, sublane-roll by i, full-vreg adds
  v3 horner: shift the accumulator up one row per limb (Horner over limbs)
Usage: python tools/exp_conv.py [log2T]
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

from plonk_tpu.field.pallas_mont import W, MASK, _conv_cols

L = 24
K = 2 * L + 1
TILE = 256


def conv_v2(a, b, L):
    T = a.shape[-1]
    z = jnp.zeros((K - L, T), jnp.uint32)
    acc = jnp.zeros((K, T), jnp.uint32)
    for i in range(L):
        p = a[i][None, :] * b
        lo = jnp.concatenate([p & MASK, z], axis=0)
        hi = jnp.concatenate([p >> W, z], axis=0)
        lo = lo if i == 0 else jnp.roll(lo, i, axis=0)
        acc = acc + lo + jnp.roll(hi, i + 1, axis=0)
    return acc


def conv_v3(a, b, L):
    T = a.shape[-1]
    z = jnp.zeros((K - L, T), jnp.uint32)
    z1 = jnp.zeros((1, T), jnp.uint32)
    acc = jnp.zeros((K, T), jnp.uint32)
    for i in reversed(range(L)):
        p = a[i][None, :] * b
        lo = jnp.concatenate([p & MASK, z], axis=0)
        hi = jnp.concatenate([z1, p >> W, z[1:]], axis=0)
        # acc * 2^16 == shift rows up by one (row k -> k+1)
        acc = jnp.concatenate([z1, acc[:-1]], axis=0)
        acc = acc + lo + hi
    return acc


VARIANTS = {"v1_gather": _conv_cols, "v2_roll": conv_v2, "v3_horner": conv_v3}


def make_kernel(body):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = body(a_ref[:], b_ref[:], L)

    @jax.jit
    def call(a, b):
        n = a.shape[-1]
        spec = pl.BlockSpec((L, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((K, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, n), jnp.uint32),
            grid=(n // TILE,),
            in_specs=[spec, spec],
            out_specs=ospec,
        )(a, b)

    return call


def main():
    log2t = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log2t
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randint(0, 1 << 16, size=(L, n), dtype=np.uint32))
    b = jnp.asarray(rs.randint(0, 1 << 16, size=(L, n), dtype=np.uint32))

    def sync(x):
        return np.asarray(x[..., :1])

    ref = None
    for name, body in VARIANTS.items():
        f = make_kernel(body)
        out = f(a, b)
        sync(out)
        if ref is None:
            ref = np.asarray(out)
        else:
            assert np.array_equal(ref, np.asarray(out)), f"{name} mismatch"
        t0 = time.time()
        for _ in range(5):
            sync(f(a, b))
        dt = (time.time() - t0) / 5
        print(f"{name}: {dt*1e3:8.2f} ms   ({n/dt/1e6:.1f} M conv/s)")


if __name__ == "__main__":
    main()
