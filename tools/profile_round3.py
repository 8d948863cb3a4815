"""Round-3 breakdown: the real _round3_jit graph vs the K=4 quotient commit.

All tensors cross as jit ARGUMENTS (captured constants overflow the axon
remote-compile request).  Usage: python tools/profile_round3.py [log2n]
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

from plonk_tpu.field import FR
from plonk_tpu.compiler import _round3_jit, _round1_jit, _round2_jit, PAD
from plonk_tpu.proof_system.keys import SELECTOR_ORDER
from plonk_tpu.proof_system import quotient as quotient_mod


def timeit(fn, *args, reps=3):
    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf[..., :1])

    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        sync(fn(*args))
    return (time.time() - t0) / reps


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << log2n
    m = 8 * n
    rs = np.random.RandomState(0)

    def r(shape):
        return jnp.asarray(
            rs.randint(0, 1 << 15, size=shape).astype(np.uint32))

    sel8 = r((FR.L, len(SELECTOR_ORDER), m))
    sigma8 = r((FR.L, 4, m))
    lin8, l1_8, vh8 = r((FR.L, m)), r((FR.L, m)), r((FR.L, m))
    wire_polys = r((FR.L, 4, n + PAD))
    z_poly = r((FR.L, n + PAD))
    pi = r((FR.L, n))
    chal = jnp.asarray(np.asarray(
        quotient_mod.pack_challenges(3, 5, 7, 11, 13, 17, 19)))
    tbl = r((FR.L, 3))

    t = timeit(_round3_jit(n), sel8, sigma8, lin8, l1_8, vh8,
               wire_polys, z_poly, pi, chal, tbl)
    print(f"round3 device graph (ffts+quotient+ifft): {t*1e3:8.1f} ms")

    t = timeit(_round1_jit(n), r((FR.L, 4, n)), r((FR.L, 4, 2)))
    print(f"round1 device graph (4x blind ifft):      {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
