"""Stage timing for round 3 (quotient): coset FFTs, identity eval, IFFT.

Synthetic Montgomery-range data at the bench size; explicit syncs per stage.
Usage: python tools/profile_round3.py [log2n]
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
from plonk_tpu.ntt import EvaluationDomain
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
    d8 = EvaluationDomain.get(m)
    d8.tables()
    rs = np.random.RandomState(0)

    def r(shape):
        return jnp.asarray(
            rs.randint(0, 1 << 15, size=shape).astype(np.uint32))

    wires_pad = r((FR.L, 4, m))
    z_pad = r((FR.L, m))

    t = timeit(jax.jit(d8.coset_fft), z_pad)
    print(f"coset_fft 8n (1 poly):   {t*1e3:8.1f} ms")
    t = timeit(jax.jit(d8.coset_fft), wires_pad)
    print(f"coset_fft 8n (4 polys):  {t*1e3:8.1f} ms")
    t = timeit(jax.jit(d8.coset_ifft), z_pad)
    print(f"coset_ifft 8n (1 poly):  {t*1e3:8.1f} ms")

    sel = {name: r((FR.L, m)) for name in (
        "q_m", "q_l", "q_r", "q_o", "q_f", "q_c", "q_arith", "q_range",
        "q_logic", "q_fixed_group_add", "q_variable_group_add")}
    sigma8 = r((FR.L, 4, m))
    wires8 = r((FR.L, 4, m))
    lin8 = r((FR.L, m))
    chal = jnp.asarray(np.asarray(quotient_mod.pack_challenges(
        3, 5, 7, 11, 13, 17, 19)))
    qfn = jax.jit(lambda *a: quotient_mod.quotient_evals(
        sel, sigma8, lin8, a[0], a[1], wires8, a[2], a[3], chal))
    t = timeit(qfn, lin8, lin8, z_pad, z_pad)
    print(f"quotient_evals 8n:       {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
