"""Round-3 stage timing on the real device: coset FFTs, fused identity
program, inverse FFT — the non-MSM half of the quotient round.

Usage: python tools/profile_quotient.py [log2n]
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


def timeit(fn, *args, reps=5, warm=1):
    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])

    for _ in range(warm):
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
    print(f"n=2^{log2n} backend={jax.default_backend()}")

    rs = np.random.RandomState(0)

    def r(shape):
        return jnp.asarray(rs.randint(0, 1 << 16, size=shape, dtype=np.uint32))

    x1 = r((FR.L, m))
    x2 = r((FR.L, 2, m))
    print(f"coset_fft (L,8n):   {timeit(jax.jit(d8.coset_fft), x1, reps=3)*1e3:8.1f} ms")
    print(f"coset_fft (L,2,8n): {timeit(jax.jit(d8.coset_fft), x2, reps=3)*1e3:8.1f} ms")
    print(f"coset_ifft (L,8n):  {timeit(jax.jit(d8.coset_ifft), x1, reps=3)*1e3:8.1f} ms")
    print(f"fft (L,8n):         {timeit(jax.jit(d8.fft), x1, reps=3)*1e3:8.1f} ms")

    sel_names = ("q_m", "q_l", "q_r", "q_o", "q_f", "q_c", "q_arith",
                 "q_range", "q_logic", "q_fixed_group_add",
                 "q_variable_group_add")
    args = (r((FR.L, 11, m)), r((FR.L, 4, m)), r((FR.L, m)), r((FR.L, m)),
            r((FR.L, m)), r((FR.L, 4, m)), r((FR.L, m)), r((FR.L, m)),
            r((FR.L, quotient_mod.NCHAL)))

    @jax.jit
    def qevals(sel_evals8, sigma8, linear8, l1_8, vh_inv8, wires8, z8, pi8, chal):
        sel = {nm: sel_evals8[:, i] for i, nm in enumerate(sel_names)}
        return quotient_mod.quotient_evals(
            sel, sigma8, linear8, l1_8, vh_inv8, wires8, z8, pi8, chal)

    print(f"quotient_evals:     {timeit(qevals, *args, reps=3)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
