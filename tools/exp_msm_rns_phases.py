"""Phase breakdown of the RNS flat MSM (curve/msm_rns.py) on the real chip.

Usage: python tools/exp_msm_rns_phases.py [log2n] [K]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_plonk_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plonk_tpu.field import FR
from plonk_tpu.field.rns import CH
from plonk_tpu.field import pallas_rns as prns
from plonk_tpu.kzg import PublicParameters
from plonk_tpu.curve import msm as msm_mod, msm_rns
from bench_util import report, rtt

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def main():
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arch = os.path.join(base, f".bench_srs_{LOG2N}.pta")
    if os.path.exists(arch):
        pp = PublicParameters.from_archive(arch)
    else:
        pp = PublicParameters.setup(1 << LOG2N, secret=0xB0B)
    ck, _ = pp.trim(1 << LOG2N)
    rows = msm_rns.precompute_shifts_rns(ck.device_points_shifted())
    jax.block_until_ready(rows)
    n = rows.shape[0] // 16
    Wn = 16 * n
    print(f"n={n} K={K} Wn={Wn} rtt={rtt()*1e3:.1f}ms")

    rng = np.random.default_rng(5)
    scal = jnp.asarray(
        rng.integers(0, 1 << 16, size=(16, K, n), dtype=np.uint32))

    f_all = jax.jit(msm_rns.msm_flat_rns_device)
    t_all = report("END-TO-END msm_flat_rns", f_all, rows, scal)

    def digits_f(s):
        d = FR.from_mont(s).astype(jnp.int32)
        return jnp.moveaxis(d, 0, 1).reshape(K, Wn)

    dflat = jax.jit(digits_f)(scal)
    report("digits", jax.jit(digits_f), scal)

    def sort_f(d):
        perm = jnp.argsort(d, axis=-1)
        return perm, jnp.take_along_axis(d, perm, axis=-1)

    perm, keys = jax.jit(sort_f)(dflat)
    report("argsort + key gather", jax.jit(sort_f), dflat)

    block = msm_rns.SCAN_BLOCK

    def gatherscan_f(rows, perm):
        return msm_rns._affine_scan_parts_rows(rows, perm, K, Wn, block)

    intra_b, tot_excl = jax.jit(gatherscan_f)(rows, perm)
    report("gather + scan parts (fused)", jax.jit(gatherscan_f), rows, perm,
           work=Wn * K, unit="add")

    nb = msm_rns.FLAT_BUCKETS
    iota = jnp.arange(Wn, dtype=jnp.int32)

    def starts_f(keys):
        def one(sk):
            st = jnp.full((nb,), Wn, jnp.int32).at[sk].min(iota, mode="drop")
            st = jax.lax.associative_scan(jnp.minimum, st, reverse=True)
            return jnp.concatenate([st[1:], jnp.full((1,), Wn, jnp.int32)])
        return jax.vmap(one)(keys)

    pos = jax.jit(starts_f)(keys)
    report("scatter-min starts", jax.jit(starts_f), keys)

    nblk = -(-Wn // block)

    def egather_f(pos, intra_b, tot_excl):
        return msm_rns._gather_prefix_blocked(intra_b, tot_excl, pos,
                                              block, nblk)

    E = jax.jit(egather_f)(pos, intra_b, tot_excl)
    report("E gather + carry fold", jax.jit(egather_f), pos, intra_b,
           tot_excl)

    def sum_f(E):
        return msm_rns._sum_points_last_axis(E[..., :-1])

    report("sum E_1..E_{nb-1}", jax.jit(sum_f), E)

    print(f"\nend-to-end: {t_all*1000:.1f} ms "
          f"({n*K/t_all/1e6:.2f} M msm-points/s)")


if __name__ == "__main__":
    main()
