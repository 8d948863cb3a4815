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

    def gather_f(rows, perm):
        srows = jnp.take(rows, perm, axis=0)
        return jnp.moveaxis(srows.astype(jnp.uint32), -1, 0).reshape(
            2, CH, K, Wn)

    spts = jax.jit(gather_f)(rows, perm)
    report("row gather (u16)", jax.jit(gather_f), rows, perm)

    def scan_f(spts):
        return msm_rns._affine_scan_parts(spts, msm_rns.SCAN_BLOCK)

    intra, tot_excl = jax.jit(scan_f)(spts)
    report("affine scan parts", jax.jit(scan_f), spts,
           work=Wn * K, unit="add")

    nb = msm_rns.FLAT_BUCKETS
    bucket_ids = jnp.arange(1, nb + 1, dtype=jnp.int32)

    def epos_f(keys):
        return jax.vmap(lambda sk: jnp.searchsorted(
            sk, bucket_ids, side="left"))(keys)

    pos = jax.jit(epos_f)(keys)
    report("searchsorted", jax.jit(epos_f), keys)

    def egather_f(pos, intra, tot_excl):
        pm1 = jnp.maximum(pos - 1, 0)
        ia = jnp.take_along_axis(intra, pm1[None, None], axis=-1)
        tb = jnp.take_along_axis(
            tot_excl, (pm1 // msm_rns.SCAN_BLOCK)[None, None], axis=-1)
        val = prns.rns_padd(ia, tb)
        ident = prns.rns_identity((K, pos.shape[-1]))
        return jnp.where((pos == 0)[None, None], ident, val)

    E = jax.jit(egather_f)(pos, intra, tot_excl)
    report("E gather + carry fold", jax.jit(egather_f), pos, intra, tot_excl)

    def sum_f(E):
        return msm_rns._sum_points_last_axis(E[..., :-1])

    report("sum E_1..E_{nb-1}", jax.jit(sum_f), E)

    print(f"\nend-to-end: {t_all*1000:.1f} ms "
          f"({n*K/t_all/1e6:.2f} M msm-points/s)")


if __name__ == "__main__":
    main()
