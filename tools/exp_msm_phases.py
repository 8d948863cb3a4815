"""Decompose msm_flat wall time into phases on the real chip.

Phases: digit extraction, argsort(+key gather), row gather, intra scan,
block-total recursion, bucket gathers (excl_at), bucket suffix reduction.
Each phase is jitted separately so its cost is observable; the sum exceeds
the fused end-to-end time (XLA fuses/overlaps), but the RATIO tells us what
to attack.

Timing uses tools/bench_util.py (queued reps + dependent-probe sync — plain
block_until_ready lies through the axon tunnel).

Usage: python tools/exp_msm_phases.py [log2n] [K]
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

from plonk_tpu.field import FR, FP
from plonk_tpu.kzg import PublicParameters
from plonk_tpu.curve import msm as msm_mod
from plonk_tpu.curve import pallas_g1, g1_device as g1
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
    shifted = ck.device_points_shifted()
    jax.block_until_ready(shifted)
    n = shifted.shape[1]
    Wn = 16 * n
    print(f"n={n} K={K} Wn={Wn} backend={jax.default_backend()} "
          f"rtt={rtt()*1e3:.1f}ms")

    rng = np.random.default_rng(5)
    scal = jnp.asarray(
        rng.integers(0, 1 << 16, size=(16, K, n), dtype=np.uint32))

    f_all = jax.jit(msm_mod.msm_flat_device)
    t_all = report("END-TO-END msm_flat", f_all, shifted, scal)

    # phase 1: digits + reshape
    def digits_f(scalars_mont):
        digits = FR.from_mont(scalars_mont).astype(jnp.int32)
        return jnp.moveaxis(digits, 0, 1).reshape(K, Wn)

    dflat = jax.jit(digits_f)(scal)
    report("digits (from_mont)", jax.jit(digits_f), scal)

    # phase 2: argsort + sorted keys
    def sort_f(dflat):
        perm = jnp.argsort(dflat, axis=-1)
        keys = jnp.take_along_axis(dflat, perm, axis=-1)
        return perm, keys

    perm, keys = jax.jit(sort_f)(dflat)
    report("argsort + key gather", jax.jit(sort_f), dflat)

    # phase 3: row gather (the 192B/point point-major gather)
    rows = shifted.reshape(Wn, 2 * FP.L)

    def gather_f(rows, perm):
        srows = jnp.take(rows, perm, axis=0)
        return jnp.moveaxis(srows, -1, 0).reshape(2, FP.L, K, Wn)

    spts = jax.jit(gather_f)(rows, perm)
    report("row gather", jax.jit(gather_f), rows, perm)

    # phase 4: intra-block scan (the big one)
    def scan_f(spts):
        return pallas_g1.prefix_scan_affine_parts(spts, msm_mod.SCAN_BLOCK)

    intra, tot_excl = jax.jit(scan_f)(spts)
    report("blocked scan (parts)", jax.jit(scan_f), spts,
           work=Wn * K, unit="add")

    # phase 5: bucket boundaries + gathers + psub
    nb = msm_mod.FLAT_BUCKETS
    bucket_ids = jnp.arange(nb, dtype=jnp.int32)

    def buckets_f(keys, intra, tot_excl):
        starts = jax.vmap(
            lambda sk: jnp.searchsorted(sk, bucket_ids, side="left"))(keys)
        ends = jax.vmap(
            lambda sk: jnp.searchsorted(sk, bucket_ids, side="right"))(keys)

        def excl_at(pos):
            pm1 = jnp.maximum(pos - 1, 0)
            ia = jnp.take_along_axis(intra, pm1[None, None], axis=-1)
            tb = jnp.take_along_axis(
                tot_excl, (pm1 // msm_mod.SCAN_BLOCK)[None, None], axis=-1)
            val = g1.padd(ia, tb)
            ident = g1.identity_dev((K, pos.shape[-1]))
            return jnp.where((pos == 0)[None, None], ident, val)

        return g1.psub(excl_at(ends), excl_at(starts))

    buckets = jax.jit(buckets_f)(keys, intra, tot_excl)
    report("bucket boundary phase", jax.jit(buckets_f), keys, intra, tot_excl)

    # phase 6: weighted suffix reduction
    def reduce_f(buckets):
        rev = jnp.flip(buckets, axis=-1)
        suff = jnp.flip(msm_mod._prefix_scan_points(rev), axis=-1)
        return msm_mod._sum_points_last_axis(suff[..., 1:])

    report("weighted suffix reduce", jax.jit(reduce_f), buckets)

    print(f"\nend-to-end: {t_all*1000:.1f} ms "
          f"({n*K/t_all/1e6:.2f} M msm-points/s, "
          f"{Wn*K/t_all/1e6:.1f} M scan-adds/s)")


if __name__ == "__main__":
    main()
