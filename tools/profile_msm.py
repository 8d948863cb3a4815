"""Stage-by-stage MSM timing on the real device.

Usage: python tools/profile_msm.py [log2n] [c]
Times each phase of the scatter-free Pippenger pipeline (digits/sort/gather,
point prefix-scan, bucket diff, suffix reduction) with explicit syncs, plus
the end-to-end jitted msm, so optimization effort lands where the time is.
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

from plonk_tpu.field import FR, params
from plonk_tpu.curve import msm as msm_mod
from plonk_tpu.curve import g1_device as g1


def timeit(fn, *args, reps=5, warm=1):
    # axon's block_until_ready is unreliable; force a host readback instead
    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])

    for _ in range(warm):
        sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    return (time.time() - t0) / reps, out


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = (1 << log2n) + 7
    c = int(sys.argv[2]) if len(sys.argv) > 2 else msm_mod.best_window_bits(n)
    print(f"n={n} c={c} backend={jax.default_backend()}")

    rs = np.random.RandomState(0)
    pts = rs.randint(0, 1 << 16, size=(3, FR.L + 8, n), dtype=np.uint32)
    pts = jnp.asarray(pts)  # junk coords are fine for timing
    scal = jnp.asarray(rs.randint(0, 1 << 16, size=(16, n), dtype=np.uint32))

    digits = jax.jit(lambda s: msm_mod.window_digits(FR.from_mont(s), c))
    dt, dg = timeit(digits, scal)
    print(f"digits:           {dt*1e3:8.1f} ms  {dg.shape}")

    sortfn = jax.jit(lambda d: jnp.argsort(d, axis=-1))
    dt, perm = timeit(sortfn, dg)
    print(f"argsort:          {dt*1e3:8.1f} ms")

    gather = jax.jit(lambda p, pm: jnp.take(p, pm, axis=2))
    dt, spts = timeit(gather, pts, perm)
    print(f"point gather:     {dt*1e3:8.1f} ms  {spts.shape}")

    scan = jax.jit(msm_mod._prefix_scan_points)
    dt, pref = timeit(scan, spts, reps=3)
    print(f"prefix scan:      {dt*1e3:8.1f} ms")

    W = dg.shape[0]
    nb = 1 << c
    buckets_shape = (3, FR.L + 8, W, nb)
    bk = jnp.asarray(rs.randint(0, 1 << 16, size=buckets_shape, dtype=np.uint32))
    suffix = jax.jit(lambda b: msm_mod._sum_points_last_axis(
        jnp.flip(msm_mod._prefix_scan_points(jnp.flip(b, axis=-1)), axis=-1)[..., 1:]))
    dt, _ = timeit(suffix, bk, reps=3)
    print(f"bucket suffix+sum:{dt*1e3:8.1f} ms  buckets {buckets_shape}")

    full = msm_mod._msm_jit(c)
    dt, _ = timeit(full, pts, scal, reps=3)
    print(f"full msm_device:  {dt*1e3:8.1f} ms")

    # K=2 batched
    scal2 = jnp.stack([scal, scal], axis=1)
    dt, _ = timeit(full, pts, scal2, reps=3)
    print(f"msm_device K=2:   {dt*1e3:8.1f} ms")

    # flat fixed-base pipeline
    Wn = msm_mod.FLAT_W * n
    shifted = jnp.asarray(
        rs.randint(0, 1 << 16, size=(msm_mod.FLAT_W, n, 3, FR.L + 8),
                   dtype=np.uint32))
    dig = jax.jit(lambda s: jnp.moveaxis(
        msm_mod.FR.from_mont(s[:, None, :]).astype(jnp.int32), 0, 1
    ).reshape(1, Wn))
    dt, dflat = timeit(dig, scal)
    print(f"flat digits:      {dt*1e3:8.1f} ms  {dflat.shape}")
    sortf = jax.jit(lambda d: jnp.argsort(d, axis=-1))
    dt, fperm = timeit(sortf, dflat)
    print(f"flat argsort 16n: {dt*1e3:8.1f} ms")
    gath = jax.jit(lambda P, pm: jnp.moveaxis(
        jnp.take(P.reshape(Wn, 3 * (FR.L + 8)), pm, axis=0), -1, 0
    ).reshape(3, FR.L + 8, 1, Wn))
    dt, fspts = timeit(gath, shifted, fperm)
    print(f"flat gather:      {dt*1e3:8.1f} ms  {fspts.shape}")
    dt, _ = timeit(jax.jit(msm_mod._prefix_scan_points), fspts, reps=3)
    print(f"flat scan 16n:    {dt*1e3:8.1f} ms")
    bshape = (3, FR.L + 8, 1, 1 << 16)
    bk2 = jnp.asarray(rs.randint(0, 1 << 16, size=bshape, dtype=np.uint32))
    suf2 = jax.jit(lambda b: msm_mod._sum_points_last_axis(
        jnp.flip(msm_mod._prefix_scan_points(jnp.flip(b, axis=-1)),
                 axis=-1)[..., 1:]))
    dt, _ = timeit(suf2, bk2, reps=3)
    print(f"flat suffix 2^16: {dt*1e3:8.1f} ms")
    flat = msm_mod._msm_flat_jit()
    dt, _ = timeit(flat, shifted, scal, reps=3)
    print(f"flat msm (K=1):   {dt*1e3:8.1f} ms")
    dt, _ = timeit(flat, shifted, scal2, reps=3)
    print(f"flat msm (K=2):   {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
