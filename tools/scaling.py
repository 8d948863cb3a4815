"""Scaling measurement: sharded-MSM and four-step-NTT throughput vs device
count on the virtual CPU mesh (BASELINE.md "near-linear MSM/NTT ops/s at
1 chip -> N devices"; VERDICT r2 item 5).

Writes SCALING.json at the repo root:
  {"ntt4": {"n": ..., "devices": {"1": ops_per_s, "2": ..., ...},
            "efficiency_8dev": ...},
   "msm":  {...}}

Numbers on the virtual CPU mesh measure the COMMUNICATION/PARTITION
structure (collective counts, balance), not TPU silicon speed — the same
shard_map programs run unchanged on a real multi-chip mesh.  Run:

  python tools/scaling.py [--sizes 16,18] [--devices 1,2,4,8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_base, ".xla_dryrun_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def bench_ntt4(n: int, ndev: int, reps: int = 5) -> float:
    """Four-step NTT transforms/s over an ndev-device mesh."""
    from plonk_tpu.field import FR
    from plonk_tpu.parallel import make_domain_mesh
    from plonk_tpu.parallel.ntt4 import Ntt4

    mesh = make_domain_mesh(jax.devices()[:ndev])
    plan = Ntt4(n, mesh)
    rs = np.random.RandomState(7)
    x = plan.shard(jnp.asarray(
        rs.randint(0, 1 << 16, size=(FR.L, n)).astype(np.uint32)))
    jax.block_until_ready(plan.fft(x))  # compile
    t0 = time.time()
    r = None
    for _ in range(reps):
        r = plan.fft(x)
    jax.block_until_ready(r)
    return reps / (time.time() - t0)


def bench_sharded_msm(n: int, ndev: int, reps: int = 3) -> float:
    """Sharded-Pippenger window-phase points/s over an ndev-device mesh."""
    from plonk_tpu.parallel import make_domain_mesh
    from plonk_tpu.parallel.sharding import sharded_msm_windows

    mesh = make_domain_mesh(jax.devices()[:ndev])
    fn, make_args = sharded_msm_windows(mesh, n, c=8)
    (pts, scal), _ = make_args(seed=1)
    jax.block_until_ready(fn(pts, scal))  # compile
    t0 = time.time()
    r = None
    for _ in range(reps):
        r = fn(pts, scal)
    jax.block_until_ready(r)
    return n * reps / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ntt-log2n", type=int, default=16)
    ap.add_argument("--msm-points", type=int, default=1 << 12)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--out", default=os.path.join(_base, "SCALING.json"))
    args = ap.parse_args()
    devs = [int(d) for d in args.devices.split(",")]

    out = {"platform": "cpu-virtual (structure check; same shard_map "
                       "programs run on real ICI meshes)",
           "ntt4": {"n": 1 << args.ntt_log2n, "devices": {}},
           "msm": {"points": args.msm_points, "devices": {}}}
    for d in devs:
        ops = bench_ntt4(1 << args.ntt_log2n, d)
        out["ntt4"]["devices"][str(d)] = round(ops, 3)
        print(f"# ntt4 n=2^{args.ntt_log2n} {d} dev: {ops:.3f} ffts/s",
              file=sys.stderr, flush=True)
    for d in devs:
        pps = bench_sharded_msm(args.msm_points, d)
        out["msm"]["devices"][str(d)] = round(pps)
        print(f"# sharded msm n={args.msm_points} {d} dev: {pps:.0f} pts/s",
              file=sys.stderr, flush=True)

    # On this 1-core host all virtual devices share one physical core, so
    # aggregate ops/s CANNOT rise with device count — the meaningful signal
    # is comm_overhead_Ddev = t(D)/t(1) for the SAME total problem: 1.0
    # means the shard_map collectives (all-to-alls, reduce trees) add no
    # work, which predicts near-linear scaling once each shard has its own
    # silicon (BASELINE.md target).  Values <= ~1.2 are healthy.
    for key in ("ntt4", "msm"):
        dv = out[key]["devices"]
        if "1" in dv and str(max(devs)) in dv:
            d = max(devs)
            out[key][f"comm_overhead_{d}dev"] = round(
                dv["1"] / dv[str(d)], 3)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
