"""Multi-chip scaling: shard the evaluation domain over a device mesh.

The reference is a single-process rayon library (SURVEY.md section 2.3); the
TPU-native scaling axis is the evaluation domain itself:

- Polynomials live as (L, ..., n) tensors sharded on the LAST axis over a 1-D
  mesh axis "d".  Elementwise identity evaluation (the 8n quotient program) is
  embarrassingly parallel and runs with zero communication.
- NTT butterfly stages whose stride crosses shard boundaries become XLA
  collectives automatically under GSPMD: we annotate inputs/outputs with
  NamedSharding and let the compiler insert all-to-alls — the four-step NTT
  factorization, discovered by the compiler instead of hand-written.
- The omega-rotation (roll by 8) becomes a halo exchange (collective-permute).
- MSM shards the *points* axis; per-shard window sums are combined with a
  log-depth point-add reduction (see curve/msm.py + compiler docs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import FR
from ..ntt import EvaluationDomain


def make_domain_mesh(devices=None, axis: str = "d") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(jax.make_mesh((len(devices),), (axis,)).devices, (axis,))


def shard_poly(mesh: Mesh, x, axis: str = "d"):
    """Place an (L, ..., n) limb tensor with the domain axis sharded."""
    spec = P(*([None] * (x.ndim - 1) + [axis]))
    return jax.device_put(x, NamedSharding(mesh, spec))


def sharded_quotient_step(mesh: Mesh, n: int):
    """A jitted, mesh-sharded prover step: coset-NTT the wires onto 8n, run the
    fused 5-family quotient identity program, coset-iNTT back.

    Returns (fn, make_example_args). Under GSPMD the butterfly stages whose
    strides cross shards lower to all-to-all / collective-permute over the mesh.
    """
    from ..proof_system import quotient as quotient_mod

    d8 = EvaluationDomain.get(8 * n)
    spec3 = NamedSharding(mesh, P(None, None, "d"))
    spec2 = NamedSharding(mesh, P(None, "d"))

    @jax.jit
    def step(sel_evals8, sigma8, linear8, l1_8, vh_inv8, wires_pad, z_pad,
             pi_pad, chal, tb8):
        wires8 = d8.coset_fft(wires_pad, tb=tb8)
        z8 = d8.coset_fft(z_pad, tb=tb8)
        pi8 = d8.coset_fft(pi_pad, tb=tb8)
        sel_names = (
            "q_m", "q_l", "q_r", "q_o", "q_f", "q_c", "q_arith", "q_range",
            "q_logic", "q_fixed_group_add", "q_variable_group_add",
        )
        sel = {name: sel_evals8[:, i] for i, name in enumerate(sel_names)}
        t = quotient_mod.quotient_evals(
            sel, sigma8, linear8, l1_8, vh_inv8, wires8, z8, pi8, chal)
        return d8.coset_ifft(t, tb=tb8)

    def make_example_args(rng_seed: int = 0):
        import numpy as np

        rs = np.random.RandomState(rng_seed)

        def r(shape):
            return rs.randint(0, 1 << 16, size=shape).astype(np.uint32)

        m = 8 * n
        args = (
            shard_poly(mesh, r((FR.L, 11, m))),
            shard_poly(mesh, r((FR.L, 4, m))),
            shard_poly(mesh, r((FR.L, m))),
            shard_poly(mesh, r((FR.L, m))),
            shard_poly(mesh, r((FR.L, m))),
            shard_poly(mesh, r((FR.L, 4, m))),
            shard_poly(mesh, r((FR.L, m))),
            shard_poly(mesh, r((FR.L, m))),
            jax.device_put(
                r((FR.L, quotient_mod.NCHAL)),
                NamedSharding(mesh, P(None, None)),
            ),
            {k: shard_poly(mesh, v) if v.shape[-1] % mesh.devices.size == 0
             else v for k, v in d8.tables_dev().items()},
        )
        return args

    return step, make_example_args


def sharded_msm_windows(mesh: Mesh, n_points: int, c: int = 8, axis: str = "d"):
    """Mesh-sharded Pippenger: shard the POINTS axis, reduce window partial
    sums across shards with a collective point-add tree.

    Each shard runs the scatter-free bucket pipeline on its local points; the
    (3, L, W) per-shard window sums are then combined with jax.lax.psum-style
    tree reduction expressed as an all_gather + local fold (point addition is
    not an XLA reduction primitive, so the fold stays explicit — log-depth in
    the shard count via pairwise halving).

    Returns (fn, make_example_args); fn maps (points, scalars) -> (3, L, W)
    global window sums.  Window combine stays on host (curve/msm.py).
    """
    import numpy as np
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from ..curve import msm as msm_mod
    from ..curve import g1_device as g1

    ndev = mesh.devices.size
    assert n_points % ndev == 0

    def local_windows(points, scalars):
        # points: (3, L, n/ndev) local shard; scalars: (16, n/ndev)
        return msm_mod.msm_device(points, scalars, c=c)  # (3, L, W)

    def reduce_shards(windows):
        # windows: (3, L, W) per shard.  all_gather then log-depth pairwise
        # point-add tree (group addition is not an XLA reduction primitive,
        # so the fold is explicit; depth = ceil(log2 ndev) batched padds).
        gathered = jax.lax.all_gather(windows, axis)     # (ndev, 3, L, W)
        k = ndev
        while k > 1:
            half = k // 2
            merged = jax.vmap(g1.padd)(gathered[:half], gathered[half : 2 * half])
            if k % 2:
                merged = jnp.concatenate([merged, gathered[k - 1 : k]], axis=0)
                k = half + 1
            else:
                k = half
            gathered = merged
        return gathered[0]

    def step(points, scalars):
        w = local_windows(points, scalars)
        return reduce_shards(w)

    spec_pts = P(None, None, axis)
    spec_scal = P(None, axis)
    fn = jax.jit(shard_map(
        step, mesh=mesh, in_specs=(spec_pts, spec_scal),
        out_specs=P(None, None, None), check_rep=False,
    ))

    def make_example_args(seed: int = 0):
        import random as _random

        from ..curve.bls12_381 import G1
        from ..field import FR, params

        rs = _random.Random(seed)
        pts = [G1.generator().mul(rs.randrange(1, params.R_MOD))
               for _ in range(n_points)]
        scal = [rs.randrange(params.R_MOD) for _ in range(n_points)]
        dev_pts = jax.device_put(
            jnp.asarray(g1.to_device(pts)), NamedSharding(mesh, spec_pts))
        packed = FR.pack([s * FR.R % params.R_MOD for s in scal])
        dev_scal = jax.device_put(
            jnp.asarray(packed), NamedSharding(mesh, spec_scal))
        return (dev_pts, dev_scal), (pts, scal)

    return fn, make_example_args
