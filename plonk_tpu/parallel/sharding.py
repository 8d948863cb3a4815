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
             pi_pad, chal):
        wires8 = d8.coset_fft(wires_pad)
        z8 = d8.coset_fft(z_pad)
        pi8 = d8.coset_fft(pi_pad)
        sel_names = (
            "q_m", "q_l", "q_r", "q_o", "q_f", "q_c", "q_arith", "q_range",
            "q_logic", "q_fixed_group_add", "q_variable_group_add",
        )
        sel = {name: sel_evals8[:, i] for i, name in enumerate(sel_names)}
        t = quotient_mod.quotient_evals(
            sel, sigma8, linear8, l1_8, vh_inv8, wires8, z8, pi8, chal)
        return d8.coset_ifft(t)

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
        )
        return args

    return step, make_example_args
