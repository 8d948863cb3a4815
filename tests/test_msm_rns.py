"""RNS flat MSM == host oracle (CPU composed path, full 2^16 buckets).

Covers the telescoped bucket reduction ((nb-1)*E_nb - sum E_b), the u16
RNS table conversion (limb-Montgomery -> M-residue channels), and zero
scalars.  Mirrors tests/test_msm.py::test_msm_flat_matches_host.
"""

import random

import numpy as np
import jax.numpy as jnp

from plonk_tpu.field import FR
from plonk_tpu.curve import g1_device as g1
from plonk_tpu.curve.bls12_381 import G1
from plonk_tpu.curve.msm import precompute_shifts
from plonk_tpu.curve.msm_rns import precompute_shifts_rns, msm_flat_rns

R = FR.p
rng = random.Random(77)


def rand_points(n):
    gp = G1.generator()
    return [gp.mul(rng.randrange(1, R)) for _ in range(n)]


def test_msm_flat_rns_matches_host():
    n, K = 12, 2
    pts = rand_points(n)
    dev_pts = jnp.asarray(g1.to_device(pts))
    shifted = precompute_shifts(dev_pts)
    rows = precompute_shifts_rns(shifted)
    assert rows.dtype == jnp.uint16 and rows.shape == (16 * n, 100)
    scalars = [[rng.randrange(R) for _ in range(n)] for _ in range(K)]
    scalars[0][2] = 0
    packed = np.stack(
        [FR.pack([s * FR.R % R for s in col]) for col in scalars], axis=1)
    got = msm_flat_rns(rows, jnp.asarray(packed))
    for k in range(K):
        host = G1.identity()
        for p, s in zip(pts, scalars[k]):
            host = host + p.mul(s)
        assert got[k] == host, k
