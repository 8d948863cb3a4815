"""Device G1 arithmetic + Pippenger MSM vs the host oracle.

Stands in for dusk-bls12_381's `msm_variable_base` correctness surface
(reference consumes it at kzg10/key.rs:222).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from plonk_tpu.curve import G1
from plonk_tpu.curve import g1_device as g1
from plonk_tpu.curve.msm import msm, window_digits
from plonk_tpu.field import FR, params

rng = random.Random(0xA11CE)
R = params.R_MOD


def rand_points(n):
    g = G1.generator()
    return [g.mul(rng.randrange(1, R)) for _ in range(n)]


def test_padd_matches_host():
    pts_a = rand_points(6) + [G1.identity(), G1.generator(), G1.generator()]
    pts_b = rand_points(6) + [G1.generator(), G1.identity(), -G1.generator()]
    da, db = g1.to_device(pts_a), g1.to_device(pts_b)
    out = g1.from_device(jax.jit(g1.padd)(da, db))
    exp = [a + b for a, b in zip(pts_a, pts_b)]
    assert out == exp


def test_padd_doubling_and_roundtrip():
    pts = rand_points(4)
    d = g1.to_device(pts)
    assert g1.from_device(d) == pts  # roundtrip
    doubled = g1.from_device(jax.jit(g1.padd)(d, d))
    assert doubled == [p + p for p in pts]


def test_window_digits():
    xs = [rng.randrange(R) for _ in range(8)]
    scal = FR.pack(xs)
    digits = np.asarray(window_digits(jnp.asarray(scal), 13))
    for i, x in enumerate(xs):
        rec = sum(int(digits[w, i]) << (13 * w) for w in range(digits.shape[0]))
        assert rec == x


def test_msm_small():
    n = 64
    pts = rand_points(n)
    scalars = [rng.randrange(R) for _ in range(n)]
    # some edge scalars: 0 and 1 and r-1
    scalars[0], scalars[1], scalars[2] = 0, 1, R - 1
    dev_pts = g1.to_device(pts)
    dev_scal = jax.jit(FR.to_mont)(FR.pack(scalars))
    got = msm(dev_pts, dev_scal)
    exp = G1.identity()
    for p, s in zip(pts, scalars):
        exp = exp + p.mul(s)
    assert got == exp


def test_msm_with_identity_points():
    n = 16
    pts = rand_points(n)
    pts[3] = G1.identity()
    pts[7] = G1.identity()
    scalars = [rng.randrange(R) for _ in range(n)]
    got = msm(g1.to_device(pts), jax.jit(FR.to_mont)(FR.pack(scalars)))
    exp = G1.identity()
    for p, s in zip(pts, scalars):
        exp = exp + p.mul(s)
    assert got == exp


def test_msm_batch_matches_individual():
    """K commits in one dispatch == K separate MSMs (curve/msm.py msm_batch)."""
    from plonk_tpu.curve.msm import msm_batch

    n, K = 24, 3
    pts = rand_points(n)
    dev_pts = jnp.asarray(g1.to_device(pts))
    scalars = [[rng.randrange(R) for _ in range(n)] for _ in range(K)]
    packed = np.stack(
        [FR.pack([s * FR.R % R for s in col]) for col in scalars], axis=1)
    batched = msm_batch(dev_pts, jnp.asarray(packed), c=5)
    for k in range(K):
        single = msm(dev_pts, jnp.asarray(packed[:, k]), c=5)
        host = G1.identity()
        for p, s in zip(pts, scalars[k]):
            host = host + p.mul(s)
        assert batched[k] == single == host


def test_msm_flat_matches_host():
    """Flat fixed-base MSM (precomputed 2^16w shifts; the accelerator commit
    path, curve/msm.py msm_flat) == host oracle, incl. zero scalars.

    Bases must be NON-identity (affine pre-shift contract — SRS powers
    tau^i*G never are); identity-point coverage lives on the variable-base
    Pippenger path (test_msm_with_identity_points)."""
    from plonk_tpu.curve.msm import msm_flat, precompute_shifts

    n, K = 12, 2
    pts = rand_points(n)
    dev_pts = jnp.asarray(g1.to_device(pts))
    shifted = precompute_shifts(dev_pts)
    scalars = [[rng.randrange(R) for _ in range(n)] for _ in range(K)]
    scalars[0][2] = 0
    packed = np.stack(
        [FR.pack([s * FR.R % R for s in col]) for col in scalars], axis=1)
    got = msm_flat(shifted, jnp.asarray(packed))
    for k in range(K):
        host = G1.identity()
        for p, s in zip(pts, scalars[k]):
            host = host + p.mul(s)
        assert got[k] == host
