"""Fused Pallas G1 addition vs the composed jnp path and the host oracle
(interpret mode on the CPU CI mesh)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.curve import G1
from plonk_tpu.curve import g1_device as g1
from plonk_tpu.curve import pallas_g1
from plonk_tpu.field import params

rng = random.Random(0x6A11)
R = params.R_MOD


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("PLONK_PALLAS", "interpret")


def rand_points(n):
    g = G1.generator()
    return [g.mul(rng.randrange(1, R)) for _ in range(n)]


def test_fused_padd_matches_host():
    n = pallas_g1.LANE_TILE
    a = rand_points(n - 3) + [G1.identity(), G1.generator(), G1.generator()]
    b = rand_points(n - 3) + [G1.generator(), G1.identity(), G1.generator()]
    da = jnp.asarray(g1.to_device(a))
    db = jnp.asarray(g1.to_device(b))
    out = pallas_g1.padd(da, db)
    assert out is not None
    got = g1.from_device(np.asarray(out))
    assert got == [x + y for x, y in zip(a, b)]


def test_fused_psub_matches_host():
    n = pallas_g1.LANE_TILE
    a = rand_points(n)
    b = rand_points(n - 1) + [a[-1]]  # last: p - p = identity
    da = jnp.asarray(g1.to_device(a))
    db = jnp.asarray(g1.to_device(b))
    out = pallas_g1.padd(da, db, negate_q=True)
    assert out is not None
    got = g1.from_device(np.asarray(out))
    assert got == [x + (-y) for x, y in zip(a, b)]


def test_small_batch_falls_back():
    da = jnp.asarray(g1.to_device(rand_points(4)))
    assert pallas_g1.padd(da, da) is None
