"""Pallas Montgomery-mul kernel logic vs the jnp/host oracles.

On the CPU CI mesh the kernel runs in Pallas interpret mode
(PLONK_PALLAS=interpret), which executes the same traced program the Mosaic
compiler lowers on TPU — full logic coverage without the hardware.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.field import FR, FP
from plonk_tpu.field import pallas_mont

rng = random.Random(0x9A11A5)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("PLONK_PALLAS", "interpret")


@pytest.mark.parametrize("F", [FR, FP], ids=["Fr", "Fp"])
def test_pallas_mul_matches_host(F):
    n = pallas_mont.LANE_TILE + 17   # force padding path
    xs = [rng.randrange(F.p) for _ in range(n)]
    ys = [rng.randrange(F.p) for _ in range(n)]
    xs[0], ys[1] = 0, 0
    xs[2] = F.p - 1
    ys[2] = F.p - 1
    out = pallas_mont.mont_mul(F, jnp.asarray(F.pack(xs)),
                               jnp.asarray(F.pack(ys)))
    assert out is not None
    got = F.unpack(np.asarray(out))
    Rinv = pow(1 << (16 * F.L), -1, F.p)
    assert got == [x * y * Rinv % F.p for x, y in zip(xs, ys)]


def test_pallas_mul_broadcast_and_small_fallback():
    # small batch -> None (jnp path)
    a = jnp.asarray(FR.pack([5]))
    assert pallas_mont.mont_mul(FR, a, a) is None
    # broadcast (L, 1, n) x (L, k, 1) handled by the wrapper
    n = pallas_mont.LANE_TILE
    xs = [rng.randrange(FR.p) for _ in range(n)]
    y = rng.randrange(FR.p)
    av = jnp.asarray(FR.pack(xs))[:, None, :]       # (L, 1, n)
    bv = jnp.asarray(FR.pack([y]))[:, :, None]      # (L, 1, 1)
    out = pallas_mont.mont_mul(FR, av, bv)
    assert out is not None and out.shape == (FR.L, 1, n)
    got = FR.unpack(np.asarray(out))
    Rinv = pow(1 << (16 * FR.L), -1, FR.p)
    assert got == [x * y * Rinv % FR.p for x in xs]


def test_off_mode(monkeypatch):
    monkeypatch.setenv("PLONK_PALLAS", "off")
    n = pallas_mont.LANE_TILE
    a = jnp.asarray(FR.pack([1] * n))
    assert pallas_mont.mont_mul(FR, a, a) is None


def test_butterfly_matches_oracle(monkeypatch):
    """Fused NTT butterfly (mul+add+sub in one kernel) vs composed FR ops."""
    monkeypatch.setenv("PLONK_PALLAS", "off")
    n = 1024
    rng = np.random.default_rng(7)
    vals = lambda: [int(x) % FR.p for x in
                    rng.integers(0, 2**63, size=(n,)) * rng.integers(1, 2**63)]
    u, t, tw = (jnp.asarray(np.asarray(FR.pack(v))) for v in (vals(), vals(), vals()))
    prod = FR.mul(t, tw)
    want_hi, want_lo = FR.add(u, prod), FR.sub(u, prod)
    monkeypatch.setenv("PLONK_PALLAS", "interpret")
    got = pallas_mont.mont_butterfly(FR, u, t, tw)
    assert got is not None
    hi, lo = got
    assert bool(jnp.all(hi == want_hi)) and bool(jnp.all(lo == want_lo))
