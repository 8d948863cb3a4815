"""Host curve layer: group laws, pairing bilinearity, serde roundtrips.

Standing in for the dusk-bls12_381 / dusk-jubjub test surface the reference
relies on (SURVEY.md section 2.2).
"""

import random

import pytest

from plonk_tpu.curve import (
    G1, G2, Fp2, Fp12, pairing, multi_pairing, JubjubPoint, JUBJUB_GENERATOR,
)
from plonk_tpu.curve import jubjub as jj
from plonk_tpu.field import params

rng = random.Random(31337)
R = params.R_MOD


def test_g1_group_law():
    g = G1.generator()
    assert g.is_on_curve() and g.is_torsion_free()
    assert (g + G1.identity()) == g
    assert (g + (-g)).inf
    assert g.mul(2) == g + g
    a, b = rng.randrange(R), rng.randrange(R)
    assert g.mul(a) + g.mul(b) == g.mul((a + b) % R)


def test_g1_known_generator_encoding():
    # canonical zcash-format vector for the BLS12-381 G1 generator
    assert G1.generator().to_compressed().hex() == (
        "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
        "6c55e83ff97a1aeffb3af00adb22c6bb"
    )


def test_g2_known_generator_encoding():
    assert G2.generator().to_compressed().hex() == (
        "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
        "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
        "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
    )


def test_g1_serde_roundtrip():
    g = G1.generator()
    for k in [1, 2, rng.randrange(R)]:
        p = g.mul(k)
        assert G1.from_compressed(p.to_compressed()) == p
        assert G1.from_uncompressed(p.to_uncompressed()) == p
    assert G1.from_compressed(G1.identity().to_compressed()).inf


def test_g1_malformed_rejected():
    with pytest.raises(ValueError):
        G1.from_compressed(bytes(48))  # compression flag clear
    bad = bytearray(G1.generator().to_compressed())
    bad[47] ^= 1  # not on curve (x+1 generally not a curve x)
    with pytest.raises(ValueError):
        G1.from_compressed(bytes(bad))
    bad_inf = bytearray([0xC0] + [0] * 47)
    bad_inf[20] = 1
    with pytest.raises(ValueError):
        G1.from_compressed(bytes(bad_inf))


def test_g2_serde_roundtrip():
    h = G2.generator().mul(rng.randrange(R))
    assert G2.from_compressed(h.to_compressed()) == h


def test_pairing_bilinear():
    g, h = G1.generator(), G2.generator()
    e = pairing(g, h)
    assert e != Fp12.ONE
    a, b = rng.randrange(1 << 64), rng.randrange(1 << 64)
    assert pairing(g.mul(a), h.mul(b)) == e.pow(a * b % R)
    assert pairing(g.mul(a), h) == pairing(g, h.mul(a))
    # e(P, -Q) = e(P, Q)^-1  =>  product cancels
    assert multi_pairing([(g.mul(5), h), (g.mul(5), -h)]) == Fp12.ONE
    assert pairing(G1.identity(), h) == Fp12.ONE


def test_jubjub_group_law():
    g = JUBJUB_GENERATOR
    assert g.is_on_curve() and g.is_prime_order()
    assert (g + JubjubPoint.identity()) == g
    assert (g + (-g)).is_identity()
    a, b = rng.randrange(jj.ORDER), rng.randrange(jj.ORDER)
    assert g.mul(a) + g.mul(b) == g.mul((a + b) % jj.ORDER)
    assert g.mul(jj.ORDER).is_identity()


def test_jubjub_serde():
    p = JUBJUB_GENERATOR.mul(rng.randrange(jj.ORDER))
    assert JubjubPoint.from_bytes(p.to_bytes()) == p


def test_wnaf2():
    for _ in range(20):
        k = rng.randrange(jj.ORDER)
        digits = jj.scalar_to_wnaf2(k)
        assert all(d in (-1, 0, 1) for d in digits)
        # no adjacent nonzeros
        assert all(not (digits[i] and digits[i + 1]) for i in range(len(digits) - 1))
        assert sum(d << i for i, d in enumerate(digits)) == k


def test_fr_sqrt():
    for _ in range(10):
        x = rng.randrange(R)
        s = jj._fr_sqrt(x * x % R)
        assert s is not None and s * s % R == x * x % R
