"""Polynomial / Evaluations value types (reference fft/polynomial.rs,
fft/evaluations.rs) — algebra, FFT-mul, ruffini, strict serde."""

import pytest

from plonk_tpu.field import params
from plonk_tpu.kzg import Polynomial, Evaluations
from plonk_tpu.ntt import EvaluationDomain
from plonk_tpu.utils.errors import InvalidBytes, BlsScalarMalformed

R = params.R_MOD


def poly_eval_host(coeffs, z):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % R
    return acc


def test_zero_and_degree():
    z = Polynomial.zero()
    assert z.is_zero() and z.degree() == 0 and len(z) == 0
    # leading zeros dropped (polynomial.rs:79-93)
    p = Polynomial.from_coefficients([5, 0, 7, 0, 0])
    assert len(p) == 3 and p.degree() == 2
    assert Polynomial.from_coefficients([0, 0]).is_zero()


def test_add_sub_neg_scale():
    a = Polynomial.from_coefficients([1, 2, 3])
    b = Polynomial.from_coefficients([10, 20])
    s = a + b
    assert s.to_ints() == [11, 22, 3]
    d = a - b
    assert d.to_ints() == [(1 - 10) % R, (2 - 20) % R, 3]
    n = -a
    assert (a + n).is_zero()
    assert a.scale(3).to_ints() == [3, 6, 9]


def test_fft_mul_matches_schoolbook():
    av = [3, 1, 4, 1, 5]
    bv = [2, 7, 1, 8]
    a = Polynomial.from_coefficients(av)
    b = Polynomial.from_coefficients(bv)
    prod = a * b
    want = [0] * (len(av) + len(bv) - 1)
    for i, x in enumerate(av):
        for j, y in enumerate(bv):
            want[i + j] = (want[i + j] + x * y) % R
    assert prod.to_ints() == want
    assert (a * Polynomial.zero()).is_zero()


def test_evaluate_and_ruffini():
    coeffs = [9, 8, 7, 6, 5, 4, 3]
    p = Polynomial.from_coefficients(coeffs)
    z = 0xDEADBEEF
    assert p.evaluate(z) == poly_eval_host(coeffs, z)
    q = p.ruffini(z)
    # p(X) - p(z) == (X - z) * q(X): check at a fresh point
    w = 0xABCDEF
    lhs = (p.evaluate(w) - p.evaluate(z)) % R
    assert lhs == (w - z) % R * q.evaluate(w) % R


def test_polynomial_serde_roundtrip_and_rejection():
    p = Polynomial.from_coefficients([11, 0, 13])
    b = p.to_var_bytes()
    assert len(b) == 3 * 32
    assert Polynomial.from_slice(b) == p
    with pytest.raises(InvalidBytes):
        Polynomial.from_slice(b[:-1])
    bad = (R).to_bytes(32, "little")  # non-canonical scalar
    with pytest.raises(BlsScalarMalformed):
        Polynomial.from_slice(bad)


def test_evaluations_roundtrip_and_interpolate():
    d = EvaluationDomain.get(8)
    vals = [poly_eval_host([3, 1, 4, 1], w) for w in d.elements()]
    ev = Evaluations.from_values(vals, d)
    assert ev.interpolate() == Polynomial.from_coefficients([3, 1, 4, 1])
    b = ev.to_var_bytes()
    assert Evaluations.from_slice(b) == ev
    assert ev[2] == vals[2]


def test_evaluations_pointwise_ops():
    d = EvaluationDomain.get(4)
    a = Evaluations.from_values([1, 2, 3, 4], d)
    b = Evaluations.from_values([5, 6, 7, 8], d)
    assert (a * b).to_ints() == [5, 12, 21, 32]
    assert (a + b).to_ints() == [6, 8, 10, 12]
    assert (b - a).to_ints() == [4, 4, 4, 4]
    with pytest.raises(InvalidBytes):
        a + Evaluations.from_values(list(range(8)), EvaluationDomain.get(8))


def test_evaluations_strict_domain_check():
    """Malformed domain parameters are rejected (evaluations.rs:64-90)."""
    d = EvaluationDomain.get(4)
    ev = Evaluations.from_values([1, 2, 3, 4], d)
    good = bytearray(ev.to_var_bytes())

    bad = bytearray(good)
    bad[0] = 3  # size = 3: not a power of two
    with pytest.raises(InvalidBytes):
        Evaluations.from_slice(bytes(bad))

    bad = bytearray(good)
    bad[12] ^= 1  # size_as_field_element mismatch
    with pytest.raises(InvalidBytes):
        Evaluations.from_slice(bytes(bad))

    bad = bytearray(good)
    bad[12 + 2 * 32] ^= 1  # group_gen (omega) mismatch
    with pytest.raises(InvalidBytes):
        Evaluations.from_slice(bytes(bad))

    bad = bytearray(good)
    bad[8] = 5  # log_size mismatch
    with pytest.raises(InvalidBytes):
        Evaluations.from_slice(bytes(bad))

    with pytest.raises(InvalidBytes):
        Evaluations.from_slice(bytes(good[:-1]))  # truncated body
