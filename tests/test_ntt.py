"""Device NTT vs host oracle (mirrors reference fft tests, domain.rs:402-437)."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from plonk_tpu.field import FR, params
from plonk_tpu.ntt import EvaluationDomain, ntt_host

rng = random.Random(7)
P = params.R_MOD


def rand_poly(n):
    return [rng.randrange(P) for _ in range(n)]


def to_dev(coeffs):
    return jax.jit(FR.to_mont)(FR.pack(coeffs))


def from_dev(x):
    return FR.unpack(jax.jit(FR.from_mont)(x))


def test_fft_matches_host():
    n = 64
    d = EvaluationDomain.get(n)
    coeffs = rand_poly(n)
    got = from_dev(jax.jit(d.fft)(to_dev(coeffs)))
    exp = ntt_host(coeffs, d.omega, P)
    assert got == exp


def test_fft_ifft_roundtrip_batched():
    n = 32
    d = EvaluationDomain.get(n)
    polys = [rand_poly(n) for _ in range(3)]
    x = jnp.stack([to_dev(c) for c in polys], axis=1)  # (L, 3, n)
    back = jax.jit(lambda t: d.ifft(d.fft(t)))(x)
    for i, c in enumerate(polys):
        assert from_dev(back[:, i]) == c


def test_fft_is_evaluation():
    # fft(coeffs)[i] == poly(omega^i)
    n = 16
    d = EvaluationDomain.get(n)
    coeffs = rand_poly(n)
    got = from_dev(jax.jit(d.fft)(to_dev(coeffs)))
    for i, w in enumerate(d.elements()):
        v = sum(c * pow(w, j, P) for j, c in enumerate(coeffs)) % P
        assert got[i] == v


def test_coset_fft():
    # coset_fft(coeffs)[i] == poly(g * omega^i), and coset_ifft inverts it
    n = 16
    d = EvaluationDomain.get(n)
    coeffs = rand_poly(n)
    dev = to_dev(coeffs)
    got = from_dev(jax.jit(d.coset_fft)(dev))
    g = params.FR_GENERATOR
    for i, w in enumerate(d.elements()):
        x = g * w % P
        v = sum(c * pow(x, j, P) for j, c in enumerate(coeffs)) % P
        assert got[i] == v
    back = from_dev(jax.jit(lambda t: d.coset_ifft(d.coset_fft(t)))(dev))
    assert back == coeffs


def test_vanishing_over_coset():
    n, cn = 8, 32
    d = EvaluationDomain.get(n)
    dc = EvaluationDomain.get(cn)
    vals = d.evaluate_vanishing_poly_over_coset(cn)
    g = params.FR_GENERATOR
    for i, w in enumerate(dc.elements()):
        x = g * w % P
        assert vals[i] == (pow(x, n, P) - 1) % P


def test_domain_omega_order():
    for n in (1, 2, 8, 1 << 10):
        d = EvaluationDomain.get(n)
        assert pow(d.omega, n, P) == 1
        if n > 1:
            assert pow(d.omega, n // 2, P) != 1


def test_all_lagrange_coefficients():
    """Barycentric L_i(tau) vs naive interpolation (domain.rs:232-279)."""
    from plonk_tpu.field import params

    p = params.R_MOD
    d = EvaluationDomain.get(8)
    tau = 0xDEADBEEF
    coeffs = d.evaluate_all_lagrange_coefficients(tau)
    for i, e in enumerate(d.elements()):
        # naive: L_i(tau) = prod_{j!=i} (tau - w^j)/(w^i - w^j)
        num = den = 1
        for j, ej in enumerate(d.elements()):
            if j != i:
                num = num * (tau - ej) % p
                den = den * (e - ej) % p
        assert coeffs[i] == num * pow(den, -1, p) % p
    # tau on the domain -> indicator
    onehot = d.evaluate_all_lagrange_coefficients(d.elements()[3])
    assert onehot == [0, 0, 0, 1, 0, 0, 0, 0]
