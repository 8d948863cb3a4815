"""RNS Fp engine: host-oracle exactness (no jit — fast tier).

Validates the Bajard-Kawamura construction in plonk_tpu/field/rns.py against
plain python bigint arithmetic: channel encode/decode round-trips, the base
extension (including the f32 kappa estimator at adversarial fractions), the
full Montgomery mul, and the value-bound discipline the curve formulas rely
on (mul inputs alpha*beta <= 2^17 -> output < 3p).
"""

import numpy as np
import pytest

from plonk_tpu.field import params as fparams
from plonk_tpu.field.rns import (
    RNSParams, get_params, _fold_full_host, _gen_primes, MASK16, K,
)

P = fparams.P_MOD


@pytest.fixture(scope="module")
def ctx():
    return get_params(P)


def test_moduli_are_coprime_pseudo_mersenne(ctx):
    import math

    mods = [int(m) for m in ctx.mods]
    assert len(set(mods)) == 2 * K
    for m in mods:
        assert (1 << 16) - m < (1 << 11)
        assert m > (1 << 15)
    for i, a in enumerate(mods):
        for b in mods[i + 1:]:
            assert math.gcd(a, b) == 1
    assert ctx.M > (1 << 18) * P and ctx.M2 > (1 << 18) * P


def test_fold_full_host_exact():
    rng = np.random.default_rng(0)
    for m in _gen_primes(8):
        for x in [0, 1, m - 1, m, m + 1, (1 << 32) - 1,
                  *rng.integers(0, 1 << 32, 64).tolist()]:
            y = _fold_full_host(int(x), m)
            assert y < (1 << 16)
            assert y % m == x % m


def test_encode_decode_roundtrip(ctx):
    rng = np.random.default_rng(1)
    for _ in range(32):
        x = int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % P
        assert ctx.decode(ctx.encode(x)) == x


def test_mul_matches_bigint(ctx):
    rng = np.random.default_rng(2)
    for _ in range(24):
        x = rng_int(rng) % P
        y = rng_int(rng) % P
        r = ctx.mul_ref(ctx.encode(x), ctx.encode(y))
        assert ctx.decode(r) == (x * y) % P
        # output channels are r16-redundant
        assert (r < (1 << 16)).all()


def test_mul_output_bound(ctx):
    """Output value < 3p even for inputs up to alpha*beta = 2^17 * p^2."""
    rng = np.random.default_rng(3)
    for ab in [(1, 1), (7, 7), (200, 200), (360, 360)]:
        a_val = int(rng.integers(1, 1 << 60)) % (ab[0] * P)
        b_val = int(rng.integers(1, 1 << 60)) * ab[1] % (ab[1] * P)
        a = ctx.to_rns(a_val)
        b = ctx.to_rns(b_val)
        r = ctx.mul_ref(a, b)
        val = ctx.from_rns(np.concatenate([r[:K] % ctx.mods[:K].astype(
            np.uint32), r[K:]]), "A")
        # r represents a*b*M^{-1} mod p plus < 3p of slack
        assert val < 3 * P
        assert val % P == (a_val * b_val * pow(ctx.M, -1, P)) % P


def test_mul_redundant_inputs(ctx):
    """Channel residues in [m, 2^16) (redundant form) are handled."""
    rng = np.random.default_rng(4)
    x = rng_int(rng) % P
    y = rng_int(rng) % P
    a = ctx.encode(x).astype(np.uint64)
    b = ctx.encode(y).astype(np.uint64)
    # push channels into the redundant zone where possible
    for i, m in enumerate(ctx.mods):
        if int(a[i]) + int(m) < (1 << 16):
            a[i] += m
        if int(b[i]) + int(m) < (1 << 16):
            b[i] += m
    r = ctx.mul_ref(a.astype(np.uint32), b.astype(np.uint32))
    assert ctx.decode(r) == (x * y) % P


def test_ext_exact_for_small_values(ctx):
    """ext2 must reproduce the exact value for x << M2 (< 7p)."""
    rng = np.random.default_rng(5)
    for _ in range(16):
        x = rng_int(rng) % (7 * P)
        xi = np.array(
            [(x % m) * pow(ctx.M2 // m, -1, m) % m for m in ctx.B],
            np.uint64)
        out, _ = ctx._ext_ref(xi, 2)
        for j, m in enumerate(ctx.A):
            assert int(out[j]) % m == x % m


def test_ext1_offset_at_most_M(ctx):
    """ext1 may overshoot by exactly one M (kappa under-floor), never two,
    and never undershoots (q_hat >= q keeps t + q_hat*p non-negative)."""
    rng = np.random.default_rng(6)
    for _ in range(16):
        q = rng_int(rng) % ctx.M
        xi = np.array(
            [(q % m) * pow(ctx.M // m, -1, m) % m for m in ctx.A],
            np.uint64)
        out, _ = ctx._ext_ref(xi, 1)
        # reconstruct the value the channels represent, given it is q+aM
        for alpha in (0, 1):
            target = q + alpha * ctx.M
            if all(int(out[j]) % m == target % m
                   for j, m in enumerate(ctx.B)):
                break
        else:  # pragma: no cover
            raise AssertionError("ext1 offset outside {0, M}")


def test_sub_offsets_cover_formula_needs(ctx):
    for c, col in ctx.sub_cp.items():
        for v, m in zip(col, ctx.mods):
            assert int(v) == (c * P) % int(m)


def rng_int(rng) -> int:
    return int.from_bytes(rng.bytes(48), "little")


def test_ext1_adversarial_fractions(ctx):
    """kappa under-floor at q/M near 0 and near 1 — the estimator's
    dangerous zones.  q_hat must stay in {q, q+M} (never negative, never
    +2M) for q in {0, 1, M-1, M-2^200, M//2, 2^399-ish}."""
    cases = [0, 1, ctx.M - 1, ctx.M - (1 << 200), ctx.M // 2,
             (1 << 399) % ctx.M, 12345]
    for q in cases:
        xi = np.array(
            [(q % m) * pow(ctx.M // m, -1, m) % m for m in ctx.A],
            np.uint64)
        out, _ = ctx._ext_ref(xi, 1)
        ok = False
        for alpha in (0, 1):
            target = q + alpha * ctx.M
            if all(int(out[j]) % m == target % m
                   for j, m in enumerate(ctx.B)):
                ok = True
                break
        assert ok, f"ext1 offset outside {{0, M}} for q={q}"


def test_ext2_adversarial_small_values(ctx):
    """ext2 exactness at the value-bound extremes the curve formulas
    produce (0, 1, 7p-1, and values just under the mul-output bound)."""
    P = ctx.p
    for x in [0, 1, P - 1, 3 * P - 1, 7 * P - 1, 2 * P + 12345]:
        xi = np.array(
            [(x % m) * pow(ctx.M2 // m, -1, m) % m for m in ctx.B],
            np.uint64)
        out, _ = ctx._ext_ref(xi, 2)
        for j, m in enumerate(ctx.A):
            assert int(out[j]) % m == x % m, (x, j)


def test_mul_extreme_operands(ctx):
    """Products at the alpha*beta bound corners: near-max curve-formula
    operands (131p x 87p etc.) stay exact."""
    P = ctx.p
    for a_val, b_val in [(131 * P - 1, 87 * P - 1), (15 * P - 1, 180 * P - 1),
                         (1, 1), (P - 1, P - 1), (0, 131 * P - 1)]:
        r = ctx.mul_ref(ctx.to_rns(a_val), ctx.to_rns(b_val))
        got = ctx.from_rns(r.astype(np.uint64), "A")
        assert got < 3 * P
        assert got % P == (a_val * b_val * pow(ctx.M, -1, P)) % P
