"""Gadget construction: gate counts and witness-satisfaction (host-level).

Mirrors the reference's per-gadget cost table (SURVEY.md A.5) and validates,
without proving, that every gadget's witness assignment satisfies all 17 gate
identities row by row (the debugger's check, used here as a fast oracle).
"""

import random

import pytest

from plonk_tpu.composer import Composer, Constraint
from plonk_tpu.curve.jubjub import JubjubPoint, GENERATOR, ORDER
from plonk_tpu.field import params
from plonk_tpu.utils.errors import PlonkError

from gadget_check import check_all_identities  # test helper

rng = random.Random(1234)
R = params.R_MOD


def fresh():
    return Composer.initialized()


BASE = 4  # gates appended by Composer.initialized()


def test_component_boolean_cost_and_satisfaction():
    c = fresh()
    w = c.append_witness(1)
    c.component_boolean(w)
    assert c.constraints() == BASE + 1
    check_all_identities(c)


def test_component_boolean_bad_witness_fails():
    c = fresh()
    w = c.append_witness(2)
    c.component_boolean(w)
    with pytest.raises(AssertionError):
        check_all_identities(c)


def test_component_decomposition():
    c = fresh()
    v = 0b1011
    w = c.append_witness(v)
    bits = c.component_decomposition(w, 8)
    assert [c[b] for b in bits] == [1, 1, 0, 1, 0, 0, 0, 0]
    assert c.constraints() == BASE + 2 * 8 + 1
    check_all_identities(c)
    # decomposition of a too-wide value is unsatisfied
    c2 = fresh()
    w2 = c2.append_witness(256)
    c2.component_decomposition(w2, 8)
    with pytest.raises(AssertionError):
        check_all_identities(c2)


def test_component_select_family():
    c = fresh()
    bit = c.append_witness(1)
    c.component_boolean(bit)
    a = c.append_witness(111)
    b = c.append_witness(222)
    before = c.constraints()
    out = c.component_select(bit, a, b)
    assert c.constraints() - before == 4
    assert c[out] == 111
    o1 = c.component_select_one(c.ZERO, a)
    assert c[o1] == 1
    o0 = c.component_select_zero(c.ZERO, a)
    assert c[o0] == 0
    check_all_identities(c)


@pytest.mark.parametrize("bits,value", [
    (0, 0), (2, 3), (8, 255), (9, 511), (17, 100000), (64, (1 << 64) - 1),
])
def test_range_satisfied(bits, value):
    c = fresh()
    w = c.append_witness(value)
    c.component_range_bits(w, bits)
    check_all_identities(c)


@pytest.mark.parametrize("bits,value", [(2, 4), (8, 256), (9, 512), (0, 1)])
def test_range_unsatisfied(bits, value):
    c = fresh()
    w = c.append_witness(value)
    c.component_range_bits(w, bits)
    with pytest.raises(AssertionError):
        check_all_identities(c)


def test_range_even_gate_cost():
    # ceil(bits/8) quad gates + genesis/pad row + closing assert_equal
    # (range.rs:122-203; the doc-comment formula in range.rs:57-60 is stale)
    for bits in (2, 8, 16, 64, 256):
        c = fresh()
        w = c.append_witness((1 << bits) - 1 if bits < 256 else (1 << 255) - 1)
        c.component_range_bits(w, bits)
        assert c.constraints() - BASE == -(-bits // 8) + 2


def test_logic_and_xor():
    a_v = rng.randrange(1 << 32)
    b_v = rng.randrange(1 << 32)
    for is_xor, expect in ((True, a_v ^ b_v), (False, a_v & b_v)):
        c = fresh()
        a = c.append_witness(a_v)
        b = c.append_witness(b_v)
        out = c.append_logic_component(a, b, 16, is_xor)
        assert c[out] == expect & ((1 << 32) - 1)
        check_all_identities(c)


def test_logic_gate_cost_bounds():
    # 172 gates at 2 bits, 234 at 250 (logic.rs:30-35)
    c = fresh()
    a, b = c.append_witness(3), c.append_witness(1)
    c.append_logic_component(a, b, 1, True)
    assert c.constraints() - BASE == 172
    c = fresh()
    a, b = c.append_witness(3), c.append_witness(1)
    c.append_logic_component(a, b, 125, True)
    assert c.constraints() - BASE == 234


def test_truncate():
    v = rng.randrange(R)
    for n_bits in (2, 17, 64, 254):
        c = fresh()
        w = c.append_witness(v)
        low = c.component_truncate(w, n_bits)
        assert c[low] == v & ((1 << n_bits) - 1)
        assert 84 <= c.constraints() - BASE <= 88
        check_all_identities(c)


def test_point_add_and_torsion_free():
    p1 = GENERATOR.mul(rng.randrange(ORDER))
    p2 = GENERATOR.mul(rng.randrange(ORDER))
    c = fresh()
    w1 = c.append_point(p1)
    w2 = c.append_point(p2)
    before = c.constraints()
    w3 = c.add_point_gates(w1, w2)
    assert c.constraints() - before == 2
    s = p1 + p2
    assert (c[w3.x()], c[w3.y()]) == (s.x, s.y)
    t = c.assert_torsion_free_point(w1)
    assert c.constraints() - before == 2 + 12
    neg = c.component_neg_point(t)
    assert c[neg.x()] == (-p1).x % R
    check_all_identities(c)


def test_torsion_free_rejects_low_order_component():
    # (0, -1) has order 2: torsion-free must fail
    bad = JubjubPoint(0, R - 1)
    assert bad.is_on_curve()
    c = fresh()
    w = c.append_point(bad)
    c.assert_torsion_free_point(w)
    with pytest.raises(AssertionError):
        check_all_identities(c)


def test_component_mul_point():
    k = rng.randrange(1 << 100)
    c = fresh()
    base = c.append_constant_point(GENERATOR)
    s = c.append_witness(k)
    out = c.component_mul_point(s, base)
    exp = GENERATOR.mul(k)
    assert (c[out.x()], c[out.y()]) == (exp.x, exp.y)
    check_all_identities(c)


def test_component_mul_generator():
    k = rng.randrange(ORDER)
    c = fresh()
    s = c.append_witness(k)
    out = c.component_mul_generator(s, GENERATOR)
    exp = GENERATOR.mul(k)
    assert (c[out.x()], c[out.y()]) == (exp.x, exp.y)
    check_all_identities(c)


def test_component_mul_generator_rejects_bad_generator():
    c = fresh()
    s = c.append_witness(5)
    with pytest.raises(PlonkError):
        c.component_mul_generator(s, JubjubPoint.identity())
    with pytest.raises(PlonkError):
        c.component_mul_generator(s, JubjubPoint(0, R - 1))
