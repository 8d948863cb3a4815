"""Per-gadget satisfied/unsatisfied prove-level matrices.

Ports the reference integration-test tier (/root/reference/tests/*.rs):
every test compiles one circuit description, then drives it through the FULL
prover with in-spec and out-of-spec assignments — satisfied rows must prove
and verify with the expected public inputs, unsatisfied rows must be rejected
with exactly CircuitUnsatisfied.

Widths are scaled down where the reference's choice only inflates n on this
1-core CPU host (the matrix classes are width-independent); the full-width
rows run under PLONK_SLOW_TESTS=1.
"""

import os
import random

import pytest

from plonk_tpu import PublicParameters
from plonk_tpu.composer import Circuit
from plonk_tpu.composer.constraint import Constraint
from plonk_tpu.composer.ecc_types import TorsionFreeWitnessPoint
from plonk_tpu.compiler import Compiler
from plonk_tpu.curve.jubjub import JubjubPoint, GENERATOR, ORDER as JJ_ORDER
from plonk_tpu.field import params

from gadget_check import (
    check_satisfied, check_satisfied_fails, check_unsatisfied, rand_scalar,
)

R = params.R_MOD
SLOW = bool(os.environ.get("PLONK_SLOW_TESTS"))
rng = random.Random(0xBE11)


@pytest.fixture(scope="module")
def pp():
    # one shared SRS for every matrix (reference uses per-test setups of
    # 1<<4..1<<10; trim() slices what each circuit needs)
    return PublicParameters.setup(1 << 10, secret=0x6AD6E7, device=False)


def _compile(pp, cls, label: bytes):
    return Compiler.compile(cls, pp, label)


# -- append_gate.rs: raw arithmetic gate with all selectors -------------------

class AppendGateCircuit(Circuit):
    def __init__(self, a=0, b=0, d=0, public=0, result=0, constant=0):
        self.a, self.b, self.d = a, b, d
        self.public, self.result, self.constant = public, result, constant

    def circuit(self, c):
        w_a = c.append_witness(self.a)
        w_b = c.append_witness(self.b)
        w_d = c.append_witness(self.d)
        w_res = c.append_witness(self.result)
        constraint = (Constraint().left(1).right(1).mult(1).fourth(1)
                      .output(R - 1).constant(1).public(self.public)
                      .a(w_a).b(w_b).d(w_d).c(w_res))
        c.append_gate(constraint)


def test_append_gate_matrix(pp):
    """appends the gate q_l a + q_r b + q_m ab + q_f d + q_c + PI - c = 0
    (append_gate.rs:16-178; constant pinned to 1 by the description)."""
    prover, verifier = _compile(pp, AppendGateCircuit, b"append_gate")

    def result_of(a, b, d, public):
        return (a + b + a * b + d + public + 1) % R

    # satisfied: default (zeros), ones, randoms
    check_satisfied(prover, verifier, [0], AppendGateCircuit(result=result_of(0, 0, 0, 0)))
    a = b = d = public = 1
    check_satisfied(prover, verifier, [1],
                    AppendGateCircuit(1, 1, 1, 1, result_of(a, b, d, public)))
    a, b, d, public = (rand_scalar(rng) for _ in range(4))
    check_satisfied(prover, verifier, [public],
                    AppendGateCircuit(a, b, d, public, result_of(a, b, d, public)))
    # unsatisfied: result off by one; arbitrary wrong result
    check_unsatisfied(prover, AppendGateCircuit(a, b, d, public,
                                                (result_of(a, b, d, public) + 1) % R))
    check_unsatisfied(prover, AppendGateCircuit(1, 1, 1, 1, 42))


# -- gate_add_mul.rs ----------------------------------------------------------

class GateAddMulCircuit(Circuit):
    def __init__(self, a=0, b=0, d=0, public=0, result=0):
        self.a, self.b, self.d, self.public, self.result = a, b, d, public, result

    def circuit(self, c):
        w_a = c.append_witness(self.a)
        w_b = c.append_witness(self.b)
        w_d = c.append_witness(self.d)
        w_res = c.append_witness(self.result)
        constraint = (Constraint().left(1).right(1).mult(1).fourth(1)
                      .a(w_a).b(w_b).d(w_d).public(self.public).constant(1))
        res_add = c.gate_add(constraint.copy())
        res_mul = c.gate_mul(constraint)
        c.assert_equal(w_res, res_add)
        c.assert_equal(w_res, res_mul)


def test_gate_add_mul_matrix(pp):
    """gate_add / gate_mul solve the output wire; both share the arithmetic
    identity (gate_add_mul.rs:16-151)."""
    prover, verifier = _compile(pp, GateAddMulCircuit, b"gate_add_mul")

    def result_of(a, b, d, public):
        return (a + b + a * b + d + public + 1) % R

    check_satisfied(prover, verifier, [0, 0], GateAddMulCircuit(result=result_of(0, 0, 0, 0)))
    check_satisfied(prover, verifier, [0, 0],
                    GateAddMulCircuit(1, 1, 1, 0, result_of(1, 1, 1, 0)))
    a, b, d, public = (rand_scalar(rng) for _ in range(4))
    check_satisfied(prover, verifier, [public, public],
                    GateAddMulCircuit(a, b, d, public, result_of(a, b, d, public)))
    check_unsatisfied(prover, GateAddMulCircuit(
        a, b, d, public, (result_of(a, b, d, public) + 1) % R))
    check_unsatisfied(prover, GateAddMulCircuit(1, 1, 1, 1, 42))
    # constant drifts from the description (public absorbs the difference)
    a = b = d = 0
    public = 2
    bad_constant = (-2) % R
    check_unsatisfied(prover, GateAddMulCircuit(
        a, b, d, public, (a + b + a * b + d + public + bad_constant) % R))


# -- assert_scalar.rs ---------------------------------------------------------

class AssertEqualCircuit(Circuit):
    def __init__(self, a=0, b=0):
        self.a, self.b = a, b

    def circuit(self, c):
        w_a = c.append_witness(self.a)
        w_b = c.append_witness(self.b)
        c.assert_equal(w_a, w_b)


def test_assert_equal_matrix(pp):
    prover, verifier = _compile(pp, AssertEqualCircuit, b"assert_equal")
    check_satisfied(prover, verifier, [], AssertEqualCircuit(0, 0))
    check_satisfied(prover, verifier, [], AssertEqualCircuit(1, 1))
    x = rand_scalar(rng)
    check_satisfied(prover, verifier, [], AssertEqualCircuit(x, x))
    check_unsatisfied(prover, AssertEqualCircuit(1, 0))
    check_unsatisfied(prover, AssertEqualCircuit(rand_scalar(rng), rand_scalar(rng)))


class AssertEqualConstantCircuit(Circuit):
    def __init__(self, scalar=0, constant=0, public=None):
        self.scalar, self.constant, self.public = scalar, constant, public

    def circuit(self, c):
        w = c.append_witness(self.scalar)
        c.assert_equal_constant(w, self.constant, self.public)


def test_assert_equal_constant_matrix(pp):
    """Four compiled descriptions: public None/Some x constant zero/random
    (assert_scalar.rs:84-304)."""
    # description 1: public=None, constant=0
    prover, verifier = _compile(pp, AssertEqualConstantCircuit, b"aec")
    check_satisfied(prover, verifier, [], AssertEqualConstantCircuit())
    check_satisfied_fails(prover, verifier, [0],
                          AssertEqualConstantCircuit(0, 0, 0))
    check_unsatisfied(prover, AssertEqualConstantCircuit(1, 1, None))

    # description 2: public=Some(0), constant=0
    prover, verifier = Compiler.compile_with_circuit(
        pp, b"aec", AssertEqualConstantCircuit(0, 0, 0))
    check_satisfied(prover, verifier, [0], AssertEqualConstantCircuit(0, 0, 0))
    x = rand_scalar(rng)
    check_satisfied(prover, verifier, [x], AssertEqualConstantCircuit(x, 0, x))
    check_satisfied_fails(prover, verifier, [], AssertEqualConstantCircuit(0, 0, None))
    check_unsatisfied(prover, AssertEqualConstantCircuit(1, 1, 0))

    # description 3: public=None, constant=random
    const = rand_scalar(rng)
    prover, verifier = Compiler.compile_with_circuit(
        pp, b"aec", AssertEqualConstantCircuit(const, const, None))
    check_satisfied(prover, verifier, [], AssertEqualConstantCircuit(const, const, None))
    check_satisfied_fails(prover, verifier, [0],
                          AssertEqualConstantCircuit(const, const, 0))
    check_unsatisfied(prover, AssertEqualConstantCircuit(1, 1, None))

    # description 4: public=Some(_), constant=random
    const = rand_scalar(rng)
    prover, verifier = Compiler.compile_with_circuit(
        pp, b"aec", AssertEqualConstantCircuit(const, const, 0))
    check_satisfied(prover, verifier, [0], AssertEqualConstantCircuit(const, const, 0))
    x = rand_scalar(rng)
    check_satisfied(prover, verifier, [(x - const) % R],
                    AssertEqualConstantCircuit(x, const, (x - const) % R))
    check_satisfied_fails(prover, verifier, [], AssertEqualConstantCircuit(const, const, None))
    check_unsatisfied(prover, AssertEqualConstantCircuit(1, 1, 0))


# -- boolean.rs ---------------------------------------------------------------

class BooleanCircuit(Circuit):
    def __init__(self, bit=0):
        self.bit = bit

    def circuit(self, c):
        w = c.append_witness(self.bit)
        c.component_boolean(w)


def test_boolean_matrix(pp):
    prover, verifier = _compile(pp, BooleanCircuit, b"boolean")
    check_satisfied(prover, verifier, [], BooleanCircuit(0))
    check_satisfied(prover, verifier, [], BooleanCircuit(1))
    check_unsatisfied(prover, BooleanCircuit(R - 1))      # -1
    check_unsatisfied(prover, BooleanCircuit(rand_scalar(rng)))


# -- decomposition.rs ---------------------------------------------------------

def make_decomposition_circuit(n_bits):
    class DecompositionCircuit(Circuit):
        def __init__(self, a=0, decomp_expected=None):
            self.a = a
            self.decomp_expected = decomp_expected or [0] * n_bits

        def circuit(self, c):
            w_a = c.append_witness(self.a)
            bits = c.component_decomposition(w_a, n_bits)
            for bit_w, expected in zip(bits, self.decomp_expected):
                w_exp = c.append_witness(expected)
                c.assert_equal(bit_w, w_exp)

    return DecompositionCircuit


def _bits_of(v, n):
    return [(v >> i) & 1 for i in range(n)]


def test_decomposition_n1(pp):
    cls = make_decomposition_circuit(1)
    prover, verifier = _compile(pp, cls, b"decomp1")
    check_satisfied(prover, verifier, [], cls())
    check_satisfied(prover, verifier, [], cls(1, [1]))
    check_unsatisfied(prover, cls(2, [0]))  # 2 needs 2 bits


def test_decomposition_n8(pp):
    """Width-scaled version of the reference's N=64 matrix
    (decomposition.rs:85-160): value roundtrip, overflow, flipped bit."""
    cls = make_decomposition_circuit(8)
    prover, verifier = _compile(pp, cls, b"decomp8")
    check_satisfied(prover, verifier, [], cls())
    check_satisfied(prover, verifier, [], cls(2, _bits_of(2, 8)))
    check_satisfied(prover, verifier, [], cls(42, _bits_of(42, 8)))
    check_satisfied(prover, verifier, [], cls(255, _bits_of(255, 8)))
    check_unsatisfied(prover, cls(2 * 255 + 1, _bits_of(255, 8)))
    # flipping one expected bit must fail
    v = rng.randrange(1 << 8)
    flipped = _bits_of(v, 8)
    flipped[3] ^= 1
    check_unsatisfied(prover, cls(v, flipped))


@pytest.mark.skipif(not SLOW, reason="n=1024 prove; PLONK_SLOW_TESTS=1")
def test_decomposition_n64(pp):
    cls = make_decomposition_circuit(64)
    prover, verifier = _compile(pp, cls, b"decomp64")
    u64max = (1 << 64) - 1
    check_satisfied(prover, verifier, [], cls(u64max, _bits_of(u64max, 64)))
    v = rng.randrange(1 << 64)
    flipped = _bits_of(v, 64)
    flipped[63] ^= 1
    check_unsatisfied(prover, cls(v, flipped))


# -- range.rs -----------------------------------------------------------------

def make_range_circuit(bits):
    class RangeCircuit(Circuit):
        def __init__(self, a=0):
            self.a = a

        def circuit(self, c):
            w = c.append_witness(self.a)
            c.component_range_bits(w, bits)

    return RangeCircuit


@pytest.mark.parametrize("bits,ok,bad", [
    (0, [0], [1, None]),          # only zero fits a 0-bit range
    (2, [0, 3], [4, None]),
    (7, [0, 127], [128, None]),   # odd width
    (74, [0, (1 << 74) - 1], [1 << 74, None]),
])
def test_range_matrix(pp, bits, ok, bad):
    """range.rs:51-168 matrix (None -> random oversized value)."""
    cls = make_range_circuit(bits)
    prover, verifier = _compile(pp, cls, b"range%d" % bits)
    for v in ok:
        check_satisfied(prover, verifier, [], cls(v))
    for v in bad:
        if v is None:
            v = rng.randrange(1 << bits, R) if bits < 250 else R - 1
        check_unsatisfied(prover, cls(v))


def test_range_256_all_pass(pp):
    """bits=256 admits every scalar (range.rs:147-168)."""
    cls = make_range_circuit(256)
    prover, verifier = _compile(pp, cls, b"range256")
    check_satisfied(prover, verifier, [], cls(R - 1))
    check_satisfied(prover, verifier, [], cls(rand_scalar(rng)))


# -- logic.rs -----------------------------------------------------------------

def make_logic_circuit(bit_pairs, is_xor):
    class LogicCircuit(Circuit):
        def __init__(self, a=0, b=0, result=0):
            self.a, self.b, self.result = a, b, result

        def circuit(self, c):
            w_a = c.append_witness(self.a)
            w_b = c.append_witness(self.b)
            w_res = c.append_witness(self.result)
            if is_xor:
                res = c.append_logic_xor(w_a, w_b, bit_pairs)
            else:
                res = c.append_logic_and(w_a, w_b, bit_pairs)
            c.assert_equal(res, w_res)

    return LogicCircuit


@pytest.mark.parametrize("is_xor", [False, True])
def test_logic_matrix(pp, is_xor):
    """logic.rs:18-363 scaled to 32 bits (the matrix classes are
    width-independent)."""
    mask = (1 << 32) - 1

    def op(a, b):
        return (a ^ b) & mask if is_xor else (a & b) & mask

    cls = make_logic_circuit(16, is_xor)  # 32 bits
    prover, verifier = _compile(pp, cls, b"logic32")
    check_satisfied(prover, verifier, [], cls())
    check_satisfied(prover, verifier, [],
                    cls(mask, mask, op(mask, mask)))
    a, b = rng.randrange(1 << 64), rng.randrange(1 << 64)
    check_satisfied(prover, verifier, [], cls(a, b, op(a, b)))
    check_unsatisfied(prover, cls(a, b, op(a, b) ^ 1))
    check_unsatisfied(prover, cls(mask, mask, op(mask, mask) ^ (1 << 31)))


@pytest.mark.parametrize("is_xor", [False, True])
def test_logic_zero_bits(pp, is_xor):
    """bit_pairs=0: comparing zero bits is always zero and accepts anything
    (logic.rs:67-84)."""
    cls = make_logic_circuit(0, is_xor)
    prover, verifier = _compile(pp, cls, b"logic0")
    check_satisfied(prover, verifier, [], cls())
    check_satisfied(prover, verifier, [],
                    cls(rand_scalar(rng), rand_scalar(rng), 0))


# -- select_bls.rs ------------------------------------------------------------

class SelectCircuit(Circuit):
    def __init__(self, bit=0, a=0, b=0, result=0):
        self.bit, self.a, self.b, self.result = bit, a, b, result

    def circuit(self, c):
        w_bit = c.append_witness(self.bit)
        w_a = c.append_witness(self.a)
        w_b = c.append_witness(self.b)
        w_res = c.append_witness(self.result)
        res = c.component_select(w_bit, w_a, w_b)
        c.assert_equal(res, w_res)


def test_select_matrix(pp):
    """select_bls.rs:14-180: bit?a:b, including the documented quirk that an
    unconstrained bit=t interpolates t*a + (1-t)*b."""
    prover, verifier = _compile(pp, SelectCircuit, b"select")
    check_satisfied(prover, verifier, [], SelectCircuit())
    x, y = rand_scalar(rng), rand_scalar(rng)
    check_satisfied(prover, verifier, [], SelectCircuit(1, x, y, x))
    check_satisfied(prover, verifier, [], SelectCircuit(0, x, y, y))
    # invalid bit passes: select does NOT boolean-constrain the bit
    t = rand_scalar(rng)
    interp = (t * x + (1 - t) * y) % R
    check_satisfied(prover, verifier, [], SelectCircuit(t, x, y, interp))
    # wrong selections fail
    check_unsatisfied(prover, SelectCircuit(1, x, y, y))
    check_unsatisfied(prover, SelectCircuit(0, x, y, x))
    check_unsatisfied(prover, SelectCircuit(1, x, y, rand_scalar(rng)))


class SelectOneCircuit(Circuit):
    def __init__(self, bit=0, value=0, result=1):
        self.bit, self.value, self.result = bit, value, result

    def circuit(self, c):
        w_bit = c.append_witness(self.bit)
        w_v = c.append_witness(self.value)
        w_res = c.append_witness(self.result)
        res = c.component_select_one(w_bit, w_v)
        c.assert_equal(res, w_res)


def test_select_one_matrix(pp):
    """select_bls.rs:186-330: bit?value:1."""
    prover, verifier = _compile(pp, SelectOneCircuit, b"select_one")
    check_satisfied(prover, verifier, [], SelectOneCircuit())
    x = rand_scalar(rng)
    check_satisfied(prover, verifier, [], SelectOneCircuit(1, x, x))
    check_satisfied(prover, verifier, [], SelectOneCircuit(0, x, 1))
    check_unsatisfied(prover, SelectOneCircuit(1, x, 1 if x != 1 else 2))
    check_unsatisfied(prover, SelectOneCircuit(0, x, x if x != 1 else 2))


class SelectZeroCircuit(Circuit):
    def __init__(self, bit=0, value=0, result=0):
        self.bit, self.value, self.result = bit, value, result

    def circuit(self, c):
        w_bit = c.append_witness(self.bit)
        w_v = c.append_witness(self.value)
        w_res = c.append_witness(self.result)
        res = c.component_select_zero(w_bit, w_v)
        c.assert_equal(res, w_res)


def test_select_zero_matrix(pp):
    """select_bls.rs:336-480: bit?value:0."""
    prover, verifier = _compile(pp, SelectZeroCircuit, b"select_zero")
    check_satisfied(prover, verifier, [], SelectZeroCircuit())
    x = rand_scalar(rng)
    check_satisfied(prover, verifier, [], SelectZeroCircuit(1, x, x))
    check_satisfied(prover, verifier, [], SelectZeroCircuit(0, x, 0))
    check_unsatisfied(prover, SelectZeroCircuit(1, x, 0 if x else 1))
    check_unsatisfied(prover, SelectZeroCircuit(0, x, x if x else 1))


# -- select_point.rs ----------------------------------------------------------

class SelectPointCircuit(Circuit):
    def __init__(self, bit=0, a=None, b=None, result=None):
        ident = JubjubPoint.identity()
        self.bit = bit
        self.a = a or ident
        self.b = b or ident
        self.result = result or ident

    def circuit(self, c):
        w_bit = c.append_witness(self.bit)
        w_a = c.append_point(self.a)
        w_b = c.append_point(self.b)
        w_res = c.append_point(self.result)
        res = c.component_select_point(w_bit, w_a, w_b)
        c.assert_equal_point(res, w_res)


def test_select_point_matrix(pp):
    """select_point.rs:14-200: bit?a:b on both coordinates."""
    prover, verifier = _compile(pp, SelectPointCircuit, b"select_point")
    g = GENERATOR
    p = GENERATOR.mul(rng.randrange(1, JJ_ORDER))
    check_satisfied(prover, verifier, [], SelectPointCircuit())
    check_satisfied(prover, verifier, [], SelectPointCircuit(1, g, p, g))
    check_satisfied(prover, verifier, [], SelectPointCircuit(0, g, p, p))
    check_unsatisfied(prover, SelectPointCircuit(1, g, p, p))
    check_unsatisfied(prover, SelectPointCircuit(0, g, p, g))


class SelectIdentityCircuit(Circuit):
    def __init__(self, bit=0, a=None, result=None):
        ident = JubjubPoint.identity()
        self.bit = bit
        self.a = a or ident
        self.result = result or ident

    def circuit(self, c):
        w_bit = c.append_witness(self.bit)
        w_a = TorsionFreeWitnessPoint.new_unchecked(c.append_point(self.a))
        w_res = c.append_point(self.result)
        res = c.component_select_identity(w_bit, w_a)
        c.assert_equal_point(res, w_res)


def test_select_identity_matrix(pp):
    """select_point.rs:206-400: bit?a:identity; the bit IS boolean-constrained
    here, so non-boolean bits must fail."""
    prover, verifier = _compile(pp, SelectIdentityCircuit, b"select_ident")
    g = GENERATOR
    ident = JubjubPoint.identity()
    check_satisfied(prover, verifier, [], SelectIdentityCircuit())
    check_satisfied(prover, verifier, [], SelectIdentityCircuit(1, g, g))
    check_satisfied(prover, verifier, [], SelectIdentityCircuit(0, g, ident))
    check_unsatisfied(prover, SelectIdentityCircuit(2, g, g))
    check_unsatisfied(prover, SelectIdentityCircuit(1, g, ident))
    check_unsatisfied(prover, SelectIdentityCircuit(0, g, g))


# -- assert_point.rs ----------------------------------------------------------

class AssertEqualPointCircuit(Circuit):
    def __init__(self, p=None, q=None):
        ident = JubjubPoint.identity()
        self.p = p or ident
        self.q = q or ident

    def circuit(self, c):
        w_p = c.append_point(self.p)
        w_q = c.append_point(self.q)
        c.assert_equal_point(w_p, w_q)


def test_assert_equal_point_matrix(pp):
    prover, verifier = _compile(pp, AssertEqualPointCircuit, b"assert_point")
    g = GENERATOR
    check_satisfied(prover, verifier, [], AssertEqualPointCircuit())
    check_satisfied(prover, verifier, [], AssertEqualPointCircuit(g, g))
    check_unsatisfied(prover, AssertEqualPointCircuit(g, g.double()))
    check_unsatisfied(prover, AssertEqualPointCircuit(g, JubjubPoint.identity()))


class AssertEqualPublicPointCircuit(Circuit):
    def __init__(self, p=None, public=None):
        ident = JubjubPoint.identity()
        self.p = p or ident
        self.public = public or ident

    def circuit(self, c):
        w_p = c.append_point(self.p)
        c.assert_equal_public_point(w_p, self.public)


def test_assert_equal_public_point_matrix(pp):
    """assert_point.rs:103-193: the expected point enters as public input."""
    prover, verifier = _compile(pp, AssertEqualPublicPointCircuit, b"assert_ppoint")
    g = GENERATOR
    ident = JubjubPoint.identity()
    # PI = witness coordinate (-x + 0 + PI = 0 in the arithmetic identity)
    check_satisfied(prover, verifier, [0, 1], AssertEqualPublicPointCircuit())
    check_satisfied(prover, verifier, [g.x, g.y],
                    AssertEqualPublicPointCircuit(g, g))
    check_unsatisfied(prover, AssertEqualPublicPointCircuit(g.double(), g))
    check_unsatisfied(prover, AssertEqualPublicPointCircuit(ident, g))


# -- ecc.rs: add/sub/mul components -------------------------------------------

class AddPointCircuit(Circuit):
    def __init__(self, p=None, q=None, result=None):
        ident = JubjubPoint.identity()
        self.p = p or ident
        self.q = q or ident
        self.result = result or ident

    def circuit(self, c):
        w_p = TorsionFreeWitnessPoint.new_unchecked(c.append_point(self.p))
        w_q = TorsionFreeWitnessPoint.new_unchecked(c.append_point(self.q))
        w_res = c.append_point(self.result)
        res = c.component_add_point(w_p, w_q)
        c.assert_equal_point(res, w_res)


def test_component_add_point_matrix(pp):
    """ecc.rs component_add_point: identity cases, distributivity, randoms."""
    prover, verifier = _compile(pp, AddPointCircuit, b"ecc_add")
    g = GENERATOR
    p = GENERATOR.mul(rng.randrange(1, JJ_ORDER))
    q = GENERATOR.mul(rng.randrange(1, JJ_ORDER))
    check_satisfied(prover, verifier, [], AddPointCircuit())
    check_satisfied(prover, verifier, [], AddPointCircuit(g, JubjubPoint.identity(), g))
    check_satisfied(prover, verifier, [], AddPointCircuit(p, q, p + q))
    check_satisfied(prover, verifier, [], AddPointCircuit(g, g, g.double()))
    check_unsatisfied(prover, AddPointCircuit(p, q, p))
    check_unsatisfied(prover, AddPointCircuit(p, q, (p + q) + g))


@pytest.mark.skipif(not SLOW, reason="n=2048 prove; PLONK_SLOW_TESTS=1")
def test_component_mul_generator_matrix(pp):
    """ecc.rs:300-450 (component_mul_generator): honest, canonical boundary,
    and forged-result rows at full width."""
    class MulGenCircuit(Circuit):
        def __init__(self, scalar=0, result=None):
            self.scalar = scalar
            self.result = result or JubjubPoint.identity()

        def circuit(self, c):
            w_s = c.append_witness(self.scalar)
            w_res = c.append_point(self.result)
            res = c.component_mul_generator(w_s, GENERATOR)
            c.assert_equal_point(res, w_res)

    pp_big = PublicParameters.setup(1 << 11, secret=0x6AD6E8, device=False)
    prover, verifier = _compile(pp_big, MulGenCircuit, b"ecc_mulgen")
    check_satisfied(prover, verifier, [], MulGenCircuit())
    s = rng.randrange(1, JJ_ORDER)
    check_satisfied(prover, verifier, [], MulGenCircuit(s, GENERATOR.mul(s)))
    check_satisfied(prover, verifier, [],
                    MulGenCircuit(JJ_ORDER - 1, GENERATOR.mul(JJ_ORDER - 1)))
    check_unsatisfied(prover, MulGenCircuit(s, GENERATOR.mul(s) + GENERATOR))


@pytest.mark.skipif(not SLOW, reason="n=4096 prove; PLONK_SLOW_TESTS=1")
def test_component_mul_point_matrix(pp):
    """ecc.rs:830-889 (component_mul_point): variable-base scalar mul."""
    class MulPointCircuit(Circuit):
        def __init__(self, scalar=0, point=None, result=None):
            ident = JubjubPoint.identity()
            self.scalar = scalar
            self.point = point or GENERATOR
            self.result = result or ident

        def circuit(self, c):
            w_s = c.append_witness(self.scalar)
            w_p = TorsionFreeWitnessPoint.new_unchecked(c.append_point(self.point))
            w_res = c.append_point(self.result)
            res = c.component_mul_point(w_s, w_p)
            c.assert_equal_point(res, w_res)

    pp_big = PublicParameters.setup(1 << 12, secret=0x6AD6E9, device=False)
    prover, verifier = _compile(pp_big, MulPointCircuit, b"ecc_mulpoint")
    check_satisfied(prover, verifier, [],
                    MulPointCircuit(0, GENERATOR, JubjubPoint.identity()))
    s = rng.randrange(1, 1 << 252)
    check_satisfied(prover, verifier, [], MulPointCircuit(s, GENERATOR, GENERATOR.mul(s)))
    check_unsatisfied(prover, MulPointCircuit(s, GENERATOR, GENERATOR.mul(s) + GENERATOR))
