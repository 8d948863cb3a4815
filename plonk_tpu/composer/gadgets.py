"""The full gadget library, attached as Composer methods.

Counterparts (semantics + gate layouts) of the reference gadget modules:
  bits.rs      — component_boolean, component_decomposition
  select.rs    — component_select{,_one,_zero}
  range.rs     — component_range_bits / range_check (base-4 quad accumulators)
  logic.rs     — append_logic_{and,xor} (+ input binding)
  truncate.rs  — component_truncate (+ canonical < r guard)
  point.rs     — point allocation/equality/add/sub/neg/mux, torsion-free check,
                 variable-base scalar mul
  fixed_base.rs— component_mul_generator (width-2 wNAF, 256 widget rows,
                 canonical-scalar + 253-digit soundness bounds)

Gate layouts are kept identical per gadget call (same counts, same selector
placement) so verifier keys are portable across implementations.
"""

from __future__ import annotations

from ..field import params
from ..curve.jubjub import JubjubPoint, scalar_to_wnaf2, ORDER as JUBJUB_ORDER
from ..utils.errors import (
    NotSupportedBitSize, PointMalformed, PlonkError,
)
from .composer import Composer
from .constraint import Constraint, Witness
from .ecc_types import WitnessPoint, TorsionFreeWitnessPoint

R = params.R_MOD
EDWARDS_D = params.JUBJUB_D

JUBJUB_SCALAR_BITS = 252
FIXED_BASE_ROUNDS = 256
FIXED_BASE_LEADING_ZERO_ROUNDS = 3


def _bit(v: int, i: int) -> int:
    return (v >> i) & 1


# ---------------------------------------------------------------------------
# bits.rs
# ---------------------------------------------------------------------------

def component_boolean(self, a: Witness):
    """a*a - a == 0 in one gate (bits.rs:43-54)."""
    self.append_gate(
        Constraint().mult(1).output(R - 1).a(a).b(a).c(a).d(Composer.ZERO)
    )


def component_decomposition(self, scalar: Witness, n_bits: int):
    """N booleans + N accumulation adds + closing equality; 2N+1 gates."""
    assert 0 < n_bits <= 256
    value = self[scalar]
    acc = Composer.ZERO
    bits = []
    for i in range(n_bits):
        w = self.append_witness(_bit(value, i))
        bits.append(w)
        self.component_boolean(w)
        acc = self.gate_add(
            Constraint().left(1 << i).right(1).a(w).b(acc)
        )
    self.assert_equal(acc, scalar)
    return bits


# ---------------------------------------------------------------------------
# select.rs
# ---------------------------------------------------------------------------

def component_select(self, bit: Witness, a: Witness, b: Witness) -> Witness:
    """bit ? a : b (4 gates; bit must be boolean-constrained by the caller)."""
    bit_a = self.gate_mul(Constraint().mult(1).a(bit).b(a))
    one_min_bit = self.gate_add(Constraint().left(R - 1).constant(1).a(bit))
    omb_b = self.gate_mul(Constraint().mult(1).a(one_min_bit).b(b))
    return self.gate_add(Constraint().left(1).right(1).a(omb_b).b(bit_a))


def component_select_one(self, bit: Witness, value: Witness) -> Witness:
    """bit ? value : 1 (1 gate)."""
    b, v = self[bit], self[value]
    f_x = (1 - b + b * v) % R
    f_x = self.append_witness(f_x)
    self.append_gate(
        Constraint().mult(1).left(R - 1).output(R - 1).constant(1)
        .a(bit).b(value).c(f_x)
    )
    return f_x


def component_select_zero(self, bit: Witness, value: Witness) -> Witness:
    """bit ? value : 0 (1 gate)."""
    return self.gate_mul(Constraint().mult(1).a(bit).b(value))


# ---------------------------------------------------------------------------
# range.rs
# ---------------------------------------------------------------------------

def component_range_bits(self, witness: Witness, bits: int):
    """Constrain witness to [0, 2^bits); any width <= 256 (odd allowed)."""
    assert bits <= 256, "BITS must be <= 256"
    self.range_check(witness, bits)


def component_range(self, witness: Witness, bit_pairs: int):
    """Deprecated bit-pair API (range.rs:63-77): 2*bit_pairs bits, capped 256."""
    self.range_check_even(witness, min(bit_pairs * 2, 256))


def range_check(self, value: Witness, num_bits: int):
    if num_bits % 2 == 0:
        self.range_check_even(value, num_bits)
        return
    top = num_bits - 1
    v = self[value]
    lower_value = v & ((1 << top) - 1)
    top_bit_value = _bit(v, top)
    lower = self.append_witness(lower_value)
    self.range_check_even(lower, top)
    top_bit = self.append_witness(top_bit_value)
    self.component_boolean(top_bit)
    recomposed = self.gate_add(
        Constraint().left(1).right(1 << top).a(lower).b(top_bit)
    )
    self.assert_equal(recomposed, value)


def range_check_even(self, witness: Witness, num_bits: int):
    """Shared base-4 quad decomposition (range.rs:122-203)."""
    assert num_bits % 2 == 0
    if num_bits == 0:
        self.append_gate(Constraint().left(1).a(witness))
        return
    value = self[witness]
    num_gates = (num_bits >> 3) + (1 if num_bits % 8 else 0)
    num_quads = num_gates * 4
    pad = 1 + (((num_quads << 1) - num_bits) >> 1)
    used_gates = num_gates + 1

    constraints = [Constraint.range(Constraint()) for _ in range(used_gates)]
    accumulators = []
    accumulator = 0
    wire_order = ("d", "c", "b", "a")

    for i in range(pad, num_quads + 1):
        bit_index = (num_quads - i) << 1
        q0 = _bit(value, bit_index)
        q1 = _bit(value, bit_index + 1)
        quad = q0 + 2 * q1
        accumulator = (4 * accumulator + quad) % R
        acc_w = self.append_witness(accumulator)
        accumulators.append(acc_w)
        idx = i // 4
        wire = wire_order[i % 4]
        c = constraints[idx]
        widx = {"a": 0, "b": 1, "c": 2, "d": 3}[wire]
        c.witnesses[widx] = acc_w

    # last gate: zero selectors, carries the final accumulator in D
    last = Constraint()
    if accumulators:
        last.witnesses[3] = accumulators[-1]
        # the reference replaces the reserved row wholesale (zero selectors,
        # only D carries the accumulator) — range.rs:184-195; matched here.
    constraints[-1] = last

    for c in constraints:
        self.append_custom_gate(c)

    if accumulators:
        self.assert_equal(accumulators[-1], witness)


# ---------------------------------------------------------------------------
# logic.rs
# ---------------------------------------------------------------------------

def append_logic_component(self, a: Witness, b: Witness, bit_pairs: int,
                           is_xor: bool) -> Witness:
    """Quad-wise AND/XOR accumulator table + input binding (logic.rs:22-212)."""
    if bit_pairs > 127:
        raise NotSupportedBitSize(
            "BIT_PAIRS must be <= 127: at most 254 bits")
    num_bits = bit_pairs * 2
    num_quads = bit_pairs

    av, bv = self[a], self[b]
    left_acc = right_acc = out_acc = 0
    constraint = (Constraint.logic_xor(Constraint()) if is_xor
                  else Constraint.logic(Constraint()))

    for i in range(num_quads):
        hi = num_bits - 1 - 2 * i
        left_quad = 2 * _bit(av, hi) + _bit(av, hi - 1)
        right_quad = 2 * _bit(bv, hi) + _bit(bv, hi - 1)
        out_quad = (left_quad ^ right_quad) if is_xor else (left_quad & right_quad)
        prod_quad = left_quad * right_quad

        left_acc = (left_acc * 4 + left_quad) % R
        right_acc = (right_acc * 4 + right_quad) % R
        out_acc = (out_acc * 4 + out_quad) % R

        wit_a = self.append_witness(left_acc)
        wit_b = self.append_witness(right_acc)
        wit_c = self.append_witness(prod_quad)
        wit_d = self.append_witness(out_acc)

        constraint = constraint.c(wit_c)
        self.append_custom_gate(constraint)
        constraint = constraint.a(wit_a).b(wit_b).d(wit_d)

    left_acc_wit = constraint.witnesses[0]
    right_acc_wit = constraint.witnesses[1]
    d = constraint.witnesses[3]
    pad = Constraint().a(left_acc_wit).b(right_acc_wit).d(d)
    self.append_custom_gate(pad)

    if bit_pairs > 0:
        self.bind_truncation_split(a, left_acc_wit, num_bits)
        self.bind_truncation_split(b, right_acc_wit, num_bits)
    return d


def append_logic_and(self, a: Witness, b: Witness, bit_pairs: int) -> Witness:
    return self.append_logic_component(a, b, bit_pairs, False)


def append_logic_xor(self, a: Witness, b: Witness, bit_pairs: int) -> Witness:
    return self.append_logic_component(a, b, bit_pairs, True)


# ---------------------------------------------------------------------------
# truncate.rs
# ---------------------------------------------------------------------------

def bind_truncation_split(self, input_w: Witness, low: Witness, num_bits: int):
    """input == high*2^num_bits + low, high range-checked, canonical < r guard.
    Caller must already constrain low to [0, 2^num_bits)."""
    high_bits = 255 - num_bits
    pow2 = 1 << num_bits
    high_value = self[input_w] >> num_bits
    high = self.append_witness(high_value)
    self.range_check(high, high_bits)
    recomposed = self.gate_add(
        Constraint().left(pow2).right(1).a(high).b(low))
    self.assert_equal(recomposed, input_w)
    self.assert_canonical_truncation(high, low, num_bits)


def component_truncate(self, witness: Witness, n_bits: int) -> Witness:
    """low = witness mod 2^n_bits, canonically bound (truncate.rs:85-113)."""
    if n_bits > 254:
        raise NotSupportedBitSize("N must be <= 254")
    low_value = self[witness] & ((1 << n_bits) - 1)
    low = self.append_witness(low_value)
    self.range_check(low, n_bits)
    self.bind_truncation_split(witness, low, n_bits)
    return low


def assert_canonical_truncation(self, high: Witness, low: Witness,
                                num_bits: int):
    """(high, low) <= (r_high, r_low) lexicographically (truncate.rs:121-182)."""
    high_bits = 255 - num_bits
    rm1 = R - 1
    r_low = rm1 & ((1 << num_bits) - 1)
    r_high = rm1 >> num_bits

    diff = self.gate_add(
        Constraint().left(R - 1).a(high).constant(r_high))
    self.range_check(diff, high_bits)

    dv = self[diff]
    diff_inverse = pow(dv, -1, R) if dv else 0
    inverse = self.append_witness(diff_inverse)
    product = self.gate_mul(Constraint().mult(1).a(diff).b(inverse))
    is_top = self.gate_add(
        Constraint().left(R - 1).a(product).constant(1))
    self.append_gate(Constraint().mult(1).a(diff).b(is_top))

    r_low_minus_low = self.gate_add(
        Constraint().left(R - 1).a(low).constant(r_low))
    guard = self.gate_mul(
        Constraint().mult(1).a(is_top).b(r_low_minus_low))
    self.range_check(guard, num_bits)


# ---------------------------------------------------------------------------
# point.rs
# ---------------------------------------------------------------------------

def append_point(self, point: JubjubPoint) -> WitnessPoint:
    x = self.append_witness(point.x)
    y = self.append_witness(point.y)
    return WitnessPoint(x, y)


_SUBGROUP_OK: set[tuple[int, int]] = set()


def append_constant_point(self, point: JubjubPoint) -> TorsionFreeWitnessPoint:
    key = (point.x, point.y)
    if key not in _SUBGROUP_OK:
        if not point.is_on_curve() or not (
            point.mul(JUBJUB_ORDER).is_identity()
        ):
            raise PointMalformed("point not in the prime-order subgroup")
        _SUBGROUP_OK.add(key)
    x = self.append_constant(point.x)
    y = self.append_constant(point.y)
    return TorsionFreeWitnessPoint(x, y)


def append_public_point(self, point: JubjubPoint) -> WitnessPoint:
    wp = self.append_point(point)
    self.assert_equal_constant(wp.x(), 0, point.x)
    self.assert_equal_constant(wp.y(), 0, point.y)
    return wp


def assert_equal_point(self, a: WitnessPoint, b: WitnessPoint):
    self.assert_equal(a.x(), b.x())
    self.assert_equal(a.y(), b.y())


def assert_equal_public_point(self, point: WitnessPoint, public: JubjubPoint):
    self.assert_equal_constant(point.x(), 0, public.x)
    self.assert_equal_constant(point.y(), 0, public.y)


def assert_torsion_free_point(self, point: WitnessPoint) -> TorsionFreeWitnessPoint:
    """point == [8]Q with Q on-curve: 12 gates (point.rs:239-296)."""
    u, v = self[point.x()], self[point.y()]
    pv = JubjubPoint(u, v)
    if pv.is_on_curve():
        q = pv.mul(pow(8, -1, JUBJUB_ORDER))
    else:
        q = JubjubPoint.identity()
    self.assert_torsion_free_gates(point, q)
    return TorsionFreeWitnessPoint.new_unchecked(point)


def assert_torsion_free_gates(self, point: WitnessPoint, q: JubjubPoint):
    qp = self.append_point(q)
    qu, qv = qp.x(), qp.y()
    u2 = self.gate_mul(Constraint().mult(1).a(qu).b(qu))
    v2 = self.gate_mul(Constraint().mult(1).a(qv).b(qv))
    u2v2 = self.gate_mul(Constraint().mult(1).a(u2).b(v2))
    self.append_gate(
        Constraint().left(R - 1).a(u2).right(1).b(v2)
        .output((-EDWARDS_D) % R).c(u2v2).constant(R - 1)
    )
    q2 = self.add_point_gates(qp, qp)
    q4 = self.add_point_gates(q2, q2)
    q8 = self.add_point_gates(q4, q4)
    self.assert_equal_point(point, q8)


def component_neg_point(self, p: TorsionFreeWitnessPoint) -> TorsionFreeWitnessPoint:
    neg_x = self.gate_mul(Constraint().left(R - 1).a(p.x()))
    return TorsionFreeWitnessPoint(neg_x, p.y())


def component_sub_point(self, a, b) -> TorsionFreeWitnessPoint:
    return self.component_add_point(a, self.component_neg_point(b))


def component_add_point(self, a, b) -> TorsionFreeWitnessPoint:
    return TorsionFreeWitnessPoint.new_unchecked(self.add_point_gates(a, b))


def add_point_gates(self, a: WitnessPoint, b: WitnessPoint) -> WitnessPoint:
    """2 rows: variable-base widget row + shifted-wire anchor (point.rs:357-397)."""
    x1, y1, x2, y2 = a.x(), a.y(), b.x(), b.y()
    p1 = JubjubPoint(self[x1], self[y1])
    p2 = JubjubPoint(self[x2], self[y2])
    p3 = p1 + p2
    x1y2 = self[x1] * self[y2] % R

    w_x1y2 = self.append_witness(x1y2)
    w_x3 = self.append_witness(p3.x)
    w_y3 = self.append_witness(p3.y)

    self.append_custom_gate(
        Constraint.group_add_variable_base(
            Constraint().a(x1).b(y1).c(x2).d(y2)))
    self.append_custom_gate(Constraint().a(w_x3).b(w_y3).d(w_x1y2))
    return WitnessPoint(w_x3, w_y3)


def component_select_identity(self, bit: Witness, a) -> TorsionFreeWitnessPoint:
    self.component_boolean(bit)
    return TorsionFreeWitnessPoint.new_unchecked(
        self.select_identity_gates(bit, a))


def select_identity_gates(self, bit: Witness, a) -> WitnessPoint:
    x = self.component_select_zero(bit, a.x())
    y = self.component_select_one(bit, a.y())
    return WitnessPoint(x, y)


def component_mul_point(self, jubjub: Witness, point) -> TorsionFreeWitnessPoint:
    """252-bit double-and-add over the decomposed scalar (point.rs:446-467)."""
    scalar_bits = self.component_decomposition(jubjub, 252)
    result = WitnessPoint(Composer.ZERO, Composer.ONE)
    for bit in reversed(scalar_bits):
        result = self.add_point_gates(result, result)
        to_add = self.select_identity_gates(bit, point)
        result = self.add_point_gates(result, to_add)
    return TorsionFreeWitnessPoint.new_unchecked(result)


def component_select_point(self, bit: Witness, a: WitnessPoint,
                           b: WitnessPoint) -> WitnessPoint:
    x = self.component_select(bit, a.x(), b.x())
    y = self.component_select(bit, a.y(), b.y())
    return WitnessPoint(x, y)


# ---------------------------------------------------------------------------
# fixed_base.rs
# ---------------------------------------------------------------------------

_PRIME_ORDER_OK: set[tuple[int, int]] = set()


def _check_prime_order_generator(generator: JubjubPoint):
    """Exact prime-order check, memoized: [r]G is a ~252-bit host scalar mul
    and every prove re-runs the circuit (fixed_base.rs:68-75)."""
    key = (generator.x, generator.y)
    if key in _PRIME_ORDER_OK:
        return
    if (not generator.is_on_curve()) or not (
        (not generator.is_identity())
        and generator.mul(JUBJUB_ORDER).is_identity()
    ):
        raise PointMalformed("generator must be an exact prime-order point")
    _PRIME_ORDER_OK.add(key)


def component_mul_generator(self, jubjub: Witness,
                            generator: JubjubPoint) -> TorsionFreeWitnessPoint:
    """Width-2 wNAF fixed-base mul: 256 widget rows + anchor + canonicality
    bounds (fixed_base.rs:60-329)."""
    _check_prime_order_generator(generator)
    scalar_value = self[jubjub]
    if scalar_value >= JUBJUB_ORDER:
        raise PlonkError("witness is not a canonical Jubjub scalar")
    wnaf = scalar_to_wnaf2(scalar_value, FIXED_BASE_ROUNDS)
    return TorsionFreeWitnessPoint.new_unchecked(
        self.append_fixed_base_signed_digits(jubjub, generator, wnaf))


_FIXED_BASE_TABLES: dict[tuple[int, int], list] = {}


def _fixed_base_multiples(generator: JubjubPoint) -> list:
    """[2^i]G table, reversed for MSB-first Horner; cached per generator
    (every prove re-executes the circuit, and the table is 255 doubles)."""
    key = (generator.x, generator.y)
    table = _FIXED_BASE_TABLES.get(key)
    if table is None:
        table = [generator]
        for _ in range(FIXED_BASE_ROUNDS - 1):
            table.append(table[-1].double())
        table.reverse()
        _FIXED_BASE_TABLES[key] = table
    return table


def append_fixed_base_signed_digits(self, jubjub: Witness,
                                    generator: JubjubPoint,
                                    signed_digits: list[int]) -> WitnessPoint:
    self.assert_canonical_jubjub_scalar(jubjub)

    multiples = _fixed_base_multiples(generator)

    scalar_acc = [0]
    point_acc = [JubjubPoint.identity()]
    xy_alphas = []
    for i, entry in enumerate(reversed(signed_digits)):
        if entry == 0:
            s_add, p_add = 0, JubjubPoint.identity()
        elif entry == 1:
            s_add, p_add = 1, multiples[i]
        elif entry == -1:
            s_add, p_add = R - 1, -multiples[i]
        else:
            raise PlonkError("unsupported wNAF2 digit")
        scalar_acc.append((2 * scalar_acc[i] + s_add) % R)
        point_acc.append(point_acc[i] + p_add)
        xy_alphas.append(p_add.x * p_add.y % R)

    leading_accumulator = Composer.ZERO
    for i in range(FIXED_BASE_ROUNDS):
        acc_x = self.append_witness(point_acc[i].x)
        acc_y = self.append_witness(point_acc[i].y)
        accumulated_bit = self.append_witness(scalar_acc[i])
        if i == FIXED_BASE_LEADING_ZERO_ROUNDS:
            leading_accumulator = accumulated_bit
        if i == 0:
            self.assert_equal_constant(acc_x, 0, None)
            self.assert_equal_constant(acc_y, 1, None)
            self.assert_equal_constant(accumulated_bit, 0, None)
        x_beta, y_beta = multiples[i].x, multiples[i].y
        xy_alpha = self.append_witness(xy_alphas[i])
        xy_beta = x_beta * y_beta % R
        self.append_custom_gate(
            Constraint.group_add_fixed_base(
                Constraint()
                .left(x_beta).right(y_beta).constant(xy_beta)
                .a(acc_x).b(acc_y).c(xy_alpha).d(accumulated_bit)))

    # shifted-wire anchor row
    acc_x = self.append_witness(point_acc[FIXED_BASE_ROUNDS].x)
    acc_y = self.append_witness(point_acc[FIXED_BASE_ROUNDS].y)
    last_acc_bit = self.append_witness(scalar_acc[FIXED_BASE_ROUNDS])
    self.append_gate(Constraint().a(acc_x).b(acc_y).d(last_acc_bit))

    # leading 3 digits pinned to zero: 253 effective digits < modulus wrap
    self.assert_equal_constant(leading_accumulator, 0, None)
    self.assert_equal(last_acc_bit, jubjub)
    return WitnessPoint(acc_x, acc_y)


def assert_canonical_jubjub_scalar(self, scalar: Witness):
    """scalar in [0, r_jubjub): two 252-bit range checks (fixed_base.rs:317-328)."""
    self.range_check(scalar, JUBJUB_SCALAR_BITS)
    max_jj = (JUBJUB_ORDER - 1) % R
    distance = self.gate_add(
        Constraint().left(R - 1).a(scalar).constant(max_jj))
    self.range_check(distance, JUBJUB_SCALAR_BITS)


# ---------------------------------------------------------------------------
# attach everything to Composer
# ---------------------------------------------------------------------------

_GADGETS = {
    "component_boolean": component_boolean,
    "component_decomposition": component_decomposition,
    "component_select": component_select,
    "component_select_one": component_select_one,
    "component_select_zero": component_select_zero,
    "component_range_bits": component_range_bits,
    "component_range": component_range,
    "range_check": range_check,
    "range_check_even": range_check_even,
    "append_logic_component": append_logic_component,
    "append_logic_and": append_logic_and,
    "append_logic_xor": append_logic_xor,
    "bind_truncation_split": bind_truncation_split,
    "component_truncate": component_truncate,
    "assert_canonical_truncation": assert_canonical_truncation,
    "append_point": append_point,
    "append_constant_point": append_constant_point,
    "append_public_point": append_public_point,
    "assert_equal_point": assert_equal_point,
    "assert_equal_public_point": assert_equal_public_point,
    "assert_torsion_free_point": assert_torsion_free_point,
    "assert_torsion_free_gates": assert_torsion_free_gates,
    "component_neg_point": component_neg_point,
    "component_sub_point": component_sub_point,
    "component_add_point": component_add_point,
    "add_point_gates": add_point_gates,
    "component_select_identity": component_select_identity,
    "select_identity_gates": select_identity_gates,
    "component_mul_point": component_mul_point,
    "component_select_point": component_select_point,
    "component_mul_generator": component_mul_generator,
    "append_fixed_base_signed_digits": append_fixed_base_signed_digits,
    "assert_canonical_jubjub_scalar": assert_canonical_jubjub_scalar,
}

for _name, _fn in _GADGETS.items():
    setattr(Composer, _name, _fn)

# identity point constant (reserved witnesses 0/1)
Composer.IDENTITY = WitnessPoint(Composer.ZERO, Composer.ONE)
