"""Prover-rejection soundness tier (reference src/composer/tests/soundness/*).

The jit half of the soundness suite: each forgery replays the digest-pinned
honest layout and the REAL prover must reject it with exactly
CircuitUnsatisfied (quotient 7n degree-floor detection).  These compile the
full prove pipeline, so they live in the `make smoke` tier; the no-jit
identity-checker forgery matrix covering the remaining variants is
tests/test_soundness.py (the `make fast` tier).
"""
import pytest

from plonk_tpu import PublicParameters
from plonk_tpu.composer import Composer
from plonk_tpu.composer.constraint import Constraint
from plonk_tpu.curve.jubjub import JubjubPoint, GENERATOR, ORDER as JJ_ORDER
from plonk_tpu.field import params

from soundness_support import (
    Recording, Replay, record, replay_digest,
    assert_rejected, assert_accepted, compile_replay,
)

R = params.R_MOD


@pytest.fixture(scope="module")
def pp():
    return PublicParameters.setup(64, secret=0x5EED, device=False)


def _compile(rec, pp, label):
    return compile_replay(rec, pp, label)


# -- evaluated_output.rs: the solved output wire is the soundness boundary ----

def test_forged_gate_output_rejected(pp):
    def build(c):
        a = c.append_witness(3)
        b = c.append_witness(4)
        c.gate_add(Constraint().left(1).right(1).a(a).b(b))

    rec = record(build)
    prover, verifier = _compile(rec, pp, b"snd-output")
    assert_accepted(prover, verifier, Replay(rec))
    # witnesses: [3, 4, 7] — forge the solved output
    forged = list(rec.witnesses)
    assert forged == [3, 4, 7]
    forged[2] = 8
    assert_rejected(prover, Replay(rec, forged), rec)


def test_forged_boolean_rejected(pp):
    def build(c):
        w = c.append_witness(1)
        c.component_boolean(w)

    rec = record(build)
    prover, verifier = _compile(rec, pp, b"snd-bool")
    assert_accepted(prover, verifier, Replay(rec))
    assert_rejected(prover, Replay(rec, [2]), rec)


# -- range.rs: quads must stay in [0,3] and bind the input --------------------

def _range_build(value, bits):
    def build(c):
        w = c.append_witness(value)
        c.component_range_bits(w, bits)
    return build


def test_range_oversized_quad_rejected(pp):
    """Encode 1324 (11 bits) in a 10-bit check via a quad of 5: every chain and
    equality gate is satisfied; only the delta(f) range identity can object."""
    rec = record(_range_build(300, 10))
    prover, verifier = _compile(rec, pp, b"snd-range")
    assert_accepted(prover, verifier, Replay(rec))

    target = 1324  # == 0b10100101100, needs quads (5,0,2,3,0)
    quads = []
    v = target
    for _ in range(5):
        quads.append(v % 4)
        v //= 4
    quads[-1] = 5  # top "quad" swallows the extra bit
    quads.reverse()
    accs, acc = [], 0
    for q in quads:
        acc = 4 * acc + q
        accs.append(acc)
    assert accs[-1] == target
    forged = [target] + accs
    assert len(forged) == len(rec.witnesses)
    assert_rejected(prover, Replay(rec, forged), rec)


def test_range_unbound_input_rejected(pp):
    """Keep the honest accumulator chain but claim it for a larger input —
    the closing assert_equal must catch it."""
    rec = record(_range_build(300, 10))
    prover, _ = _compile(rec, pp, b"snd-range")
    forged = list(rec.witnesses)
    forged[0] = 300 + 1024
    assert_rejected(prover, Replay(rec, forged), rec)


# -- logic.rs: accumulator forgery --------------------------------------------

def test_forged_logic_xor_rejected(pp):
    a_val, b_val = 0b1010, 0b0110

    def build(c):
        a = c.append_witness(a_val)
        b = c.append_witness(b_val)
        c.append_logic_xor(a, b, 2)

    rec = record(build)
    pp_big = PublicParameters.setup(256, secret=0x10C1C, device=False)
    prover, verifier = _compile(rec, pp_big, b"snd-logic")
    assert_accepted(prover, verifier, Replay(rec))
    # witnesses: [a, b, (left_acc, right_acc, prod, out_acc) * 2, binding...]
    # forge the final output accumulator (claim XOR == honest ^ 1)
    forged = list(rec.witnesses)
    out_acc_pos = 2 + 4 * 1 + 3  # second quad's out_acc
    assert forged[out_acc_pos] == (a_val ^ b_val)
    forged[out_acc_pos] ^= 1
    assert_rejected(prover, Replay(rec, forged), rec)


# -- truncate.rs: the canonical < r guard --------------------------------------

def test_truncate_noncanonical_split_rejected(pp):
    """Represent w + r instead of w: all range checks and the recomposition
    still hold mod r; only the lexicographic (high,low) <= (r_high,r_low)
    canonicality guard can reject (truncate.rs:121-182)."""
    w_val = 0xDEAD_BEEF_0123
    n_bits = 16

    def honest(c):
        w = c.append_witness(w_val)
        c.component_truncate(w, n_bits)

    def forged(c):
        # same gadget body, with the split computed from w + r
        w = c.append_witness(w_val)
        shifted = w_val + R
        low_value = shifted & ((1 << n_bits) - 1)
        low = c.append_witness(low_value)
        c.range_check(low, n_bits)
        high_value = shifted >> n_bits
        high = c.append_witness(high_value)
        c.range_check(high, 255 - n_bits)
        recomposed = c.gate_add(
            Constraint().left(1 << n_bits).right(1).a(high).b(low))
        c.assert_equal(recomposed, w)
        c.assert_canonical_truncation(high, low, n_bits)

    rec = record(honest)
    rec_forged = record(forged)
    assert rec_forged.layout_digest() == rec.layout_digest()
    pp_big = PublicParameters.setup(128, secret=0x7217, device=False)
    prover, verifier = _compile(rec, pp_big, b"snd-trunc")
    assert_accepted(prover, verifier, Replay(rec))
    assert_rejected(prover, Replay(rec_forged), rec)


# -- point.rs: variable-base addition + torsion-free typing --------------------

def test_forged_point_add_rejected(pp):
    g = GENERATOR
    p2 = g.double()

    def build(c):
        a = c.append_point(g)
        b = c.append_point(p2)
        c.add_point_gates(a, b)

    rec = record(build)
    prover, verifier = _compile(rec, pp, b"snd-vadd")
    assert_accepted(prover, verifier, Replay(rec))
    # witnesses: [x1, y1, x2, y2, x1y2, x3, y3] — forge the sum
    wrong = g.double().double()
    forged = list(rec.witnesses)
    forged[5], forged[6] = wrong.x, wrong.y
    assert_rejected(prover, Replay(rec, forged), rec)


def test_torsion_point_rejected(pp):
    """A point with a nontrivial 8-torsion component must fail the [8]Q check."""
    g = GENERATOR
    torsion = _small_torsion_point()
    assert not torsion.is_identity()
    shifted = g + torsion
    assert shifted.is_on_curve()
    assert not shifted.mul(JJ_ORDER).is_identity()

    def build(c):
        p = c.append_point(g)
        c.assert_torsion_free_point(p)

    rec = record(build)
    prover, verifier = _compile(rec, pp, b"snd-torsion")
    assert_accepted(prover, verifier, Replay(rec))
    forged = list(rec.witnesses)
    forged[0], forged[1] = shifted.x, shifted.y
    assert_rejected(prover, Replay(rec, forged), rec)


def _small_torsion_point() -> JubjubPoint:
    """The order-2 torsion point (0, -1) of the twisted Edwards curve."""
    t = JubjubPoint(0, R - 1)
    assert t.is_on_curve() and t.double().is_identity()
    return t


# -- fixed_base.rs: forged accumulator result ----------------------------------
# -- fixed_base.rs: forged accumulator result ----------------------------------

def test_fixed_base_forgery_layout_is_pinned():
    """Cheap half of the fixed-base soundness check: the forgery emits the
    honest 520+-gate layout and the result witnesses sit where expected.
    The prove/reject round-trip runs under PLONK_SLOW_TESTS=1 (n=1024 proving
    is minutes on a 1-core CPU host; the TPU path covers it in bench)."""
    def build(c):
        s = c.append_witness(0x1234567)
        c.component_mul_generator(s, GENERATOR)

    rec = record(build)
    honest = GENERATOR.mul(0x1234567)
    assert rec.witnesses[-3] == honest.x and rec.witnesses[-2] == honest.y
    wrong = honest + GENERATOR
    forged = list(rec.witnesses)
    forged[-3], forged[-2] = wrong.x, wrong.y
    assert replay_digest(Replay(rec, forged)) == rec.layout_digest()


@pytest.mark.skipif(
    not __import__("os").environ.get("PLONK_SLOW_TESTS"),
    reason="n=1024 prove is minutes on a 1-core CPU host; set PLONK_SLOW_TESTS=1")
def test_forged_fixed_base_result_rejected():
    pp_big = PublicParameters.setup(1 << 10, secret=0xF1BA5E, device=False)

    def build(c):
        s = c.append_witness(0x1234567)
        c.component_mul_generator(s, GENERATOR)

    rec = record(build)
    prover, verifier = _compile(rec, pp_big, b"snd-fixed")
    assert_accepted(prover, verifier, Replay(rec))
    # final accumulator point witnesses sit just before the last scalar acc
    honest = GENERATOR.mul(0x1234567)
    assert rec.witnesses[-3] == honest.x and rec.witnesses[-2] == honest.y
    wrong = honest + GENERATOR
    forged = list(rec.witnesses)
    forged[-3], forged[-2] = wrong.x, wrong.y
    assert_rejected(prover, Replay(rec, forged), rec)


