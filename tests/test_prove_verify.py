"""End-to-end prove + verify (reference test tier 2, tests/gate_add_mul.rs
pattern): compile once, drive satisfied and unsatisfied witness matrices."""

import random

import pytest

from plonk_tpu import Constraint, Circuit, PublicParameters
from plonk_tpu.compiler import Compiler, Prover, Verifier
from plonk_tpu.proof_system.proof import Proof
from plonk_tpu.utils.errors import (
    CircuitUnsatisfied, ProofVerificationError, InconsistentPublicInputsLen,
    InvalidCircuitSize,
)


class AddMulCircuit(Circuit):
    """s = a + b; m = a * b; public p; assert s + m == p."""

    def __init__(self, a=3, b=4, pub=19):
        self.a, self.b, self.pub = a, b, pub

    def circuit(self, c):
        a = c.append_witness(self.a)
        b = c.append_witness(self.b)
        s = c.gate_add(Constraint().left(1).right(1).a(a).b(b))
        m = c.gate_mul(Constraint().mult(1).a(a).b(b))
        p = c.append_public(self.pub)
        o = c.gate_add(Constraint().left(1).right(1).a(s).b(m))
        c.assert_equal(o, p)


@pytest.fixture(scope="module")
def compiled():
    pp = PublicParameters.setup(64, secret=0xDEAD, device=False)
    prover, verifier = Compiler.compile_with_circuit(pp, b"add-mul", AddMulCircuit())
    return prover, verifier


def test_satisfied_circuits(compiled):
    prover, verifier = compiled
    for a, b, seed in [(3, 4, 1), (2, 5, 2), (0, 0, 3), (7, 1, 4)]:
        pub = (a + b + a * b)
        proof, pis = prover.prove(AddMulCircuit(a, b, pub), rng=random.Random(seed))
        assert pis == [pub]
        verifier.verify(proof, pis)


def test_unsatisfied_witness_rejected(compiled):
    prover, _ = compiled
    with pytest.raises(CircuitUnsatisfied):
        prover.prove(AddMulCircuit(3, 4, 20), rng=random.Random(9))


def test_public_input_mismatch_rejected(compiled):
    prover, verifier = compiled
    proof, pis = prover.prove(AddMulCircuit(3, 4, 19), rng=random.Random(5))
    with pytest.raises(ProofVerificationError):
        verifier.verify(proof, [20])
    with pytest.raises(InconsistentPublicInputsLen):
        verifier.verify(proof, [19, 19])


def test_proof_serde_and_tamper(compiled):
    prover, verifier = compiled
    proof, pis = prover.prove(AddMulCircuit(2, 3, 11), rng=random.Random(6))
    data = proof.to_bytes()
    assert len(data) == Proof.SIZE == 1008
    proof2 = Proof.from_bytes(data)
    verifier.verify(proof2, pis)
    # tampering any evaluation breaks verification
    bad = bytearray(data)
    bad[-1] ^= 1
    with pytest.raises(ProofVerificationError):
        verifier.verify(Proof.from_bytes(bytes(bad)), pis)


def test_wrong_size_circuit_rejected(compiled):
    prover, _ = compiled

    class Bigger(AddMulCircuit):
        def circuit(self, c):
            super().circuit(c)
            c.gate_add(Constraint().left(1).a(c.ZERO))

    with pytest.raises(InvalidCircuitSize):
        prover.prove(Bigger(), rng=random.Random(7))


def test_prover_verifier_serde(compiled):
    prover, verifier = compiled
    p2 = Prover.try_from_bytes(prover.to_bytes())
    proof, pis = p2.prove(AddMulCircuit(4, 5, 29), rng=random.Random(8))
    v2 = Verifier.try_from_bytes(verifier.to_bytes())
    v2.verify(proof, pis)
    assert v2.verifier_key == verifier.verifier_key


def test_deterministic_blinding_reproducible(compiled):
    prover, _ = compiled
    p1, _ = prover.prove(AddMulCircuit(3, 4, 19), rng=random.Random(42))
    p2, _ = prover.prove(AddMulCircuit(3, 4, 19), rng=random.Random(42))
    assert p1.to_bytes() == p2.to_bytes()
