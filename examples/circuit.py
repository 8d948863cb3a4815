"""End-to-end example mirroring the reference's examples/circuit.rs.

A circuit proving, for witnesses (a, b, d, e) and public inputs (c, f):
  1) a < 2^6
  2) b < 2^4
  3) a + b + 42 = c          (c public)
  4) a * b + d = 42
  5) [e] * JUBJUB_GENERATOR = f   (f public)

Run: python examples/circuit.py   (TPU by default; JAX_PLATFORMS=cpu works too)
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from plonk_tpu import Circuit, Constraint, PublicParameters
from plonk_tpu.compiler import Compiler
from plonk_tpu.curve.jubjub import GENERATOR, JubjubPoint


class TestCircuit(Circuit):
    def __init__(self, a=0, b=0, c=0, d=0, e=0, f=None):
        self.a, self.b, self.c, self.d, self.e = a, b, c, d, e
        self.f = f if f is not None else JubjubPoint.identity()

    def circuit(self, composer):
        a = composer.append_witness(self.a)
        b = composer.append_witness(self.b)
        d = composer.append_witness(self.d)

        composer.component_range_bits(a, 6)               # 1) a < 2^6
        composer.component_range_bits(b, 4)               # 2) b < 2^4

        constraint = Constraint().left(1).right(1).a(a).b(b).constant(42)
        result = composer.gate_add(constraint)            # 3) a + b + 42 = c
        c = composer.append_public(self.c)
        composer.assert_equal(result, c)

        constraint = Constraint().mult(1).a(a).b(b).fourth(1).d(d)
        result = composer.gate_mul(constraint)            # 4) a * b + d = 42
        composer.assert_equal_constant(result, 42, None)

        e = composer.append_witness(self.e)               # 5) [e] G = f
        scalar_mul_result = composer.component_mul_generator(e, GENERATOR)
        composer.assert_equal_public_point(scalar_mul_result, self.f)


def main():
    label = b"transcript-arguments"
    pp = PublicParameters.setup(1 << 12, secret=0x0DD5)

    t0 = time.time()
    prover, verifier = Compiler.compile(TestCircuit, pp, label)
    print(f"compiled in {time.time() - t0:.1f}s (n = {prover.size})")

    a, b, c, d = 31, 0, 73, 42
    e = 1
    f = GENERATOR
    circuit = TestCircuit(a, b, c, d, e, f)

    t0 = time.time()
    proof, public_inputs = prover.prove(circuit)
    print(f"proved in {time.time() - t0:.2f}s "
          f"({len(proof.to_bytes())}-byte proof)")

    t0 = time.time()
    verifier.verify(proof, public_inputs)
    print(f"verified in {(time.time() - t0) * 1000:.1f}ms")


if __name__ == "__main__":
    main()
