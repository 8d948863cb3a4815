"""Scaffolding for the adversarial soundness tier.

Mirrors /root/reference/src/composer/tests/soundness/support.rs: every forgery
must (a) emit EXACTLY the honest gate layout — same selector columns, same wire
indices, same public-input rows — and (b) be rejected by the prover with
precisely `CircuitUnsatisfied` (the quotient 7n degree-floor detection,
quotient_poly.rs:104-133).

The mechanism: `record(build)` runs a gadget against an initialized composer
and captures the appended gates + witness values.  `Forgery` replays that
layout with tampered witness values from inside a `Circuit`, so the prover's
re-execution path (`Composer::prove`) sees the forged assignment.
"""

from __future__ import annotations

import hashlib

import pytest

from plonk_tpu.composer import Composer, Circuit
from plonk_tpu.composer.constraint import Constraint, Witness, SELECTOR_NAMES
from plonk_tpu.field import params
from plonk_tpu.utils.errors import CircuitUnsatisfied

R = params.R_MOD

# gates/witnesses implicitly created by Composer.initialized()
BASE_GATES = 4
BASE_WITNESSES = 8  # 0, 1, and the dummy-gate witnesses 6,1,7,-20 -> actually 6


def _base_counts():
    c = Composer.initialized()
    return c.constraints(), len(c.witnesses)


class Recording:
    """Captured gadget trace: witness values + gate rows beyond the base."""

    def __init__(self, witnesses, gates, public_rows):
        self.witnesses = witnesses      # list[int], appended after base
        self.gates = gates              # list[(sel: dict, wires: (a,b,c,d), pi)]
        self.public_rows = public_rows  # {row_offset: value}

    def layout_digest(self) -> bytes:
        """Fingerprint of everything that shapes the verifier key: selector
        columns, wire indices, public-input rows (support.rs:93-135)."""
        h = hashlib.sha256()
        for sel, wires, pi in self.gates:
            for name in SELECTOR_NAMES:
                h.update(sel.get(name, 0).to_bytes(32, "little"))
            for w in wires:
                h.update(int(w).to_bytes(8, "little"))
            h.update(b"\x01" if pi is not None else b"\x00")
        return h.digest()


def record(build) -> Recording:
    """Run `build(composer)` on an initialized composer; capture its trace."""
    base_g, base_w = _base_counts()
    c = Composer.initialized()
    build(c)
    witnesses = list(c.witnesses[base_w:])
    gates = []
    for row in range(base_g, c.constraints()):
        sel = {n: c.sel[n][row] for n in SELECTOR_NAMES if c.sel[n][row]}
        wires = tuple(c.wires[k][row] for k in "abcd")
        pi = c.public_inputs.get(row)
        gates.append((sel, wires, pi))
    return Recording(witnesses, gates, {
        row - base_g: v for row, v in c.public_inputs.items() if row >= base_g
    })


class Replay(Circuit):
    """Replays a recording (honest or tampered) with exact gate layout."""

    def __init__(self, recording: Recording, tampered_witnesses=None):
        self.rec = recording
        self.witness_values = (
            list(tampered_witnesses) if tampered_witnesses is not None
            else list(recording.witnesses))

    def circuit(self, c: Composer):
        base_w = len(c.witnesses)
        for v in self.witness_values:
            c.append_witness(v)
        for sel, wires, pi in self.rec.gates:
            constraint = Constraint()
            for name, v in sel.items():
                constraint = constraint._set(name, v)
            a, b, cc, d = (Witness(w) for w in wires)
            constraint = constraint.a(a).b(b).c(cc).d(d)
            if pi is not None:
                constraint = constraint.public(pi)
            c.append_custom_gate(constraint)


def replay_digest(circuit: Replay) -> bytes:
    """Digest of the layout a Replay actually emits (re-recorded)."""
    return record(lambda c: circuit.circuit(c)).layout_digest()


def assert_rejected(prover, forged: Replay, honest: Recording):
    """The forgery must keep the honest layout and die as CircuitUnsatisfied
    (support.rs:166-188)."""
    assert replay_digest(forged) == honest.layout_digest(), (
        "forgery altered the gate layout — not a soundness test")
    with pytest.raises(CircuitUnsatisfied):
        prover.prove(forged, rng=_FixedRng())


def assert_accepted(prover, verifier, circuit: Replay):
    proof, pis = prover.prove(circuit, rng=_FixedRng())
    verifier.verify(proof, pis)


class _FixedRng:
    """Deterministic blinding so tests are reproducible."""

    def __init__(self, seed: int = 42):
        import random

        self._r = random.Random(seed)

    def randrange(self, n: int) -> int:
        return self._r.randrange(n)


def compile_replay(recording: Recording, pp, label: bytes):
    from plonk_tpu.compiler import Compiler

    return Compiler.compile_with_circuit(pp, label, Replay(recording))
