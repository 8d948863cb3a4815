"""The circuit builder (Composer): columnar gate storage + gadget surface.

API parity with /root/reference/src/composer.rs (initialized / append_witness /
append_gate / append_custom_gate / append_evaluated_output / gate_add /
gate_mul / append_public / append_constant / assert_equal*), re-shaped for TPU:

- Gates are stored **columnar** from the start (one Python list per selector,
  one per wire) so preprocess/prove pack straight into (L, n) device tensors —
  no row-object traversal at proving time.
- Witness values are Python ints mod r (graph building is host work).
"""

from __future__ import annotations

import numpy as np

from ..field import params
from ..utils.runtime import Runtime, RuntimeEvent
from .constraint import Constraint, Witness, SELECTOR_NAMES
from .permutation import Permutation

R = params.R_MOD


class Composer:
    """Width-4 TurboPLONK constraint system builder."""

    ZERO = Witness(0)
    ONE = Witness(1)

    def __init__(self):
        """Use Composer.initialized(); this builds the uninitialized shell."""
        self.sel: dict[str, list[int]] = {name: [] for name in SELECTOR_NAMES}
        self.wires: dict[str, list[int]] = {k: [] for k in "abcd"}
        self.public_inputs: dict[int, int] = {}
        self.witnesses: list[int] = []
        self.perm = Permutation()
        self.runtime = Runtime()
        self.debugger = None  # attached by initialized() when config.debug
        # Prove-time re-execution only needs witness values, wire indices and
        # public inputs — selector columns and the permutation witness map are
        # compile-time artifacts.  Composer.prove() clears this to skip them
        # (the prover's preprocessed tensors are the source of truth; a circuit
        # that diverges is caught by the gate-count check + quotient test).
        self.record_layout = True

    # -- construction -----------------------------------------------------------

    @staticmethod
    def initialized() -> "Composer":
        """Reserved witnesses 0/1, their constant asserts, and the two dummy
        gates (blinding + non-identity permutation); composer.rs:174-237."""
        slf = Composer()
        from ..config import get_config

        if get_config().debug or get_config().trace_output:
            from ..utils.debug import Debugger

            slf.debugger = Debugger(slf)
        zero = slf.append_witness(0)
        one = slf.append_witness(1)
        slf.assert_equal_constant(zero, 0, None)
        slf.assert_equal_constant(one, 1, None)
        slf._append_dummy_gates()
        return slf

    def _append_dummy_gates(self):
        six = self.append_witness(6)
        one = self.append_witness(1)
        seven = self.append_witness(7)
        min_twenty = self.append_witness(R - 20)
        self.append_gate(
            Constraint()
            .mult(1).left(2).right(3).fourth(1).constant(4).output(4)
            .a(six).b(seven).d(one).c(min_twenty)
        )
        self.append_gate(
            Constraint()
            .mult(1).left(1).right(1).constant(127).output(1)
            .a(min_twenty).b(six).c(seven)
        )

    # -- witnesses ---------------------------------------------------------------

    def append_witness(self, value) -> Witness:
        if isinstance(value, Witness):
            raise TypeError("append_witness takes a value, not a Witness")
        v = int(value) % R
        idx = len(self.witnesses)
        self.witnesses.append(v)
        if self.record_layout:
            self.perm.witness_map.setdefault(idx, [])
        w = Witness(idx)
        if self.runtime.listeners:
            self.runtime.event(RuntimeEvent.witness_appended(w, v))
        return w

    def witness_value(self, w: Witness) -> int:
        return self.witnesses[w.index]

    def __getitem__(self, w: Witness) -> int:
        return self.witnesses[w.index]

    # -- gates -------------------------------------------------------------------

    def constraints(self) -> int:
        return len(self.wires["a"])

    def append_custom_gate(self, constraint: Constraint):
        if self.runtime.listeners:
            # builders are move-semantics (mutable): hand listeners a snapshot
            self.runtime.event(
                RuntimeEvent.constraint_appended(constraint.copy()))
        self._append_custom_gate_internal(constraint)

    def _append_custom_gate_internal(self, constraint: Constraint):
        n = len(self.wires["a"])
        coeffs = constraint.coeffs
        ws = constraint.witnesses
        a, b, c, d = ws[0].index, ws[1].index, ws[2].index, ws[3].index
        wires = self.wires
        wires["a"].append(a)
        wires["b"].append(b)
        wires["c"].append(c)
        wires["d"].append(d)
        if constraint.has_public_input:
            self.public_inputs[n] = coeffs.get("pi", 0)
        if not self.record_layout:
            return
        sel = self.sel
        for name in SELECTOR_NAMES:
            sel[name].append(coeffs.get(name, 0))
        wm = self.perm.witness_map
        wm[a].append((0, n))
        wm[b].append((1, n))
        wm[c].append((2, n))
        wm[d].append((3, n))

    def append_gate(self, constraint: Constraint):
        """Arithmetic gate: q_M a b + q_L a + q_R b + q_O c + q_F d + q_C + PI = 0."""
        self.append_custom_gate(Constraint.arithmetic(constraint))

    def append_evaluated_output(self, s: Constraint) -> Witness | None:
        """Solve the arithmetic identity for c, allocate it, append the gate
        (the soundness boundary; composer.rs:304-356).

        `s` must already carry the arithmetic tag (gate_add/gate_mul set it);
        the gate is appended directly without re-tagging."""
        wits = self.witnesses
        sc = s.coeffs
        g = sc.get
        a = wits[s.witnesses[0].index]
        b = wits[s.witnesses[1].index]
        d = wits[s.witnesses[3].index]
        x = (
            g("q_m", 0) * a * b + g("q_l", 0) * a + g("q_r", 0) * b
            + g("q_f", 0) * d + g("q_c", 0) + g("pi", 0)
        ) % R
        y = g("q_o", 0)
        if y == 0:
            self.append_custom_gate(s)
            return None
        c = (-x) * pow(y, -1, R) % R
        output = self.append_witness(c)
        self.append_custom_gate(s.c(output))
        return output

    def append_constant(self, constant) -> Witness:
        w = self.append_witness(constant)
        self.assert_equal_constant(w, constant, None)
        return w

    def append_public(self, public) -> Witness:
        v = int(public) % R
        w = self.append_witness(v)
        self.append_gate(Constraint().left(R - 1).a(w).public(v))
        return w

    def assert_equal(self, a: Witness, b: Witness):
        self.append_gate(Constraint().left(1).right(R - 1).a(a).b(b))

    def assert_equal_constant(self, a: Witness, constant, public):
        c = Constraint().left(R - 1).a(a).constant(constant)
        if public is not None:
            c = c.public(public)
        self.append_gate(c)

    def gate_add(self, s: Constraint) -> Witness:
        s = Constraint.arithmetic(s)
        s.coeffs["q_o"] = R - 1  # fresh copy from arithmetic(): safe to set
        return self.append_evaluated_output(s)

    def gate_mul(self, s: Constraint) -> Witness:
        s = Constraint.arithmetic(s)
        s.coeffs["q_o"] = R - 1
        return self.append_evaluated_output(s)

    # -- PI helpers (composer.rs:462-491) -----------------------------------------

    def public_input_indexes(self) -> list[int]:
        return sorted(self.public_inputs.keys())

    def public_input_values(self) -> list[int]:
        return [self.public_inputs[i] for i in self.public_input_indexes()]

    @staticmethod
    def dense_public_inputs(indexes, values, size) -> list[int]:
        dense = [0] * size
        for i, v in zip(indexes, values):
            dense[i] = v
        return dense

    # -- column export ------------------------------------------------------------

    def selector_columns(self, n: int) -> dict[str, list[int]]:
        """Selector columns zero-padded to n rows."""
        m = self.constraints()
        assert n >= m
        return {
            name: col + [0] * (n - m) for name, col in self.sel.items()
        }

    def wire_columns(self, n: int) -> np.ndarray:
        """(4, n) int32 wire index matrix, padded with witness 0."""
        m = self.constraints()
        out = np.zeros((4, n), dtype=np.int32)
        for i, k in enumerate("abcd"):
            out[i, :m] = self.wires[k]
        return out

    # -- prove-time re-execution (composer.rs:439-460) ------------------------------

    @staticmethod
    def prove(constraints: int, circuit) -> "Composer":
        from ..utils.errors import InvalidCircuitSize
        from ..config import get_config

        composer = Composer.initialized()
        # fast witness-only mode unless the debugger needs full layout data
        if composer.debugger is None and not get_config().debug:
            composer.record_layout = False
        circuit.circuit(composer)
        if composer.constraints() != constraints:
            raise InvalidCircuitSize(composer.constraints(), constraints)
        composer.runtime.event(RuntimeEvent.proof_finished())
        return composer


class Circuit:
    """User circuits implement `circuit(composer)`; reference circuit.rs:16-46."""

    def circuit(self, composer: Composer):
        raise NotImplementedError

    def size(self) -> int:
        c = Composer.initialized()
        self.circuit(c)
        return c.constraints()

    def compress(self) -> bytes:
        from .compress import compress_circuit

        return compress_circuit(type(self))
