"""Constraint: the width-4 gate descriptor (selector coefficients + wires).

API parity with /root/reference/src/composer/constraint_system/constraint.rs:
12 selector slots (7 user-facing + 5 internal gate-family selectors), 4 wired
witnesses, and the sparse public-input flag.  Values are Python ints mod r —
graph building is host work; the columns are packed to device tensors once at
preprocess/prove time.
"""

from __future__ import annotations

from ..field import params

R = params.R_MOD

# selector slot names, in gate-column order (PI handled sparsely)
SELECTOR_NAMES = (
    "q_m", "q_l", "q_r", "q_o", "q_f", "q_c",
    "q_arith", "q_range", "q_logic", "q_fixed_group_add",
    "q_variable_group_add",
)


class Witness:
    """Opaque handle to an allocated witness (index into the composer)."""

    __slots__ = ("index",)

    def __init__(self, index: int):
        self.index = index

    def __eq__(self, o):
        return isinstance(o, Witness) and self.index == o.index

    def __hash__(self):
        return hash(self.index)

    def __repr__(self):
        return f"Witness({self.index})"


ZERO_W = Witness(0)
ONE_W = Witness(1)


class Constraint:
    """Builder for one gate row: q_M a b + q_L a + q_R b + q_O c + q_F d + q_C + PI = 0."""

    __slots__ = ("coeffs", "witnesses", "has_public_input")

    def __init__(self):
        self.coeffs = {}  # name -> int (implicit zero)
        self.witnesses = [ZERO_W, ZERO_W, ZERO_W, ZERO_W]
        self.has_public_input = False

    def _set(self, name: str, v) -> "Constraint":
        # Mutate-and-return-self: the reference's builder methods take `self`
        # BY VALUE (`fn mult(mut self, ..) -> Self`, constraint.rs:83-130), so
        # the source object is moved — chained use is identical, and branching
        # a builder requires an explicit .copy() here exactly as .clone() there.
        self.coeffs[name] = int(v) % R
        return self

    def copy(self) -> "Constraint":
        c = Constraint.__new__(Constraint)
        c.coeffs = dict(self.coeffs)
        c.witnesses = list(self.witnesses)
        c.has_public_input = self.has_public_input
        return c

    # -- user-facing selectors -------------------------------------------------
    def mult(self, v):
        return self._set("q_m", v)

    def left(self, v):
        return self._set("q_l", v)

    def right(self, v):
        return self._set("q_r", v)

    def output(self, v):
        return self._set("q_o", v)

    def fourth(self, v):
        return self._set("q_f", v)

    def constant(self, v):
        return self._set("q_c", v)

    def public(self, v):
        self.coeffs["pi"] = int(v) % R
        self.has_public_input = True
        return self

    # -- wires (move semantics, see _set) ----------------------------------------
    def a(self, w: Witness):
        self.witnesses[0] = w
        return self

    def b(self, w: Witness):
        self.witnesses[1] = w
        return self

    def c(self, w: Witness):
        self.witnesses[2] = w
        return self

    def d(self, w: Witness):
        self.witnesses[3] = w
        return self

    def coeff(self, name: str) -> int:
        return self.coeffs.get(name, 0)

    # -- internal gate-family taggers (reference constraint.rs:203-229) ----------

    def _external_only(self) -> "Constraint":
        c = Constraint()
        for name in ("q_m", "q_l", "q_r", "q_o", "q_f", "q_c", "pi"):
            if name in self.coeffs:
                c.coeffs[name] = self.coeffs[name]
        c.witnesses = list(self.witnesses)
        c.has_public_input = self.has_public_input
        return c

    @staticmethod
    def arithmetic(s: "Constraint") -> "Constraint":
        c = s._external_only()
        c.coeffs["q_arith"] = 1
        return c

    @staticmethod
    def range(s: "Constraint") -> "Constraint":
        c = s._external_only()
        c.coeffs["q_range"] = 1
        return c

    @staticmethod
    def logic(s: "Constraint") -> "Constraint":
        c = s._external_only()
        c.coeffs["q_c"] = 1
        c.coeffs["q_logic"] = 1
        return c

    @staticmethod
    def logic_xor(s: "Constraint") -> "Constraint":
        c = s._external_only()
        c.coeffs["q_c"] = R - 1
        c.coeffs["q_logic"] = R - 1
        return c

    @staticmethod
    def group_add_fixed_base(s: "Constraint") -> "Constraint":
        c = s._external_only()
        c.coeffs["q_fixed_group_add"] = 1
        return c

    @staticmethod
    def group_add_variable_base(s: "Constraint") -> "Constraint":
        c = s._external_only()
        c.coeffs["q_variable_group_add"] = 1
        return c
