"""Gate-identity debugger: re-evaluates every gate identity per row.

Counterpart of /root/reference/src/debugger.rs:31-190 — evaluates the
reference's 17 NAMED identities per row (IDENTITY_FAMILIES, debugger.rs:31-49,
formulas :120-179), each independently (no summing across sub-identities —
cancellation must not mask a failure), with cyclic shifted-wire reads.  The
checker doubles as the test oracle for gadget construction: it validates a
witness assignment against the full PLONK identity system in milliseconds,
without proving.
"""

from __future__ import annotations

from . import next_pow2 as _next_pow2
from ..field import params
from ..proof_system.widgets import delta, delta_xor_and

R = params.R_MOD
EDWARDS_D = params.JUBJUB_D

# index-aligned with debugger.rs IDENTITY_FAMILIES (31-49)
IDENTITY_FAMILIES = (
    "arithmetic",
    "range delta c/d",
    "range delta b/c",
    "range delta a/b",
    "range accumulator",
    "logic left quad",
    "logic right quad",
    "logic output quad",
    "logic product",
    "logic relation",
    "fixed-base bit consistency",
    "fixed-base xy consistency",
    "fixed-base x accumulator",
    "fixed-base y accumulator",
    "variable-base xy consistency",
    "variable-base x accumulator",
    "variable-base y accumulator",
)


def _identity_evaluations(sel, pis, wire, i, n) -> list[int]:
    """The 17 identity values for row i (debugger.rs:93-179)."""
    a, b, c, d = (wire(k, i) for k in range(4))
    ni = (i + 1) % n
    a_w, b_w, d_w = wire(0, ni), wire(1, ni), wire(3, ni)
    pi = pis.get(i, 0)

    qm, ql, qr = sel["q_m"][i], sel["q_l"][i], sel["q_r"][i]
    qo, qf, qc = sel["q_o"][i], sel["q_f"][i], sel["q_c"][i]
    qarith = sel["q_arith"][i]
    qrange = sel["q_range"][i]
    qlogic = sel["q_logic"][i]
    qfixed = sel["q_fixed_group_add"][i]
    qvar = sel["q_variable_group_add"][i]

    out = [0] * 17
    out[0] = ((qm * a * b + ql * a + qr * b + qo * c + qf * d + qc)
              * qarith + pi) % R

    if qrange:
        out[1] = delta((c - 4 * d) % R) * qrange % R
        out[2] = delta((b - 4 * c) % R) * qrange % R
        out[3] = delta((a - 4 * b) % R) * qrange % R
        out[4] = delta((d_w - 4 * a) % R) * qrange % R

    if qlogic:
        la = (a_w - 4 * a) % R
        lb = (b_w - 4 * b) % R
        ld = (d_w - 4 * d) % R
        out[5] = delta(la) * qlogic % R
        out[6] = delta(lb) * qlogic % R
        out[7] = delta(ld) * qlogic % R
        out[8] = (c - la * lb) % R * qlogic % R
        out[9] = delta_xor_and(la, lb, c, ld, qc) * qlogic % R

    if qfixed:
        bit = (d_w - 2 * d) % R
        y_alpha = (bit * bit % R * (qr - 1) + 1) % R
        x_alpha = ql * bit % R
        dxy = c * a % R * b % R * EDWARDS_D % R
        out[10] = bit * (bit - 1) % R * (bit + 1) % R * qfixed % R
        out[11] = (bit * qc - c) % R * qfixed % R
        out[12] = (a_w + a_w * dxy - (a * y_alpha + b * x_alpha)) % R * qfixed % R
        out[13] = (b_w - b_w * dxy - (b * y_alpha + a * x_alpha)) % R * qfixed % R

    if qvar:
        x1, y1, x2, y2 = a, b, c, d
        x3, y3, x1y2 = a_w, b_w, d_w
        y1x2 = y1 * x2 % R
        dterm = EDWARDS_D * x1y2 % R * y1x2 % R
        out[14] = (x1 * y2 - x1y2) % R * qvar % R
        out[15] = (x1y2 + y1x2 - (x3 + x3 * dterm)) % R * qvar % R
        out[16] = (y1 * y2 + x1 * x2 - (y3 - y3 * dterm)) % R * qvar % R

    return out


def evaluate_gate_identities(composer) -> list[tuple[int, str, int]]:
    """Return [(row, identity_name, value)] for every unsatisfied identity,
    named per the reference's 17 IDENTITY_FAMILIES."""
    m = composer.constraints()
    n = _next_pow2(m)
    sel = composer.selector_columns(n)
    wires = composer.wire_columns(n)
    w = composer.witnesses
    pis = dict(composer.public_inputs)

    def wire(col, row):
        return w[wires[col][row]] if row < m else 0

    failures = []
    for i in range(n):
        vals = _identity_evaluations(sel, pis, wire, i, n)
        for k, v in enumerate(vals):
            if v:
                failures.append((i, IDENTITY_FAMILIES[k], v))
    return failures


def explain_failures(composer, failures, limit: int = 5) -> str:
    lines = [
        f"{len(failures)} of {composer.constraints()} constraints unsatisfied"
    ]
    for row, family, value in failures[:limit]:
        lines.append(
            f"  constraint {row} fails the `{family}` identity "
            f"(value {hex(value)})"
        )
    return "\n".join(lines)


class Debugger:
    """Source-attributing debugger (reference debugger.rs:245-363).

    Attach to a composer's runtime (automatic when PlonkConfig.debug is on):
    records the user-code call site of every witness and constraint, evaluates
    the gate-identity system on demand, and dumps a JSON circuit trace (the
    dusk-cdf analog) to PlonkConfig.trace_output on proof completion.
    """

    def __init__(self, composer):
        self.composer = composer
        self.witness_sites: list[str] = []
        self.constraint_sites: list[str] = []
        composer.runtime.attach(self._on_event)

    @staticmethod
    def _call_site() -> str:
        import traceback

        pkg = __file__.rsplit("/", 2)[0]  # .../plonk_tpu
        for frame in reversed(traceback.extract_stack(limit=32)):
            if not frame.filename.startswith(pkg):
                return f"{frame.filename}:{frame.lineno}"
        return "<unknown>"

    def _on_event(self, ev):
        if ev.kind == "witness_appended":
            self.witness_sites.append(self._call_site())
        elif ev.kind == "constraint_appended":
            self.constraint_sites.append(self._call_site())
        elif ev.kind == "proof_finished":
            from ..config import get_config

            path = get_config().trace_output
            if path:
                self.write_trace(path)

    def report(self, limit: int = 5) -> str:
        """The reference's failure message: first unsatisfied constraint with
        its identity family and source location (debugger.rs:221-242)."""
        failures = evaluate_gate_identities(self.composer)
        if not failures:
            return "all gate identities satisfied"
        base = len(self.constraint_sites) - self.composer.constraints()
        lines = [
            f"{len(failures)} of {self.composer.constraints()} constraints "
            "are unsatisfied"
        ]
        for row, family, value in failures[:limit]:
            site = (self.constraint_sites[base + row]
                    if 0 <= base + row < len(self.constraint_sites)
                    else "<unknown>")
            lines.append(
                f"  constraint {row} fails the `{family}` identity and was "
                f"appended at {site}")
        return "\n".join(lines)

    def write_trace(self, path: str):
        """JSON circuit trace — the CDF (Circuit Description Format) analog:
        config, witnesses (+ sites), gates (selectors, wires, PI, sites)."""
        import json

        c = self.composer
        m = c.constraints()
        gates = []
        for row in range(m):
            gates.append({
                "selectors": {
                    name: hex(c.sel[name][row]) for name in c.sel
                    if c.sel[name][row]
                },
                "wires": [c.wires[k][row] for k in "abcd"],
                "public_input": (hex(c.public_inputs[row])
                                 if row in c.public_inputs else None),
                "site": (self.constraint_sites[row]
                         if row < len(self.constraint_sites) else None),
            })
        doc = {
            "format": "plonk-tpu-trace-v1",
            "constraints": m,
            "witnesses": [
                {"value": hex(v),
                 "site": (self.witness_sites[i]
                          if i < len(self.witness_sites) else None)}
                for i, v in enumerate(c.witnesses)
            ],
            "gates": gates,
        }
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
