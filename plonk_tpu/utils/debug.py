"""Gate-identity debugger: re-evaluates every gate-family identity per row.

Counterpart of /root/reference/src/debugger.rs:31-190 — the reference's
`debug` feature evaluates 17 named identity families per row (with cyclic
shifted-wire reads) and reports the first unsatisfied constraint.  Here the
checker doubles as the test oracle for gadget construction: it validates a
witness assignment against the full PLONK identity system in milliseconds,
without proving.
"""

from __future__ import annotations

from ..field import params
from ..proof_system.widgets import delta, delta_xor_and

R = params.R_MOD
EDWARDS_D = params.JUBJUB_D


def _next_pow2(x: int) -> int:
    return 1 << max(0, x - 1).bit_length() if x > 1 else 1


def evaluate_gate_identities(composer) -> list[tuple[int, str, int]]:
    """Return [(row, family, value)] for every unsatisfied gate identity."""
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
        a, b, c, d = (wire(k, i) for k in range(4))
        ni = (i + 1) % n
        a_w, b_w, d_w = wire(0, ni), wire(1, ni), wire(3, ni)
        pi = pis.get(i, 0)

        # arithmetic (+ public input)
        v = (
            sel["q_arith"][i]
            * (
                sel["q_m"][i] * a * b + sel["q_l"][i] * a + sel["q_r"][i] * b
                + sel["q_o"][i] * c + sel["q_f"][i] * d + sel["q_c"][i]
            )
            + pi
        ) % R
        if v:
            failures.append((i, "arithmetic", v))

        if sel["q_range"][i]:
            v = (
                delta((c - 4 * d) % R) + delta((b - 4 * c) % R)
                + delta((a - 4 * b) % R) + delta((d_w - 4 * a) % R)
            ) % R * sel["q_range"][i] % R
            if v:
                failures.append((i, "range", v))

        if sel["q_logic"][i]:
            la = (a_w - 4 * a) % R
            lb = (b_w - 4 * b) % R
            ld = (d_w - 4 * d) % R
            v = (
                delta(la) + delta(lb) + delta(ld)
                + (c - la * lb) % R
                + delta_xor_and(la, lb, c, ld, sel["q_c"][i])
            ) % R * sel["q_logic"][i] % R
            if v:
                failures.append((i, "logic", v))

        if sel["q_fixed_group_add"][i]:
            x_beta, y_beta = sel["q_l"][i], sel["q_r"][i]
            bit = (d_w - 2 * d) % R
            bit_cons = bit * (bit - 1) % R * (bit + 1) % R
            y_alpha = (bit * bit % R * (y_beta - 1) + 1) % R
            x_alpha = bit * x_beta % R
            xy_cons = (bit * sel["q_c"][i] - c) % R
            dxy = c * a % R * b % R * EDWARDS_D % R
            x_acc = (a_w + a_w * dxy - (a * y_alpha + b * x_alpha)) % R
            y_acc = (b_w - b_w * dxy - (b * y_alpha + a * x_alpha)) % R
            v = (bit_cons + xy_cons + x_acc + y_acc) % R
            if v:
                failures.append((i, "fixed_base", v))

        if sel["q_variable_group_add"][i]:
            x1, y1, x2, y2 = a, b, c, d
            x3, y3, x1y2 = a_w, b_w, d_w
            xy_cons = (x1 * y2 - x1y2) % R
            y1x2 = y1 * x2 % R
            dterm = EDWARDS_D * x1y2 % R * y1x2 % R
            x3_c = (x1y2 + y1x2 - (x3 + x3 * dterm)) % R
            y3_c = (y1 * y2 + x1 * x2 - (y3 - y3 * dterm)) % R
            v = (xy_cons + x3_c + y3_c) % R
            if v:
                failures.append((i, "variable_base", v))

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
