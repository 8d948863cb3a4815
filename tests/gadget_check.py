"""Shared test helpers for the gadget matrices.

`check_all_identities` is the cheap host-side tier (no proving).  The
check_satisfied / check_unsatisfied helpers mirror the reference's
integration-test harness (/root/reference/tests/common/mod.rs:14-80):
satisfied circuits must prove AND verify with the expected public inputs;
unsatisfied circuits must fail proving with exactly CircuitUnsatisfied.
"""

import random

import pytest

from plonk_tpu.utils.debug import evaluate_gate_identities, explain_failures
from plonk_tpu.utils.errors import CircuitUnsatisfied
from plonk_tpu.field import params

R = params.R_MOD


def check_all_identities(composer):
    failures = evaluate_gate_identities(composer)
    assert not failures, explain_failures(composer, failures)


def rand_scalar(rng):
    return rng.randrange(R)


def check_satisfied(prover, verifier, pi_expected, circuit, msg=""):
    """Reference check_satisfied_circuit (common/mod.rs:14-32)."""
    proof, pi_circuit = prover.prove(circuit, rng=random.Random(0xC0FFEE))
    assert [v % R for v in pi_expected] == list(pi_circuit), msg
    verifier.verify(proof, list(pi_circuit))


def check_satisfied_fails(prover, verifier, pi_expected, circuit, msg=""):
    """Reference check_satisfied_circuit_fails: proof builds, but verifying
    against the expected PI must fail (common/mod.rs:36-58)."""
    proof, _pi_circuit = prover.prove(circuit, rng=random.Random(0xC0FFEE))
    try:
        verifier.verify(proof, [v % R for v in pi_expected])
    except Exception:
        return
    pytest.fail(msg or "verification should have failed")


def check_unsatisfied(prover, circuit, msg=""):
    """Reference check_unsatisfied_circuit (common/mod.rs:62-80): proving must
    die with exactly CircuitUnsatisfied."""
    with pytest.raises(CircuitUnsatisfied):
        prover.prove(circuit, rng=random.Random(0xC0FFEE))
