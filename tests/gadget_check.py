"""Shared test helper: assert all gate identities are satisfied row by row."""

from plonk_tpu.utils.debug import evaluate_gate_identities, explain_failures


def check_all_identities(composer):
    failures = evaluate_gate_identities(composer)
    assert not failures, explain_failures(composer, failures)
