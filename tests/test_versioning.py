"""PlonkVersion semantics (reference tests/plonk_versioning.rs:29-91).

V2 and V3 proofs must not cross-verify (different transcript seeding: legacy
`base` puts s_sigma_1 in the s_sigma_4 slot, widget.rs:211-258); V1 proving is
always unsupported; V2 proving is gated behind config.legacy_proving.
"""

import dataclasses

import pytest

from plonk_tpu import Constraint, Circuit, PublicParameters
from plonk_tpu.compiler import Compiler, PlonkVersion
from plonk_tpu.config import get_config, set_config
from plonk_tpu.utils.errors import (
    UnsupportedProvingVersion, LegacyProvingDisabled, ProofVerificationError,
)


class MulCircuit(Circuit):
    def circuit(self, composer):
        a = composer.append_witness(3)
        b = composer.append_witness(4)
        expected = composer.append_witness(12)
        out = composer.gate_mul(Constraint().mult(1).a(a).b(b))
        composer.assert_equal(out, expected)


@pytest.fixture(scope="module")
def compiled():
    pp = PublicParameters.setup(64, secret=0xC0FFEE, device=False)
    return Compiler.compile_with_circuit(pp, b"versioned", MulCircuit())


@pytest.fixture
def legacy_enabled():
    old = get_config()
    set_config(dataclasses.replace(old, legacy_proving=True))
    yield
    set_config(old)


def test_current_version_is_v3():
    assert PlonkVersion.current() == PlonkVersion.V3


def test_v1_proving_unsupported(compiled):
    prover, _ = compiled
    with pytest.raises(UnsupportedProvingVersion):
        prover.prove(MulCircuit(), version=PlonkVersion.V1)


def test_v2_proving_gated_behind_config(compiled):
    prover, _ = compiled
    assert not get_config().legacy_proving
    with pytest.raises(LegacyProvingDisabled):
        prover.prove(MulCircuit(), version=PlonkVersion.V2)


def test_v2_and_v3_proofs_not_cross_compatible(compiled, legacy_enabled):
    prover, verifier = compiled

    proof_v2, pi_v2 = prover.prove(MulCircuit(), version=PlonkVersion.V2)
    verifier.verify(proof_v2, pi_v2, version=PlonkVersion.V2)
    with pytest.raises(ProofVerificationError):
        verifier.verify(proof_v2, pi_v2, version=PlonkVersion.V3)

    proof_v3, pi_v3 = prover.prove(MulCircuit(), version=PlonkVersion.V3)
    verifier.verify(proof_v3, pi_v3, version=PlonkVersion.V3)
    with pytest.raises(ProofVerificationError):
        verifier.verify(proof_v3, pi_v3, version=PlonkVersion.V2)


def test_v1_verification_uses_legacy_batching(compiled, legacy_enabled):
    """A V2 proof (12-poly batching) must NOT pass the V1 verifier (7-poly,
    pre-CVE): the legacy [F]/[E] combination differs."""
    prover, verifier = compiled
    proof_v2, pi_v2 = prover.prove(MulCircuit(), version=PlonkVersion.V2)
    with pytest.raises(ProofVerificationError):
        verifier.verify(proof_v2, pi_v2, version=PlonkVersion.V1)


def test_config_json_roundtrip(tmp_path):
    from plonk_tpu.config import PlonkConfig

    cfg = PlonkConfig(legacy_proving=True, msm_window_bits=9)
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    assert PlonkConfig.from_json(path) == cfg
    with pytest.raises(ValueError):
        import json

        with open(path) as f:
            data = json.load(f)
        data["bogus"] = 1
        with open(path, "w") as f:
            json.dump(data, f)
        PlonkConfig.from_json(path)
