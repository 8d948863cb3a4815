"""Serde malleability tier: malformed bytes must be rejected, not absorbed.

Mirrors the reference's deserialization fuzz-style tests — Prover bytes
(prover.rs:645-841), ProverKey (widget.rs:714-777), OpeningKey point
validation (tests/opening_key_validation.rs), CommitKey (key.rs:902-931) and
Proof scalar canonicality.
"""

import pytest

from plonk_tpu.curve import G1, G2
from plonk_tpu.field import params
from plonk_tpu.kzg import PublicParameters, OpeningKey, Commitment, CommitKey
from plonk_tpu.proof_system.keys import VerifierKey
from plonk_tpu.proof_system.proof import Proof
from plonk_tpu.proof_system.widgets import ProofEvaluations

R = params.R_MOD
P = params.P_MOD


@pytest.fixture(scope="module")
def pp():
    return PublicParameters.setup(8, secret=0x51DE, device=False)


# -- G1/G2 point encodings -------------------------------------------------

def test_g1_compressed_rejects_malformed():
    # non-canonical x >= p
    bad = bytearray(G1.generator().to_compressed())
    bad[0] |= 0x1F
    bad[1] = 0xFF
    with pytest.raises(ValueError):
        G1.from_compressed(bytes(bad))
    # infinity with stray bits
    with pytest.raises(ValueError):
        G1.from_compressed(bytes([0xC0] + [1] + [0] * 46))
    # missing compression flag
    with pytest.raises(ValueError):
        G1.from_compressed(bytes(48))


def test_g1_roundtrip():
    g = G1.generator().mul(123456789)
    assert G1.from_compressed(g.to_compressed()) == g
    assert G1.from_uncompressed(g.to_uncompressed()) == g
    ident = G1.identity()
    assert G1.from_compressed(ident.to_compressed()) == ident


# -- OpeningKey (tests/opening_key_validation.rs) -----------------------------

def test_opening_key_rejects_malformed_points(pp):
    ok = pp.opening_key
    good = ok.to_bytes()
    assert len(good) == OpeningKey.SIZE
    restored = OpeningKey.from_bytes(good)
    assert restored.g == ok.g and restored.h == ok.h and restored.x_h == ok.x_h
    # corrupt the G1 part
    bad = bytearray(good)
    bad[3] ^= 0xFF
    with pytest.raises(Exception):
        OpeningKey.from_bytes(bytes(bad))
    # corrupt the G2 part
    bad = bytearray(good)
    bad[48 + 5] ^= 0xFF
    with pytest.raises(Exception):
        OpeningKey.from_bytes(bytes(bad))
    # identity points must be rejected outright
    with pytest.raises(ValueError):
        OpeningKey(G1.identity(), G2.generator(), G2.generator())


# -- VerifierKey --------------------------------------------------------------

def _tiny_verifier_key(pp):
    from plonk_tpu.proof_system.keys import VK_SERDE_ORDER

    g = G1.generator()
    comms = {name: Commitment(g.mul(i + 2))
             for i, name in enumerate(VK_SERDE_ORDER)}
    return VerifierKey(10, comms)


def test_verifier_key_roundtrip_and_corruption(pp):
    vk = _tiny_verifier_key(pp)
    data = vk.to_bytes()
    assert VerifierKey.from_bytes(data) == vk
    bad = bytearray(data)
    bad[9] ^= 0x01  # inside the first commitment
    with pytest.raises(Exception):
        VerifierKey.from_bytes(bytes(bad))


# -- CommitKey ----------------------------------------------------------------

def test_commit_key_raw_vs_checked(pp):
    ck = pp.commit_key
    raw = ck.to_raw_var_bytes()
    assert CommitKey.from_raw_var_bytes(raw).powers_of_g == ck.powers_of_g
    checked = ck.to_var_bytes()
    assert CommitKey.from_var_bytes(checked).powers_of_g == ck.powers_of_g
    # corrupt a checked (compressed) point -> rejected
    bad = bytearray(checked)
    bad[12] ^= 0xFF
    with pytest.raises(Exception):
        CommitKey.from_var_bytes(bytes(bad))


# -- Proof / evaluations --------------------------------------------------------

def test_proof_rejects_noncanonical_scalar():
    proof = Proof()
    data = bytearray(proof.to_bytes())
    # overwrite the first evaluation with r (non-canonical)
    data[11 * 48 : 11 * 48 + 32] = R.to_bytes(32, "little")
    with pytest.raises(ValueError):
        Proof.from_bytes(bytes(data))


def test_proof_rejects_wrong_length():
    with pytest.raises(ValueError):
        Proof.from_bytes(b"\x00" * (Proof.SIZE - 1))


def test_proof_evaluations_roundtrip():
    ev = ProofEvaluations(a_eval=1, z_eval=R - 1, q_c_eval=12345)
    assert ProofEvaluations.from_bytes(ev.to_bytes()) == ev


# -- PublicParameters -----------------------------------------------------------

def test_public_parameters_checked_and_unchecked(pp):
    data = pp.to_var_bytes()
    back = PublicParameters.from_slice(data)
    assert back.commit_key.powers_of_g == pp.commit_key.powers_of_g
    raw = pp.to_raw_var_bytes()
    back2 = PublicParameters.from_slice_unchecked(raw)
    assert back2.commit_key.powers_of_g == pp.commit_key.powers_of_g
