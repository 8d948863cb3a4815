"""KZG opening proofs: single, aggregate, and transcript-bound batch check.

Counterpart of /root/reference/src/commitment_scheme/kzg10/proof.rs
(Proof/AggregateProof, `flatten`) and key.rs:499-545 (`batch_check` with the
`kzg10-batch-check-v1` challenge binding).  These are the free-standing KZG
entry points a consumer of the commitment scheme uses outside the PLONK
protocol; the PLONK prover inlines the same math (compiler/__init__.py round 5).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..curve import G1, Fp12, multi_pairing, multi_pairing_is_one
from ..field import params
from ..utils.errors import ProofVerificationError
from .srs import Commitment

R = params.R_MOD


@dataclass
class KzgProof:
    """Single-point opening proof (kzg10/proof.rs:15-23)."""

    commitment_to_witness: Commitment
    evaluated_point: int
    commitment_to_polynomial: Commitment


@dataclass
class AggregateProof:
    """Openings of many polynomials at ONE point, flattened with v-powers
    (kzg10/proof.rs:39-110)."""

    commitment_to_witness: Commitment
    evaluated_points: list[int] = field(default_factory=list)
    commitments_to_polynomials: list[Commitment] = field(default_factory=list)

    @staticmethod
    def with_witness(witness: Commitment) -> "AggregateProof":
        return AggregateProof(witness)

    def add_part(self, evaluation: int, commitment: Commitment):
        self.evaluated_points.append(evaluation % R)
        self.commitments_to_polynomials.append(commitment)

    def flatten(self, v_challenge: int) -> KzgProof:
        from ..native import g1_msm_small

        powers = [pow(v_challenge, i, R)
                  for i in range(len(self.commitments_to_polynomials))]
        pts = [c.point for c in self.commitments_to_polynomials]
        flat_comm = g1_msm_small(pts, powers)
        if flat_comm is None:
            flat_comm = G1.identity()
            for p, v in zip(pts, powers):
                flat_comm = flat_comm + p.mul(v)
        flat_eval = sum(e * v % R for e, v in
                        zip(self.evaluated_points, powers)) % R
        return KzgProof(self.commitment_to_witness, flat_eval,
                        Commitment(flat_comm))


def _batch_challenge(transcript, points: list[int],
                     proofs: list[KzgProof]) -> int:
    """Transcript binding of the complete batch (key.rs:409-429)."""
    transcript.append_message(b"dom-sep", b"kzg10-batch-check-v1")
    transcript.append_u64(b"batch-len", len(proofs))
    for point, proof in zip(points, proofs):
        transcript.append_scalar(b"batch-point", point)
        transcript.append_commitment(
            b"batch-polynomial-commitment", proof.commitment_to_polynomial)
        transcript.append_scalar(b"batch-evaluation", proof.evaluated_point)
        transcript.append_commitment(
            b"batch-witness-commitment", proof.commitment_to_witness)
    return transcript.challenge_scalar(b"batch-challenge")


def batch_check(opening_key, points: list[int], proofs: list[KzgProof],
                transcript):
    """Verify many openings with ONE 2-pairing check (key.rs:499-545).

    Raises ProofVerificationError on failure.
    """
    if not proofs or len(points) != len(proofs):
        raise ProofVerificationError("empty or mismatched batch")
    u = _batch_challenge(transcript, points, proofs)
    powers = [pow(u, i, R) for i in range(len(proofs))]

    total_c = G1.identity()
    total_w = G1.identity()
    g_multiplier = 0
    for proof, ui, point in zip(proofs, powers, points):
        c = proof.commitment_to_polynomial.point + \
            proof.commitment_to_witness.point.mul(point % R)
        g_multiplier = (g_multiplier + ui * proof.evaluated_point) % R
        total_c = total_c + c.mul(ui)
        total_w = total_w + proof.commitment_to_witness.point.mul(ui)
    total_c = total_c + (-opening_key.g.mul(g_multiplier))

    ok = multi_pairing_is_one([
        (-total_w, opening_key.x_h),
        (total_c, opening_key.h),
    ])
    if not ok:
        raise ProofVerificationError("batched pairing check failed")


def open_single(commit_key, coeffs_mont, value: int, z: int) -> KzgProof:
    """Prove p(z) = value: commit the Ruffini quotient (test-only helper in
    the reference, key.rs:548+; a public entry point here)."""
    from . import poly as poly_ops

    quot, _ = poly_ops.ruffini(coeffs_mont, z)
    return KzgProof(
        commitment_to_witness=commit_key.commit_dev(quot),
        evaluated_point=value % R,
        commitment_to_polynomial=commit_key.commit_dev(coeffs_mont),
    )
