"""Proof object + host-side verification.

Counterpart of /root/reference/src/proof_system/proof.rs: 11 commitments + 15
evaluations (1008 bytes fixed), transcript replay, the [D]/[F]/[E] batched
opening combination (V_MAX_DEGREE = 11, selector evals bound post-CVE), and the
final 2-pairing check.  Verification is circuit-size independent host work.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..field import params
from ..curve import G1, Fp12, multi_pairing, multi_pairing_is_one
from ..kzg import Commitment
from ..utils import next_pow2 as _next_pow2
from ..utils.errors import ProofVerificationError
from . import widgets
from .widgets import ProofEvaluations

R = params.R_MOD

V_MAX_DEGREE = 11        # r, a, b, c, d, sigma1-3, q_arith, q_c, q_l, q_r
V_MAX_DEGREE_LEGACY = 7  # without the four selector polys

COMMITMENT_ORDER = (
    "a_comm", "b_comm", "c_comm", "d_comm", "z_comm",
    "t_low_comm", "t_mid_comm", "t_high_comm", "t_fourth_comm",
    "w_z_chall_comm", "w_z_chall_w_comm",
)


@dataclass
class Proof:
    a_comm: Commitment = field(default_factory=Commitment.identity)
    b_comm: Commitment = field(default_factory=Commitment.identity)
    c_comm: Commitment = field(default_factory=Commitment.identity)
    d_comm: Commitment = field(default_factory=Commitment.identity)
    z_comm: Commitment = field(default_factory=Commitment.identity)
    t_low_comm: Commitment = field(default_factory=Commitment.identity)
    t_mid_comm: Commitment = field(default_factory=Commitment.identity)
    t_high_comm: Commitment = field(default_factory=Commitment.identity)
    t_fourth_comm: Commitment = field(default_factory=Commitment.identity)
    w_z_chall_comm: Commitment = field(default_factory=Commitment.identity)
    w_z_chall_w_comm: Commitment = field(default_factory=Commitment.identity)
    evaluations: ProofEvaluations = field(default_factory=ProofEvaluations)

    SIZE = 11 * 48 + 15 * 32  # 1008 bytes (proof.rs:137-141)

    def to_bytes(self) -> bytes:
        out = b"".join(getattr(self, k).to_bytes() for k in COMMITMENT_ORDER)
        return out + self.evaluations.to_bytes()

    @staticmethod
    def from_bytes(data: bytes) -> "Proof":
        if len(data) != Proof.SIZE:
            raise ValueError(f"proof must be exactly {Proof.SIZE} bytes")
        comms = {}
        for i, name in enumerate(COMMITMENT_ORDER):
            comms[name] = Commitment.from_bytes(data[48 * i : 48 * (i + 1)])
        evals = ProofEvaluations.from_bytes(data[11 * 48 :])
        return Proof(**comms, evaluations=evals)

    # -- verification ----------------------------------------------------------

    def verify_legacy(self, verifier_key, transcript, opening_key,
                      public_input_indexes, pub_inputs):
        """Pre-soundness-fix batching (proof.rs:495-752): selector evaluations
        are NOT bound in the opening at z (V_MAX_DEGREE_LEGACY = 7).  Kept for
        V1 proof verification only."""
        return self.verify(verifier_key, transcript, opening_key,
                           public_input_indexes, pub_inputs, legacy=True)

    def verify(self, verifier_key, transcript, opening_key,
               public_input_indexes, pub_inputs, legacy: bool = False):
        """Reference proof.rs:218-489 (legacy=True: proof.rs:495-752).
        Raises ProofVerificationError."""
        from ..ntt import EvaluationDomain

        ev = self.evaluations
        domain = EvaluationDomain.get(_next_pow2(verifier_key.n))

        t = transcript
        t.append_commitment(b"a_comm", self.a_comm)
        t.append_commitment(b"b_comm", self.b_comm)
        t.append_commitment(b"c_comm", self.c_comm)
        t.append_commitment(b"d_comm", self.d_comm)
        beta = t.challenge_scalar(b"beta")
        t.append_scalar(b"beta", beta)
        gamma = t.challenge_scalar(b"gamma")
        t.append_commitment(b"z_comm", self.z_comm)
        alpha = t.challenge_scalar(b"alpha")
        range_sep = t.challenge_scalar(b"range separation challenge")
        logic_sep = t.challenge_scalar(b"logic separation challenge")
        fixed_sep = t.challenge_scalar(b"fixed base separation challenge")
        var_sep = t.challenge_scalar(b"variable base separation challenge")
        t.append_commitment(b"t_low_comm", self.t_low_comm)
        t.append_commitment(b"t_mid_comm", self.t_mid_comm)
        t.append_commitment(b"t_high_comm", self.t_high_comm)
        t.append_commitment(b"t_fourth_comm", self.t_fourth_comm)
        z_challenge = t.challenge_scalar(b"z_challenge")
        for name in ("a_eval", "b_eval", "c_eval", "d_eval",
                     "s_sigma_1_eval", "s_sigma_2_eval", "s_sigma_3_eval",
                     "z_eval", "a_w_eval", "b_w_eval", "d_w_eval",
                     "q_arith_eval", "q_c_eval", "q_l_eval", "q_r_eval"):
            t.append_scalar(name.encode(), getattr(ev, name))
        v_challenge = t.challenge_scalar(b"v_challenge")
        v_w_challenge = t.challenge_scalar(b"v_w_challenge")
        t.append_commitment(b"w_z_chall_comm", self.w_z_chall_comm)
        t.append_commitment(b"w_z_chall_w_comm", self.w_z_chall_w_comm)
        u_challenge = t.challenge_scalar(b"u_challenge")

        z_h_eval = domain.evaluate_vanishing_polynomial(z_challenge)
        l1_eval = (
            z_h_eval
            * pow(domain.n * (z_challenge - 1) % R, -1, R)
            % R
            if (z_challenge - 1) % R != 0
            else _l1_at_one()
        )

        D_scalars, D_points = self._linearization_msm(
            alpha, beta, gamma, (range_sep, logic_sep, fixed_sep, var_sep),
            z_challenge, u_challenge, l1_eval, verifier_key, domain, z_h_eval,
        )

        pi_eval = compute_barycentric_eval_sparse(
            public_input_indexes, pub_inputs, z_challenge, domain
        )

        r_0 = (
            pi_eval
            - l1_eval * alpha % R * alpha
            - alpha
            * ((ev.a_eval + beta * ev.s_sigma_1_eval + gamma) % R)
            * ((ev.b_eval + beta * ev.s_sigma_2_eval + gamma) % R)
            % R
            * ((ev.c_eval + beta * ev.s_sigma_3_eval + gamma) % R)
            % R
            * ((ev.d_eval + gamma) % R)
            % R
            * ev.z_eval
        ) % R

        # powers of v for [E]/[F] (legacy: 7 unshifted polys, no selector evals)
        vmax = V_MAX_DEGREE_LEGACY if legacy else V_MAX_DEGREE
        v_coeffs = [0] * (vmax + 3)
        v_coeffs[0] = v_challenge
        for i in range(1, vmax):
            v_coeffs[i] = v_coeffs[i - 1] * v_challenge % R
        v_coeffs[vmax] = v_w_challenge * u_challenge % R
        v_coeffs[vmax + 1] = v_coeffs[vmax] * v_w_challenge % R
        v_coeffs[vmax + 2] = v_coeffs[vmax + 1] * v_w_challenge % R

        E_evals = [
            ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval,
            ev.s_sigma_1_eval, ev.s_sigma_2_eval, ev.s_sigma_3_eval,
        ]
        if not legacy:
            E_evals += [ev.q_arith_eval, ev.q_c_eval, ev.q_l_eval, ev.q_r_eval]
        E_evals += [ev.a_w_eval, ev.b_w_eval, ev.d_w_eval]
        E_scalar = sum(e * c % R for e, c in zip(E_evals, v_coeffs)) % R
        E_scalar = (E_scalar - r_0 + u_challenge * ev.z_eval) % R

        f_scalars = list(v_coeffs[:vmax])
        f_scalars[0] = (f_scalars[0] + v_coeffs[vmax]) % R
        f_scalars[1] = (f_scalars[1] + v_coeffs[vmax + 1]) % R
        f_scalars[3] = (f_scalars[3] + v_coeffs[vmax + 2]) % R
        f_points = [
            self.a_comm.point, self.b_comm.point, self.c_comm.point,
            self.d_comm.point,
            verifier_key.s_sigma_1.point, verifier_key.s_sigma_2.point,
            verifier_key.s_sigma_3.point,
        ]
        if not legacy:
            f_points += [
                verifier_key.q_arith.point, verifier_key.q_c.point,
                verifier_key.q_l.point, verifier_key.q_r.point,
            ]

        F = _host_msm(D_points + f_points, D_scalars + f_scalars)
        E = opening_key.g.mul(E_scalar)

        left = -(self.w_z_chall_comm.point
                 + self.w_z_chall_w_comm.point.mul(u_challenge))
        right = (
            self.w_z_chall_comm.point.mul(z_challenge)
            + self.w_z_chall_w_comm.point.mul(
                u_challenge * z_challenge % R * domain.omega % R)
            + F + (-E)
        )
        ok = multi_pairing_is_one(
            [(left, opening_key.x_h), (right, opening_key.h)])
        if not ok:
            raise ProofVerificationError("final pairing check failed")

    def _linearization_msm(self, alpha, beta, gamma, seps, z_challenge,
                           u_challenge, l1_eval, vk, domain, z_h_eval):
        """[D]_1 scalar/point lists (proof.rs:756-844)."""
        ev = self.evaluations
        range_sep, logic_sep, fixed_sep, var_sep = seps
        scalars, points = [], []
        for name, s in widgets.arithmetic_scalars(ev).items():
            scalars.append(s)
            points.append(vk.commitments[name].point)
        scalars.append(widgets.range_scalar(range_sep, ev))
        points.append(vk.q_range.point)
        scalars.append(widgets.logic_scalar(logic_sep, ev))
        points.append(vk.q_logic.point)
        scalars.append(widgets.fixed_base_scalar(fixed_sep, ev))
        points.append(vk.q_fixed_group_add.point)
        scalars.append(widgets.variable_base_scalar(var_sep, ev))
        points.append(vk.q_variable_group_add.point)
        scalars.append(widgets.permutation_z_scalar(
            alpha, beta, gamma, z_challenge, u_challenge, l1_eval, ev))
        points.append(self.z_comm.point)
        scalars.append(widgets.permutation_sigma4_scalar(alpha, beta, gamma, ev))
        points.append(vk.s_sigma_4.point)

        neg_zh = (-z_h_eval) % R
        zn = pow(z_challenge, domain.n, R)
        scalars.append(neg_zh)
        points.append(self.t_low_comm.point)
        scalars.append(neg_zh * zn % R)
        points.append(self.t_mid_comm.point)
        scalars.append(neg_zh * zn % R * zn % R)
        points.append(self.t_high_comm.point)
        scalars.append(neg_zh * zn % R * zn % R * zn % R)
        points.append(self.t_fourth_comm.point)
        return scalars, points


def _l1_at_one() -> int:
    return 1


def _host_msm(points: list[G1], scalars: list[int]) -> G1:
    from ..native import g1_msm_small

    res = g1_msm_small(points, scalars)
    if res is not None:
        return res
    acc = G1.identity()
    for p, s in zip(points, scalars):
        acc = acc + p.mul(s)
    return acc


def compute_barycentric_eval_sparse(indexes, evaluations, point, domain) -> int:
    """Sparse barycentric PI evaluation (proof.rs:911-952)."""
    if not indexes:
        return 0
    numerator = (pow(point, domain.n, R) - 1) % R * domain.n_inv % R
    nz = [(i, e) for i, e in zip(indexes, evaluations) if e % R != 0]
    if not nz:
        return 0
    total = 0
    for i, e in nz:
        denom = (pow(domain.omega_inv, i, R) * point - 1) % R
        total = (total + e * pow(denom, -1, R)) % R
    return total * numerator % R
