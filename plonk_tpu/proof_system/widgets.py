"""Widget identity scalar math (host ints) — shared by the prover's
linearization and the verifier's [D]_1 commitment scalars.

Each custom-gate family contributes one identity; the quotient-side versions
(vectorized over the 8n coset) live in quotient.py, but the *scalar* versions
below (evaluated at the challenge point z) are pure Python int math consumed by
both linearization_poly (prover) and Proof.verify (verifier) — mirroring the
formula pairs in /root/reference/src/proof_system/widget/*/
{proverkey,verifierkey}.rs.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..field import params

R = params.R_MOD
EDWARDS_D = params.JUBJUB_D
K1, K2, K3 = params.K1, params.K2, params.K3


@dataclass
class ProofEvaluations:
    """The 15 scalars carried in the proof (linearization_poly.rs:24-57)."""

    a_eval: int = 0
    b_eval: int = 0
    c_eval: int = 0
    d_eval: int = 0
    a_w_eval: int = 0
    b_w_eval: int = 0
    d_w_eval: int = 0
    q_arith_eval: int = 0
    q_c_eval: int = 0
    q_l_eval: int = 0
    q_r_eval: int = 0
    s_sigma_1_eval: int = 0
    s_sigma_2_eval: int = 0
    s_sigma_3_eval: int = 0
    z_eval: int = 0

    FIELD_ORDER = (
        "a_eval", "b_eval", "c_eval", "d_eval", "a_w_eval", "b_w_eval",
        "d_w_eval", "q_arith_eval", "q_c_eval", "q_l_eval", "q_r_eval",
        "s_sigma_1_eval", "s_sigma_2_eval", "s_sigma_3_eval", "z_eval",
    )

    def to_bytes(self) -> bytes:
        return b"".join(
            getattr(self, f).to_bytes(32, "little") for f in self.FIELD_ORDER
        )

    @staticmethod
    def from_bytes(data: bytes) -> "ProofEvaluations":
        vals = {}
        for i, f in enumerate(ProofEvaluations.FIELD_ORDER):
            v = int.from_bytes(data[32 * i : 32 * (i + 1)], "little")
            if v >= R:
                raise ValueError(f"non-canonical scalar in {f}")
            vals[f] = v
        return ProofEvaluations(**vals)


def delta(f: int) -> int:
    """f(f-1)(f-2)(f-3) — the base-4 digit check."""
    return f * (f - 1) % R * (f - 2) % R * (f - 3) % R


def delta_xor_and(a: int, b: int, w: int, c: int, q_c: int) -> int:
    """Combined XOR/AND quad identity (logic/proverkey.rs delta_xor_and)."""
    F = (
        w
        * (w * (4 * w - 18 * (a + b) + 81) + 18 * (a * a + b * b) - 81 * (a + b) + 83)
    ) % R
    E = (3 * (a + b + c) - 2 * F) % R
    B = q_c * (9 * c - 3 * (a + b)) % R
    return (B + E) % R


# -- per-widget linearization scalars (multiply the family's selector poly) ----

def arithmetic_scalars(ev: ProofEvaluations) -> dict[str, int]:
    """Scalars for q_m,q_l,q_r,q_o,q_f,q_c (arithmetic/verifierkey.rs:92-118)."""
    qa = ev.q_arith_eval
    return {
        "q_m": ev.a_eval * ev.b_eval % R * qa % R,
        "q_l": ev.a_eval * qa % R,
        "q_r": ev.b_eval * qa % R,
        "q_o": ev.c_eval * qa % R,
        "q_f": ev.d_eval * qa % R,
        "q_c": qa,
    }


def range_scalar(sep: int, ev: ProofEvaluations) -> int:
    kappa = sep * sep % R
    k2, k3 = kappa * kappa % R, 0
    k3 = k2 * kappa % R
    b1 = delta((ev.c_eval - 4 * ev.d_eval) % R)
    b2 = delta((ev.b_eval - 4 * ev.c_eval) % R) * kappa
    b3 = delta((ev.a_eval - 4 * ev.b_eval) % R) * k2
    b4 = delta((ev.d_w_eval - 4 * ev.a_eval) % R) * k3
    return (b1 + b2 + b3 + b4) % R * sep % R


def logic_scalar(sep: int, ev: ProofEvaluations) -> int:
    kappa = sep * sep % R
    k2 = kappa * kappa % R
    k3 = k2 * kappa % R
    k4 = k3 * kappa % R
    a = (ev.a_w_eval - 4 * ev.a_eval) % R
    b = (ev.b_w_eval - 4 * ev.b_eval) % R
    d = (ev.d_w_eval - 4 * ev.d_eval) % R
    w = ev.c_eval
    c0 = delta(a)
    c1 = delta(b) * kappa % R
    c2 = delta(d) * k2 % R
    c3 = (w - a * b) % R * k3 % R
    c4 = delta_xor_and(a, b, w, d, ev.q_c_eval) * k4 % R
    return (c0 + c1 + c2 + c3 + c4) % R * sep % R


def fixed_base_scalar(sep: int, ev: ProofEvaluations) -> int:
    kappa = sep * sep % R
    k2 = kappa * kappa % R
    k3 = k2 * kappa % R
    x_beta, y_beta = ev.q_l_eval, ev.q_r_eval
    acc_x, acc_x_w = ev.a_eval, ev.a_w_eval
    acc_y, acc_y_w = ev.b_eval, ev.b_w_eval
    xy_alpha = ev.c_eval
    bit = (ev.d_w_eval - 2 * ev.d_eval) % R
    bit_consistency = bit * (bit - 1) % R * (bit + 1) % R
    y_alpha = (bit * bit % R * (y_beta - 1) + 1) % R
    x_alpha = bit * x_beta % R
    xy_consistency = (bit * ev.q_c_eval - xy_alpha) % R * kappa % R
    dxy = xy_alpha * acc_x % R * acc_y % R * EDWARDS_D % R
    x_acc = (acc_x_w + acc_x_w * dxy - (acc_x * y_alpha + acc_y * x_alpha)) % R * k2 % R
    y_acc = (acc_y_w - acc_y_w * dxy - (acc_y * y_alpha + acc_x * x_alpha)) % R * k3 % R
    return (bit_consistency + x_acc + y_acc + xy_consistency) % R * sep % R


def variable_base_scalar(sep: int, ev: ProofEvaluations) -> int:
    kappa = sep * sep % R
    x1, x3 = ev.a_eval, ev.a_w_eval
    y1, y3 = ev.b_eval, ev.b_w_eval
    x2, y2 = ev.c_eval, ev.d_eval
    x1y2 = ev.d_w_eval
    xy_consistency = (x1 * y2 - x1y2) % R
    y1x2 = y1 * x2 % R
    d_term = EDWARDS_D * x1y2 % R * y1x2 % R
    x3_c = (x1y2 + y1x2 - (x3 + x3 * d_term)) % R * kappa % R
    y3_c = (y1 * y2 + x1 * x2 - (y3 - y3 * d_term)) % R * kappa % R * kappa % R
    return (xy_consistency + x3_c + y3_c) % R * sep % R


def permutation_z_scalar(
    alpha: int, beta: int, gamma: int, z_challenge: int, u: int,
    l1_eval: int, ev: ProofEvaluations,
) -> int:
    """Scalar on z_comm (permutation/verifierkey.rs:45-72): identity product
    * alpha + L1(z) alpha^2 + u."""
    bz = beta * z_challenge % R
    x = (
        (ev.a_eval + bz + gamma)
        * (ev.b_eval + K1 * bz + gamma) % R
        * ((ev.c_eval + K2 * bz + gamma) % R) % R
        * ((ev.d_eval + K3 * bz + gamma) * alpha % R) % R
    )
    return (x + l1_eval * alpha % R * alpha + u) % R


def permutation_sigma4_scalar(
    alpha: int, beta: int, gamma: int, ev: ProofEvaluations
) -> int:
    """Scalar on s_sigma_4 (negated copy product; verifierkey.rs:73-89)."""
    y = (
        (ev.a_eval + beta * ev.s_sigma_1_eval + gamma)
        * ((ev.b_eval + beta * ev.s_sigma_2_eval + gamma) % R) % R
        * ((ev.c_eval + beta * ev.s_sigma_3_eval + gamma) % R) % R
        * (beta * ev.z_eval % R * alpha % R) % R
    )
    return (-y) % R
