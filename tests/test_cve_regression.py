"""CVE regression: unbound selector evaluations (proof.rs:1002-1471).

The attack: honest wires, a RANDOM permutation polynomial z (breaking the
copy constraints), RANDOM quotient chunks, and a q_arith_eval forged after
seeing z_challenge to balance the verification equation.  Pre-fix verifiers
(7-poly batching that does not bind selector evaluations) ACCEPT this proof;
the fixed 12-poly batching must REJECT it.

The whole forgery is host-side Python bignum math (n = 16), cross-checking the
device prover's own key tensors.
"""

import random

import numpy as np
import jax
import pytest

from plonk_tpu import Constraint, Circuit, PublicParameters
from plonk_tpu.compiler import Compiler, PlonkVersion, PAD
from plonk_tpu.field import FR, params
from plonk_tpu.ntt import EvaluationDomain
from plonk_tpu.proof_system.proof import (
    Proof, compute_barycentric_eval_sparse,
)
from plonk_tpu.proof_system import widgets
from plonk_tpu.proof_system.widgets import ProofEvaluations
from plonk_tpu.proof_system.keys import SELECTOR_ORDER
from plonk_tpu.utils.errors import ProofVerificationError

R = params.R_MOD


class ArithCircuit(Circuit):
    """a + b + a*b + d + public + 1 = result (reference proof.rs:1033-1066)."""

    def __init__(self, a=3, b=5, d=7, public=11):
        self.a, self.b, self.d, self.public = a, b, d, public
        self.result = (a + b + a * b + d + public + 1) % R

    def circuit(self, composer):
        w_a = composer.append_witness(self.a)
        w_b = composer.append_witness(self.b)
        w_d = composer.append_witness(self.d)
        w_result = composer.append_witness(self.result)
        constraint = (Constraint().left(1).right(1).mult(1).fourth(1)
                      .a(w_a).b(w_b).d(w_d).public(self.public).constant(1))
        result = composer.gate_add(constraint)
        composer.assert_equal(w_result, result)


# -- host polynomial helpers ---------------------------------------------------

def host_ifft(vals, domain):
    n = domain.n
    return [
        sum(v * pow(domain.omega_inv, j * k, R) for k, v in enumerate(vals))
        % R * domain.n_inv % R
        for j in range(n)
    ]


def host_eval(coeffs, z):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % R
    return acc


def blind_poly_host(rng, vals, hiding_degree, domain):
    coeffs = host_ifft(vals, domain) + [0] * (hiding_degree + 1)
    for i in range(hiding_degree + 1):
        b = rng.randrange(R)
        coeffs[i] = (coeffs[i] - b) % R
        coeffs[domain.n + i] = b
    return coeffs


def host_ruffini(coeffs, z):
    """Synthetic division by (X - z): returns quotient coefficients."""
    quot = [0] * (len(coeffs) - 1)
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % R
        quot[i - 1] = acc
    return quot


def aggregate_and_open(ck, polys, z, v):
    maxlen = max(len(p) for p in polys)
    agg = [0] * maxlen
    for i, p in enumerate(polys):
        vi = pow(v, i, R)
        for j, c in enumerate(p):
            agg[j] = (agg[j] + vi * c) % R
    return ck.commit_host(host_ruffini(agg, z))


def forge_proof(prover, circuit, version, rng):
    """Reference forge_proof (proof.rs:1083-1418), host math."""
    from plonk_tpu.composer import Composer

    composed = Composer.prove(prover.constraints, circuit)
    n = prover.size
    domain = EvaluationDomain.get(n)
    pk = prover.prover_key
    ck = prover.commit_key

    transcript = prover._transcript(version)
    public_inputs = composed.public_input_values()
    pi_indexes = composed.public_input_indexes()
    for pi in public_inputs:
        transcript.append_scalar(b"pi", pi)

    # selector + sigma coefficient tensors -> host ints
    coeffs_host = FR.unpack(np.asarray(jax.jit(FR.from_mont)(pk.coeffs)))
    sel = {name: coeffs_host[i * n : (i + 1) * n]
           for i, name in enumerate(SELECTOR_ORDER)}
    nsel = len(SELECTOR_ORDER)
    sigma = [coeffs_host[(nsel + k) * n : (nsel + k + 1) * n] for k in range(4)]

    # round 1: honest wires
    wires = {k: [0] * n for k in "abcd"}
    for row in range(composed.constraints()):
        for k in "abcd":
            wires[k][row] = composed.witnesses[composed.wires[k][row]]
    wire_polys = {k: blind_poly_host(rng, wires[k], 1, domain) for k in "abcd"}
    comms = {k: ck.commit_host(wire_polys[k]) for k in "abcd"}
    for k in "abcd":
        transcript.append_commitment(f"{k}_comm".encode(), comms[k])

    # round 2: RANDOM z polynomial — the permutation argument is broken
    beta = transcript.challenge_scalar(b"beta")
    transcript.append_scalar(b"beta", beta)
    gamma = transcript.challenge_scalar(b"gamma")
    z_vals = [rng.randrange(R) for _ in range(n)]
    z_poly = blind_poly_host(rng, z_vals, 2, domain)
    z_comm = ck.commit_host(z_poly)
    transcript.append_commitment(b"z_comm", z_comm)

    # round 3: RANDOM degree-1 quotient chunks
    alpha = transcript.challenge_scalar(b"alpha")
    range_sep = transcript.challenge_scalar(b"range separation challenge")
    logic_sep = transcript.challenge_scalar(b"logic separation challenge")
    fixed_sep = transcript.challenge_scalar(b"fixed base separation challenge")
    var_sep = transcript.challenge_scalar(b"variable base separation challenge")
    t_polys = [[rng.randrange(R), rng.randrange(R - 1) + 1] for _ in range(4)]
    t_comms = [ck.commit_host(t) for t in t_polys]
    for name, comm in zip(
        (b"t_low_comm", b"t_mid_comm", b"t_high_comm", b"t_fourth_comm"),
        t_comms,
    ):
        transcript.append_commitment(name, comm)

    # round 4: honest evaluations except the forged q_arith_eval
    z_challenge = transcript.challenge_scalar(b"z_challenge")
    zw = z_challenge * domain.omega % R
    evals = dict(
        a_eval=host_eval(wire_polys["a"], z_challenge),
        b_eval=host_eval(wire_polys["b"], z_challenge),
        c_eval=host_eval(wire_polys["c"], z_challenge),
        d_eval=host_eval(wire_polys["d"], z_challenge),
        s_sigma_1_eval=host_eval(sigma[0], z_challenge),
        s_sigma_2_eval=host_eval(sigma[1], z_challenge),
        s_sigma_3_eval=host_eval(sigma[2], z_challenge),
        z_eval=host_eval(z_poly, zw),
        a_w_eval=host_eval(wire_polys["a"], zw),
        b_w_eval=host_eval(wire_polys["b"], zw),
        d_w_eval=host_eval(wire_polys["d"], zw),
        q_c_eval=host_eval(sel["q_c"], z_challenge),
        q_l_eval=host_eval(sel["q_l"], z_challenge),
        q_r_eval=host_eval(sel["q_r"], z_challenge),
    )

    # ---- forge q_arith_eval: balance r(z) = -r_0 + pi_eval ----
    z_h_eval = domain.evaluate_vanishing_polynomial(z_challenge)
    l1_eval = (z_h_eval
               * pow(domain.n * (z_challenge - 1) % R, -1, R) % R)
    pi_eval = compute_barycentric_eval_sparse(
        pi_indexes, public_inputs, z_challenge, domain)
    ev = evals
    r_0 = (pi_eval
           - l1_eval * alpha % R * alpha
           - alpha
           * ((ev["a_eval"] + beta * ev["s_sigma_1_eval"] + gamma) % R)
           * ((ev["b_eval"] + beta * ev["s_sigma_2_eval"] + gamma) % R) % R
           * ((ev["c_eval"] + beta * ev["s_sigma_3_eval"] + gamma) % R) % R
           * ((ev["d_eval"] + gamma) % R) % R
           * ev["z_eval"]) % R

    def r_at_z(proof_ev):
        """Host mirror of Prover._linearization evaluated at z_challenge."""
        return host_eval(_linearization_host(
            proof_ev, sel, sigma, z_poly, t_polys, pi_eval, alpha, beta,
            gamma, range_sep, logic_sep, fixed_sep, var_sep, z_challenge,
            l1_eval, n), z_challenge)

    ev_q0 = ProofEvaluations(q_arith_eval=0, **evals)
    ev_q1 = ProofEvaluations(q_arith_eval=1, **evals)
    r_q0 = r_at_z(ev_q0)
    base = 0
    for name, s in widgets.arithmetic_scalars(ev_q1).items():
        base = (base + s * host_eval(sel[name], z_challenge)) % R
    target = (-r_0 + pi_eval) % R
    q_arith_forged = (target - r_q0) * pow(base, -1, R) % R
    proof_ev = ProofEvaluations(q_arith_eval=q_arith_forged, **evals)

    for name in ("a_eval", "b_eval", "c_eval", "d_eval",
                 "s_sigma_1_eval", "s_sigma_2_eval", "s_sigma_3_eval",
                 "z_eval", "a_w_eval", "b_w_eval", "d_w_eval",
                 "q_arith_eval", "q_c_eval", "q_l_eval", "q_r_eval"):
        transcript.append_scalar(name.encode(), getattr(proof_ev, name))

    # round 5: openings over the LEGACY 8-poly batch (no selector binding)
    v_challenge = transcript.challenge_scalar(b"v_challenge")
    r_poly = _linearization_host(
        proof_ev, sel, sigma, z_poly, t_polys, pi_eval, alpha, beta, gamma,
        range_sep, logic_sep, fixed_sep, var_sep, z_challenge, l1_eval, n)
    assert host_eval(r_poly, z_challenge) == target
    w_z_comm = aggregate_and_open(
        prover.commit_key,
        [r_poly, wire_polys["a"], wire_polys["b"], wire_polys["c"],
         wire_polys["d"], sigma[0], sigma[1], sigma[2]],
        z_challenge, v_challenge)
    v_w = transcript.challenge_scalar(b"v_w_challenge")
    w_zw_comm = aggregate_and_open(
        prover.commit_key,
        [z_poly, wire_polys["a"], wire_polys["b"], wire_polys["d"]],
        zw, v_w)

    proof = Proof(
        a_comm=comms["a"], b_comm=comms["b"], c_comm=comms["c"],
        d_comm=comms["d"], z_comm=z_comm,
        t_low_comm=t_comms[0], t_mid_comm=t_comms[1],
        t_high_comm=t_comms[2], t_fourth_comm=t_comms[3],
        w_z_chall_comm=w_z_comm, w_z_chall_w_comm=w_zw_comm,
        evaluations=proof_ev,
    )
    return proof, public_inputs


def _linearization_host(ev, sel, sigma, z_poly, t_polys, pi_eval, alpha, beta,
                        gamma, range_sep, logic_sep, fixed_sep, var_sep,
                        z_challenge, l1_eval, n):
    arith = widgets.arithmetic_scalars(ev)
    zn = pow(z_challenge, n, R)
    neg_zh = (-(zn - 1)) % R
    pairs = [(arith[k], sel[k]) for k in ("q_m", "q_l", "q_r", "q_o",
                                          "q_f", "q_c")]
    pairs += [
        (widgets.range_scalar(range_sep, ev), sel["q_range"]),
        (widgets.logic_scalar(logic_sep, ev), sel["q_logic"]),
        (widgets.fixed_base_scalar(fixed_sep, ev), sel["q_fixed_group_add"]),
        (widgets.variable_base_scalar(var_sep, ev),
         sel["q_variable_group_add"]),
        (widgets.permutation_z_scalar(
            alpha, beta, gamma, z_challenge, 0, l1_eval, ev), z_poly),
        (widgets.permutation_sigma4_scalar(alpha, beta, gamma, ev), sigma[3]),
    ]
    acc = neg_zh
    for t in t_polys:
        pairs.append((acc, t))
        acc = acc * zn % R
    out = [0] * max(len(p) for _, p in pairs)
    for s, p in pairs:
        for j, c in enumerate(p):
            out[j] = (out[j] + s * c) % R
    out[0] = (out[0] + pi_eval) % R
    return out


@pytest.fixture(scope="module")
def compiled():
    pp = PublicParameters.setup(16, secret=0xCE5A, device=False)
    circuit = ArithCircuit()
    prover, verifier = Compiler.compile_with_circuit(pp, b"soundness_test",
                                                     circuit)
    return prover, verifier, circuit


def test_honest_proof_verifies(compiled):
    prover, verifier, circuit = compiled
    proof, pis = prover.prove(circuit, rng=random.Random(0xDEADBEEF))
    verifier.verify(proof, pis)


def test_forged_selector_eval_proof_rejected(compiled):
    """The fixed (V3, 12-poly) verifier must reject the forgery."""
    prover, verifier, circuit = compiled
    proof, pis = forge_proof(prover, circuit, PlonkVersion.V3,
                             random.Random(0xDEADBEEF))
    with pytest.raises(ProofVerificationError):
        verifier.verify(proof, pis)


def test_forgery_passes_pre_fix_batching(compiled):
    """Control: the same forgery built against the V1 transcript PASSES the
    pre-fix 7-poly verifier — demonstrating the vulnerability our 12-poly
    batching closes (and validating the forgery construction)."""
    prover, verifier, circuit = compiled
    proof, pis = forge_proof(prover, circuit, PlonkVersion.V1,
                             random.Random(0xDEADBEEF))
    verifier.verify(proof, pis, version=PlonkVersion.V1)
    with pytest.raises(ProofVerificationError):
        verifier.verify(proof, pis, version=PlonkVersion.V3)
