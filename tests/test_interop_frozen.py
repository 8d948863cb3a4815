"""Frozen interop fixtures: challenge stream, pairing value, grand product.

VERDICT r3 'Next round' #5: without a Rust toolchain there is no way to
diff against dusk-produced bytes, so the next-best defense is pinning —
any drift in the STROBE framing, label schedule, wide reduction, proof
serde, or the pairing tower shows up as a red test here long before it
shows up as an interop failure.

  * The challenge stream is recomputed by transcript replay over the
    COMMITTED dryrun proof fixture (tests/fixtures/dryrun_proof.hex) and
    compared against pinned constants (host-only, no jit).
  * e(G1, G2) is pinned by digest; the native C++ pairing (an independent
    implementation of the tower) must also accept the bilinearity relation
    e(g,h) * e(-g,h) = 1 (covered in test_native_verify).
  * The slow grand-product oracle mirrors the reference's
    compute_slow_permutation_poly tests (permutation.rs:474-656): z(1)=1
    and the recurrence z(w^{i+1}) * den_i = z(w^i) * num_i hold pointwise,
    computed with python bigints directly from the composer's permutation
    — the device blocked-scan (compiler _round2_jit) has an exact oracle
    at the permutation layer, not just end-to-end.
"""

import hashlib
import os

import numpy as np
import pytest

from plonk_tpu.field import params
from plonk_tpu.curve.bls12_381 import G1, G2, pairing

R = params.R_MOD
FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

CHALLENGE_STREAM = {
    "beta": 0x67029e2de5beff4c63b244385e0ba0bdaaeb1f81159bc3fa12da7a10eff5f32f,
    "gamma": 0x65afcd24a465cc79d8e09458c6d420b3bef267c491dcfacaa70daa32a60defde,
    "alpha": 0x412c067c9ffdddafc9adbb7f949c938edbe54cbaa690d70508c2d1c5e047f505,
    "range_sep": 0x03df5fadc0f2906419e01e2d7b0079950af999522a2771806a3218bca5352602,
    "logic_sep": 0x60bccfdbb691a4031725dfdd02912a6b09b28ec8d01f1ec8a64fb8b67cc7a356,
    "fixed_sep": 0x383b549e911cacc4537feed729a78a67a4d0221eec660e321cedc1a5af16872f,
    "var_sep": 0x04e02a1ed2a9c2f0034840d569cfbfba70d77cae10512ae50adacbde9c0b4bb3,
    "z_challenge": 0x1ef5ad1405fa882b9c908edc4de194a0d351bff17110b68235196bfa16b0c837,
}

# sha256 over the 12 Fp coefficients of e(G1gen, G2gen), each 48B big-endian,
# in (c0|c1)(c0|c1|c2)(c0|c1) tower order.  Self-generated (no cargo in this
# environment — BASELINE interop caveat); drift detection for the Fp12
# tower, Miller loop, and final exponentiation.
PAIRING_GEN_SHA256 = (
    "4b4c07e7d5136bb2947bab11cf26a740cd2aeef4baf3e6f773bfadb5e505f8b4")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXDIR, "dryrun_proof.hex")),
    reason="dryrun fixtures not present")
def test_challenge_stream_pinned():
    from plonk_tpu.compiler import Verifier, PlonkVersion
    from plonk_tpu.proof_system.proof import Proof

    with open(os.path.join(FIXDIR, "dryrun_verifier.bin"), "rb") as f:
        ver = Verifier.try_from_bytes(f.read())
    with open(os.path.join(FIXDIR, "dryrun_proof.hex")) as f:
        proof = Proof.from_bytes(bytes.fromhex(f.read().strip()))
    with open(os.path.join(FIXDIR, "dryrun_pis.txt")) as f:
        pis = [int(x) for x in f.read().split()]

    t = ver._transcript(PlonkVersion.V3)
    for pi in pis:
        t.append_scalar(b"pi", pi)
    got = {}
    for name, comm in ((b"a_comm", proof.a_comm), (b"b_comm", proof.b_comm),
                       (b"c_comm", proof.c_comm), (b"d_comm", proof.d_comm)):
        t.append_commitment(name, comm)
    got["beta"] = t.challenge_scalar(b"beta")
    t.append_scalar(b"beta", got["beta"])
    got["gamma"] = t.challenge_scalar(b"gamma")
    t.append_commitment(b"z_comm", proof.z_comm)
    got["alpha"] = t.challenge_scalar(b"alpha")
    got["range_sep"] = t.challenge_scalar(b"range separation challenge")
    got["logic_sep"] = t.challenge_scalar(b"logic separation challenge")
    got["fixed_sep"] = t.challenge_scalar(b"fixed base separation challenge")
    got["var_sep"] = t.challenge_scalar(
        b"variable base separation challenge")
    for name, comm in ((b"t_low_comm", proof.t_low_comm),
                       (b"t_mid_comm", proof.t_mid_comm),
                       (b"t_high_comm", proof.t_high_comm),
                       (b"t_fourth_comm", proof.t_fourth_comm)):
        t.append_commitment(name, comm)
    got["z_challenge"] = t.challenge_scalar(b"z_challenge")
    assert got == CHALLENGE_STREAM


def test_pairing_generator_pinned():
    e = pairing(G1.generator(), G2.generator())
    cs = []
    for c6 in (e.c0, e.c1):
        for c2 in (c6.c0, c6.c1, c6.c2):
            cs.extend([c2.c0, c2.c1])
    blob = b"".join(int(c).to_bytes(48, "big") for c in cs)
    assert hashlib.sha256(blob).hexdigest() == PAIRING_GEN_SHA256


def _sigma_values(composer, n):
    """sigma*(col, row) = K[col'] * omega^row' from the cycle map — the
    same construction preprocess uses (compiler/__init__.py:211-216)."""
    from plonk_tpu.field.params import K1, K2, K3

    ks = [1, K1, K2, K3]
    root = composer_root(n)
    sig_idx = composer.perm.compute_sigma_indices(n)       # (4, n, 2)
    return [[ks[int(sig_idx[j, i, 0])] * pow(root, int(sig_idx[j, i, 1]), R)
             % R for i in range(n)] for j in range(4)]


def _slow_grand_product(composer, n, beta, gamma):
    """compute_slow_permutation_poly mirror (permutation.rs:474-656):
    z over the Lagrange basis from first principles with python ints."""
    from plonk_tpu.field.params import K1, K2, K3

    wires = composer.wire_columns(n)                       # (4, n) indices
    wit = composer.witnesses
    omega_pows = [pow(composer_root(n), i, R) for i in range(n)]
    ks = [1, K1, K2, K3]
    sigma = _sigma_values(composer, n)
    nums, dens = [], []
    for i in range(n):
        num = den = 1
        for j in range(4):
            w = wit[wires[j][i]]
            num = num * ((w + beta * ks[j] * omega_pows[i] + gamma) % R) % R
            den = den * ((w + beta * sigma[j][i] + gamma) % R) % R
        nums.append(num)
        dens.append(den)
    z = [1]
    for i in range(n - 1):
        z.append(z[-1] * nums[i] % R * pow(dens[i], -1, R) % R)
    return z, nums, dens


def composer_root(n: int) -> int:
    from plonk_tpu.ntt.domain import EvaluationDomain

    return EvaluationDomain.get(n).omega


def test_slow_grand_product_oracle():
    """z(1)=1, the z(Xw) recurrence holds pointwise, and the wrap-around
    product is 1 (copy constraints close the cycle) — asserted directly at
    the permutation layer, and against the device round-2 scan."""
    import jax.numpy as jnp

    from plonk_tpu.composer import Composer, Circuit, Constraint
    from plonk_tpu.compiler import _round2_jit, _mont
    from plonk_tpu.ntt.domain import EvaluationDomain
    from plonk_tpu.field import FR
    from plonk_tpu.field.params import K1, K2, K3

    class C(Circuit):
        def circuit(self, c):
            a = c.append_witness(3)
            b = c.append_witness(4)
            s = Constraint().left(1).right(1).a(a).b(b)
            o = c.gate_add(s)
            for _ in range(3):
                s = Constraint().mult(1).a(o).b(b)
                o = c.gate_mul(s)

    composer = Composer.initialized()
    C().circuit(composer)
    n = 16
    assert composer.constraints() <= n
    beta, gamma = 0x1234567, 0xFEDCBA9
    z, nums, dens = _slow_grand_product(composer, n, beta, gamma)
    assert z[0] == 1
    # recurrence z(w^{i+1}) den_i = z(w^i) num_i, including the wrap to i=0
    for i in range(n):
        lhs = z[(i + 1) % n] * dens[i] % R
        rhs = z[i] * nums[i] % R
        assert lhs == rhs, i

    # device blocked scan agrees on the Lagrange z vector
    d = EvaluationDomain.get(n)
    wits = np.asarray(FR.pack([v * FR.R % R for v in composer.witnesses]))
    wire_vals = jnp.asarray(wits[:, composer.wire_columns(n)])
    sigma_lagr = jnp.asarray(np.stack(
        [FR.pack([s * FR.R % R for s in row])
         for row in _sigma_values(composer, n)], axis=1))
    omega_pows = jnp.asarray(
        FR.pack([pow(d.omega, i, R) * FR.R % R for i in range(n)]))
    chal = _mont([beta, gamma, 1, K1, K2, K3])
    zbl = _mont([0, 0, 0])
    zpoly = _round2_jit(n)(wire_vals, sigma_lagr, omega_pows,
                           jnp.asarray(chal), jnp.asarray(zbl),
                           d.tables_dev())
    # evaluate the (unblinded: zero blinders change coeffs at 0,1,2 and
    # n..n+2 — with zero blinders the poly is exact) z poly back on H
    zev = d.fft(jnp.asarray(np.asarray(zpoly))[:, : n], tb=d.tables_dev())
    got = [v * pow(FR.R, -1, R) % R for v in FR.unpack(np.asarray(zev))]
    assert got == z
