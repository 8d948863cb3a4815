"""KZG10: setup/trim/commit/open roundtrips (reference key.rs:548-932 test tier)."""

import random

import jax
import jax.numpy as jnp

from plonk_tpu.field import FR, params
from plonk_tpu.kzg import PublicParameters, Commitment
from plonk_tpu.kzg import poly as poly_ops
from plonk_tpu.curve import G1

rng = random.Random(0xCAFE)
P = params.R_MOD


def to_dev(coeffs):
    return jax.jit(FR.to_mont)(FR.pack(coeffs))


def test_poly_evaluate_and_ruffini():
    n = 200
    coeffs = [rng.randrange(P) for _ in range(n)]
    z = rng.randrange(P)
    ev = FR.unpack(jax.jit(FR.from_mont)(poly_ops.evaluate(to_dev(coeffs), z)[..., None]))[0]
    assert ev == poly_ops.evaluate_host(coeffs, z)
    quot, rem = poly_ops.ruffini(to_dev(coeffs), z)
    remv = FR.unpack(jax.jit(FR.from_mont)(rem[..., None]))[0]
    assert remv == ev
    q = FR.unpack(jax.jit(FR.from_mont)(quot))
    # verify q * (X - z) + p(z) == p
    recon = [0] * (n + 1)
    for i, c in enumerate(q):
        recon[i + 1] = (recon[i + 1] + c) % P
        recon[i] = (recon[i] - c * z) % P
    recon[0] = (recon[0] + ev) % P
    assert recon[:n] == coeffs and recon[n] == 0


def test_setup_trim_commit_open():
    degree = 40
    pp = PublicParameters.setup(degree, secret=123456789)
    # powers are x^i * G
    g = G1.generator()
    assert pp.commit_key.powers_of_g[0] == g
    assert pp.commit_key.powers_of_g[1] == g.mul(123456789)
    ck, ok = pp.trim(degree)

    coeffs = [rng.randrange(P) for _ in range(degree + 1)]
    comm = ck.commit_host(coeffs)
    # commitment equals direct scalar mul by p(x)
    px = poly_ops.evaluate_host(coeffs, 123456789)
    assert comm.point == g.mul(px)

    # open at a random z and verify with the pairing
    z = rng.randrange(P)
    dev = to_dev(coeffs)
    quot, rem = poly_ops.ruffini(dev, z)
    value = poly_ops.evaluate_host(coeffs, z)
    w_comm = ck.commit_dev(quot)
    assert ok.check(comm.point, z, value, w_comm.point)
    # wrong value must fail
    assert not ok.check(comm.point, z, (value + 1) % P, w_comm.point)


def test_aggregate_witness():
    degree = 16
    secret = 987654321
    pp = PublicParameters.setup(degree, secret=secret)
    ck, ok = pp.trim(degree)
    polys = [[rng.randrange(P) for _ in range(degree + 1)] for _ in range(3)]
    z, v = rng.randrange(P), rng.randrange(P)
    dev_polys = [to_dev(c) for c in polys]
    w = ck.compute_aggregate_witness(dev_polys, z, v)
    w_comm = ck.commit_dev(w)
    # aggregate commitment & value with powers of v
    agg_comm, agg_val = G1.identity(), 0
    for i, c in enumerate(polys):
        vi = pow(v, i, P)
        agg_comm = agg_comm + ck.commit_host(c).point.mul(vi)
        agg_val = (agg_val + vi * poly_ops.evaluate_host(c, z)) % P
    assert ok.check(agg_comm, z, agg_val, w_comm.point)


def test_srs_serde():
    pp = PublicParameters.setup(8, secret=42)
    data = pp.to_var_bytes()
    pp2 = PublicParameters.from_slice(data)
    assert pp2.commit_key.powers_of_g == pp.commit_key.powers_of_g
    assert pp2.opening_key.x_h == pp.opening_key.x_h
    raw = pp.to_raw_var_bytes()
    pp3 = PublicParameters.from_slice_unchecked(raw)
    assert pp3.commit_key.powers_of_g == pp.commit_key.powers_of_g


def test_device_srs_gen_matches_host():
    secret = 31415926
    pp_host = PublicParameters.setup(10, secret=secret, device=False)
    pp_dev = PublicParameters.setup(10, secret=secret, device=True)
    assert pp_host.commit_key.powers_of_g == pp_dev.commit_key.powers_of_g


def test_aggregate_proof_flatten_and_batch_check():
    """AggregateProof.flatten + transcript-bound batch_check over three
    openings at distinct points (reference kzg10/proof.rs:69-110,
    key.rs:499-545 + the batch-binding test key.rs:705)."""
    from plonk_tpu.kzg import (
        AggregateProof, KzgProof, batch_check, open_single,
    )
    from plonk_tpu.transcript import Transcript
    from plonk_tpu.utils.errors import ProofVerificationError
    import pytest

    degree = 16
    pp = PublicParameters.setup(degree, secret=424242)
    ck, ok = pp.trim(degree)

    proofs, zs = [], []
    for k in range(3):
        coeffs = [rng.randrange(P) for _ in range(degree + 1)]
        z = rng.randrange(P)
        value = poly_ops.evaluate_host(coeffs, z)
        proofs.append(open_single(ck, to_dev(coeffs), value, z))
        zs.append(z)

    batch_check(ok, zs, proofs, Transcript(b"batch"))

    # single check still works through the same objects
    p0 = proofs[0]
    assert ok.check(p0.commitment_to_polynomial.point, zs[0],
                    p0.evaluated_point, p0.commitment_to_witness.point)

    # tamper one evaluation -> the whole batch dies
    bad = [KzgProof(p.commitment_to_witness, p.evaluated_point,
                    p.commitment_to_polynomial) for p in proofs]
    bad[1].evaluated_point = (bad[1].evaluated_point + 1) % P
    with pytest.raises(ProofVerificationError):
        batch_check(ok, zs, bad, Transcript(b"batch"))

    # aggregate-at-one-point flatten: 3 polys at the same z
    z = rng.randrange(P)
    polys = [[rng.randrange(P) for _ in range(degree + 1)] for _ in range(3)]
    v = rng.randrange(P)
    w_poly = ck.compute_aggregate_witness([to_dev(c) for c in polys], z, v)
    agg = AggregateProof.with_witness(ck.commit_dev(w_poly))
    for c in polys:
        agg.add_part(poly_ops.evaluate_host(c, z), ck.commit_host(c))
    flat = agg.flatten(v)
    assert ok.check(flat.commitment_to_polynomial.point, z,
                    flat.evaluated_point, flat.commitment_to_witness.point)
