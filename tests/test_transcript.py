"""Byte-exactness of the STROBE/Merlin reimplementation.

Interop-critical (SURVEY.md section 2.2 "Merlin transcript"): challenges must
match the merlin crate bit-for-bit or proofs won't cross-verify.
"""

import hashlib

from plonk_tpu.transcript import Transcript, keccak_f1600
from plonk_tpu.field import params


def _sha3_256(msg: bytes) -> bytes:
    rate = 136
    st = bytearray(200)
    buf = bytearray(msg)
    buf.append(0x06)
    while len(buf) % rate != 0:
        buf.append(0)
    buf[-1] |= 0x80
    for off in range(0, len(buf), rate):
        for i in range(rate):
            st[i] ^= buf[off + i]
        keccak_f1600(st)
    return bytes(st[:32])


def test_keccak_via_sha3():
    for data in [b"", b"abc", b"The quick brown fox", b"x" * 777]:
        assert _sha3_256(data) == hashlib.sha3_256(data).digest()


def test_merlin_known_vector():
    # equivalence test vector from the merlin crate's test suite
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    assert t.challenge_bytes(b"challenge", 32).hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_multi_round():
    # challenges diverge after different appends; clones agree
    a = Transcript(b"proto")
    b = Transcript(b"proto")
    a.append_scalar(b"x", 5)
    b.append_scalar(b"x", 5)
    c = a.clone()
    assert a.challenge_scalar(b"c") == b.challenge_scalar(b"c")
    c.append_scalar(b"y", 6)
    assert c.challenge_scalar(b"c") != b.clone().challenge_scalar(b"c")


def test_challenge_scalar_in_field():
    t = Transcript(b"proto")
    for i in range(5):
        s = t.challenge_scalar(b"ch")
        assert 0 <= s < params.R_MOD


def test_circuit_domain_sep_and_commitment():
    from plonk_tpu.curve import G1

    t = Transcript(b"proto")
    t.circuit_domain_sep(1024)
    t.append_commitment(b"comm", G1.generator())
    s = t.challenge_scalar(b"c")
    # deterministic
    t2 = Transcript(b"proto")
    t2.circuit_domain_sep(1024)
    t2.append_commitment(b"comm", G1.generator())
    assert s == t2.challenge_scalar(b"c")
