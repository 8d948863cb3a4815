"""Merlin transcripts (byte-exact) + the PLONK transcript protocol.

Mirrors the behavior of the `merlin` crate consumed by the reference's
Fiat-Shamir layer (/root/reference/src/transcript.rs:61-146): labeled
append/challenge over STROBE-128, with challenges reduced to Fr via the
64-byte wide reduction (`BlsScalar::from_bytes_wide`).
"""

from __future__ import annotations

from ..field import params
from .strobe import Strobe128


class Transcript:
    def __init__(self, label: bytes):
        self.strobe = Strobe128(b"Merlin v1.0")
        self.append_message(b"dom-sep", label)

    def append_message(self, label: bytes, message: bytes):
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(len(message).to_bytes(4, "little"), True)
        self.strobe.ad(message, False)

    def append_u64(self, label: bytes, n: int):
        self.append_message(label, int(n).to_bytes(8, "little"))

    def challenge_bytes(self, label: bytes, n: int) -> bytes:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(int(n).to_bytes(4, "little"), True)
        return self.strobe.prf(n)

    def clone(self) -> "Transcript":
        t = object.__new__(Transcript)
        t.strobe = self.strobe.clone()
        return t

    # -- PLONK protocol helpers (reference transcript.rs:89-108) -------------

    def append_scalar(self, label: bytes, s: int):
        """Fr scalar, 32-byte little-endian canonical."""
        self.append_message(label, int(s % params.R_MOD).to_bytes(32, "little"))

    def append_commitment(self, label: bytes, comm):
        """G1 commitment in 48-byte zcash-compressed form."""
        self.append_message(label, comm.to_compressed())

    def challenge_scalar(self, label: bytes) -> int:
        """64 challenge bytes -> Fr via wide little-endian reduction."""
        wide = self.challenge_bytes(label, 64)
        return int.from_bytes(wide, "little") % params.R_MOD

    def circuit_domain_sep(self, n: int):
        self.append_message(b"dom-sep", b"circuit_size")
        self.append_u64(b"n", n)
