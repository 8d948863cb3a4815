"""Framework error types (counterpart of /root/reference/src/error.rs:17-121)."""


class PlonkError(Exception):
    """Base class for all framework errors."""


class InvalidCircuitSize(PlonkError):
    def __init__(self, got: int, expected: int):
        super().__init__(f"circuit size mismatch: got {got}, expected {expected}")
        self.got, self.expected = got, expected


class CircuitUnsatisfied(PlonkError):
    """The witness does not satisfy the circuit (quotient degree overflow or
    debugger-detected identity failure)."""


class ProofVerificationError(PlonkError):
    """Final pairing check (or a transcript/PI consistency check) failed."""


class InconsistentPublicInputsLen(PlonkError):
    def __init__(self, got: int, expected: int):
        super().__init__(f"public input count mismatch: got {got}, expected {expected}")
        self.got, self.expected = got, expected


class UnsupportedProvingVersion(PlonkError):
    pass


class DegreeIsZero(PlonkError):
    pass


class TruncatedDegreeTooLarge(PlonkError):
    pass


class InvalidBytes(PlonkError):
    pass


class BitsOverflow(PlonkError):
    pass


class PointMalformed(PlonkError):
    pass


class NotSupportedBitSize(PlonkError):
    pass


class LegacyProvingDisabled(PlonkError):
    """V2 proving requested without enabling config.legacy_proving
    (reference `legacy-proving` Cargo feature, prover.rs:266-287)."""


class InvalidCompressedCircuit(PlonkError):
    """Compressed circuit bytes failed to inflate/unpack/validate."""
