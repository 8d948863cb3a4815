"""Framework error types — full parity with /root/reference/src/error.rs:17-121
(26 variants), grouped as in the reference.  All inherit PlonkError so user
code can catch one type; variants keep distinct classes so tests can assert
*exactly* which failure occurred (the soundness tier depends on this)."""


class PlonkError(Exception):
    """Base class for all framework errors."""


# -- FFT / domain ------------------------------------------------------------

class InvalidEvalDomainSize(PlonkError):
    def __init__(self, log_size: int, adicity: int):
        super().__init__(
            f"domain size 2^{log_size} exceeds two-adicity {adicity}")


# -- proof system ------------------------------------------------------------

class ProofVerificationError(PlonkError):
    """The final pairing (or an intermediate consistency) check failed."""


class CircuitInputsNotFound(PlonkError):
    pass


class UninitializedPIGenerator(PlonkError):
    pass


class InvalidPublicInputBytes(PlonkError):
    pass


class CircuitAlreadyPreprocessed(PlonkError):
    pass


class InvalidCircuitSize(PlonkError):
    def __init__(self, got: int, expected: int):
        super().__init__(f"circuit size mismatch: got {got}, expected {expected}")


class CircuitUnsatisfied(PlonkError):
    """The witness assignment violates a gate identity (quotient degree > 7n)."""


class InconsistentPublicInputsLen(PlonkError):
    def __init__(self, got: int, expected: int):
        super().__init__(f"expected {expected} public inputs, got {got}")


class PublicInputNotFound(PlonkError):
    pass


# -- polynomial / KZG ----------------------------------------------------------

class MismatchedPolyLen(PlonkError):
    pass


class DegreeIsZero(PlonkError):
    pass


class TruncatedDegreeTooLarge(PlonkError):
    pass


class TruncatedDegreeIsZero(PlonkError):
    pass


class PolynomialDegreeTooLarge(PlonkError):
    pass


class PolynomialDegreeIsZero(PlonkError):
    pass


class PairingCheckFailure(ProofVerificationError):
    pass


# -- bytes / serde --------------------------------------------------------------

class InvalidBytes(PlonkError, ValueError):
    """Also a ValueError so generic byte-level rejection handlers work
    (reference dusk_bytes::Error — BytesError variants map here)."""


class NotEnoughBytes(InvalidBytes):
    pass


class PointMalformed(InvalidBytes):
    pass


class BlsScalarMalformed(InvalidBytes):
    pass


class JubJubScalarMalformed(InvalidBytes):
    pass


class InvalidCompressedCircuit(PlonkError):
    """Compressed circuit bytes failed to inflate/unpack/validate."""


# -- Jubjub gadget preconditions --------------------------------------------------

class JubJubGeneratorNotPrimeOrder(PlonkError):
    pass


class JubJubPointNotTorsionFree(PlonkError):
    pass


class JubJubPointDegenerate(PlonkError):
    pass


class UnsupportedWNAF2k(PlonkError):
    pass


# -- composer / gadget misc ---------------------------------------------------------

class BitsOverflow(PlonkError):
    pass


class NotSupportedBitSize(PlonkError):
    pass


# -- versioning ------------------------------------------------------------------

class UnsupportedProvingVersion(PlonkError):
    pass


class LegacyProvingDisabled(PlonkError):
    """V2 proving requested without enabling config.legacy_proving
    (reference `legacy-proving` Cargo feature, prover.rs:266-287)."""
