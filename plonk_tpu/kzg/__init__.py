from . import poly
from .srs import (
    PublicParameters, CommitKey, OpeningKey, Commitment, ADDED_BLINDING_DEGREE,
)
from .opening import KzgProof, AggregateProof, batch_check, open_single
from .polynomial import Polynomial, Evaluations

__all__ = [
    "poly", "PublicParameters", "CommitKey", "OpeningKey", "Commitment",
    "ADDED_BLINDING_DEGREE",
    "KzgProof", "AggregateProof", "batch_check", "open_single",
    "Polynomial", "Evaluations",
]
