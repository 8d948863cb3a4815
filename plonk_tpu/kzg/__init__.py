from . import poly
from .srs import (
    PublicParameters, CommitKey, OpeningKey, Commitment, ADDED_BLINDING_DEGREE,
)
from .opening import KzgProof, AggregateProof, batch_check, open_single

__all__ = [
    "poly", "PublicParameters", "CommitKey", "OpeningKey", "Commitment",
    "ADDED_BLINDING_DEGREE",
    "KzgProof", "AggregateProof", "batch_check", "open_single",
]
