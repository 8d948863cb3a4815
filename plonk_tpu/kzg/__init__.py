from . import poly
from .srs import (
    PublicParameters, CommitKey, OpeningKey, Commitment, ADDED_BLINDING_DEGREE,
)

__all__ = [
    "poly", "PublicParameters", "CommitKey", "OpeningKey", "Commitment",
    "ADDED_BLINDING_DEGREE",
]
