from .widgets import ProofEvaluations
from .keys import ProverKey, VerifierKey
from .proof import Proof

__all__ = ["ProofEvaluations", "ProverKey", "VerifierKey", "Proof"]
