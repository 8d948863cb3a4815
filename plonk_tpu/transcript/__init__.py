from .merlin import Transcript
from .strobe import Strobe128, keccak_f1600

__all__ = ["Transcript", "Strobe128", "keccak_f1600"]
