from .constraint import Constraint, Witness
from .composer import Composer, Circuit
from .permutation import Permutation

__all__ = ["Constraint", "Witness", "Composer", "Circuit", "Permutation"]
