from .constraint import Constraint, Witness
from .composer import Composer, Circuit
from .permutation import Permutation
from .ecc_types import WitnessPoint, TorsionFreeWitnessPoint
from . import gadgets  # noqa: F401  (attaches the gadget methods to Composer)

__all__ = [
    "Constraint", "Witness", "Composer", "Circuit", "Permutation",
    "WitnessPoint", "TorsionFreeWitnessPoint",
]
