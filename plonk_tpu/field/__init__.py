"""Field arithmetic: host reference (Python int) + device limb engine (JAX).

FR: BLS12-381 scalar field (the PLONK circuit field), 16 x 16-bit limbs.
FP: BLS12-381 base field (G1/G2 coordinates), 24 x 16-bit limbs.
"""

from . import params
from .mont import Field, int_to_limbs, limbs_to_int, W, MASK

FR = Field(params.R_MOD, 16, name="Fr")
FP = Field(params.P_MOD, 24, name="Fp")

__all__ = ["params", "Field", "FR", "FP", "int_to_limbs", "limbs_to_int", "W", "MASK"]
