from . import bls12_381, jubjub
from .bls12_381 import (G1, G2, Fp2, Fp6, Fp12, pairing, multi_pairing,
                        multi_pairing_is_one)
from .jubjub import JubjubPoint, GENERATOR as JUBJUB_GENERATOR

__all__ = [
    "bls12_381", "jubjub", "G1", "G2", "Fp2", "Fp6", "Fp12",
    "pairing", "multi_pairing", "multi_pairing_is_one", "JubjubPoint", "JUBJUB_GENERATOR",
]
