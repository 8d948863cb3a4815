"""plonk_tpu — a TPU-native PLONK proving stack.

A from-scratch re-design of the capabilities of dusk-network/plonk (TurboPLONK
over BLS12-381 with KZG10, width-4 gates, 5 custom gate families, 4-wire copy
permutation, Merlin transcript) built for JAX/XLA on TPU: multi-limb Montgomery
field tensors, batched NTTs, a scatter-free Pippenger MSM, fused quotient
evaluation, and host-side graph building / Fiat-Shamir / pairing verification.

Public facade mirrors the reference prelude (/root/reference/src/prelude.rs).
"""

from .field import params, FR, FP
from .composer import (Composer, Constraint, Witness, Circuit,
                       WitnessPoint, TorsionFreeWitnessPoint)
from .kzg import PublicParameters, CommitKey, OpeningKey, Commitment
from .proof_system import Proof
from .curve import G1, G2, JubjubPoint, JUBJUB_GENERATOR
from .utils import errors
from .utils.errors import PlonkError

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: the compiler pulls in jitted machinery; keep import light
    if name in ("Compiler", "Prover", "Verifier", "PlonkVersion"):
        from . import compiler

        return getattr(compiler, name)
    raise AttributeError(name)


__all__ = [
    "params", "FR", "FP", "Composer", "Constraint", "Witness", "Circuit",
    "PublicParameters", "CommitKey", "OpeningKey", "Commitment", "Proof",
    "G1", "G2", "JubjubPoint", "JUBJUB_GENERATOR", "errors", "PlonkError",
    "WitnessPoint", "TorsionFreeWitnessPoint",
    "Compiler", "Prover", "Verifier", "PlonkVersion",
]
