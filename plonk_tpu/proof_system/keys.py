"""ProverKey (device-resident tensors) and VerifierKey (host commitments).

Counterparts of /root/reference/src/proof_system/widget.rs:
- The reference's ProverKey stores per-widget (Polynomial, Evaluations-on-8n)
  pairs; ours keeps ONE stacked coefficient tensor and ONE stacked 8n-coset
  tensor per group, device-resident, so the prover never re-uploads keys.
- VerifierKey = raw constraint count + 15 commitments, with the byte layout and
  transcript seeding order of widget.rs:84-263 (including the legacy
  sigma_1-in-sigma_4 seeding quirk kept for V1/V2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import FR, params
from ..kzg import Commitment

R = params.R_MOD

SELECTOR_ORDER = (
    "q_m", "q_l", "q_r", "q_o", "q_f", "q_c",
    "q_arith", "q_range", "q_logic", "q_fixed_group_add",
    "q_variable_group_add",
)
SIGMA_ORDER = ("s_sigma_1", "s_sigma_2", "s_sigma_3", "s_sigma_4")

# VerifierKey byte/transcript orders (widget.rs:93-108 / :222-246)
VK_SERDE_ORDER = (
    "q_m", "q_l", "q_r", "q_o", "q_f", "q_c", "q_arith",
    "q_logic", "q_range", "q_fixed_group_add", "q_variable_group_add",
    "s_sigma_1", "s_sigma_2", "s_sigma_3", "s_sigma_4",
)
VK_SEED_ORDER = (
    "q_m", "q_l", "q_r", "q_o", "q_c", "q_f", "q_arith",
    "q_range", "q_logic", "q_variable_group_add", "q_fixed_group_add",
    "s_sigma_1", "s_sigma_2", "s_sigma_3", "s_sigma_4",
)


class ProverKey:
    """Device tensors for the proving hot path.

    coeffs:   (L, 15, n)  selector+sigma coefficient polys (SELECTOR_ORDER
              then SIGMA_ORDER)
    evals8:   (L, 15, 8n) their coset evaluations
    linear8:  (L, 8n) coset evals of X
    l1_8:     (L, 8n) coset evals of L_1 (unscaled)
    vh_inv8:  (L, 8n) inverse vanishing evals (v_h_coset_8n inverted once)
    sigma_lagrange: (L, 4, n) sigma values in evaluation form (grand product)
    omega_pows: (L, n) Montgomery powers of omega (grand product id side)
    """

    def __init__(self, n, coeffs, evals8, linear8, l1_8, vh_inv8,
                 sigma_lagrange, omega_pows):
        self.n = n
        self.coeffs = coeffs
        self.evals8 = evals8
        self.linear8 = linear8
        self.l1_8 = l1_8
        self.vh_inv8 = vh_inv8
        self.sigma_lagrange = sigma_lagrange
        self.omega_pows = omega_pows

    def coeff(self, name: str):
        return self.coeffs[:, _PK_INDEX[name]]

    def eval8(self, name: str):
        return self.evals8[:, _PK_INDEX[name]]

    def sel_evals8(self) -> dict:
        return {name: self.eval8(name) for name in SELECTOR_ORDER}

    def sigma_evals8(self):
        i = _PK_INDEX["s_sigma_1"]
        return self.evals8[:, i : i + 4]

    # -- serde (counterpart widget.rs:338-609 var-bytes) -----------------------

    def to_var_bytes(self) -> bytes:
        host = np.asarray(self.coeffs)
        out = [int(self.n).to_bytes(8, "little")]
        flat = FR.unpack(host.reshape(FR.L, -1))
        mont_inv = pow(FR.R, -1, R)
        for v in flat:
            out.append((v * mont_inv % R).to_bytes(32, "little"))
        return b"".join(out)

    @staticmethod
    def from_var_bytes(data: bytes) -> "ProverKey":
        """Checked deserialization (reference widget.rs:440-609).

        The reference validates the announced 8n domain (power of two,
        no overflow), per-block lengths, and rejects zero vanishing evals;
        here the 8n tables are RECOMPUTED from the coefficient tensors, so
        domain mismatches and zero-vanishing poison are impossible by
        construction — the checked surface is n, the buffer length, and
        scalar canonicality."""
        from ..compiler import build_prover_key_tensors  # cycle-free at runtime
        from ..utils.errors import NotEnoughBytes, InvalidBytes

        if len(data) < 8:
            raise NotEnoughBytes("prover key header truncated")
        n = int.from_bytes(data[:8], "little")
        # 8n must be a power of two and representable (widget.rs:444-452)
        if n <= 0 or n > (1 << 40) or (n & (n - 1)) != 0:
            raise InvalidBytes("prover key size n must be a power of two")
        count = 15 * n
        if len(data) < 8 + 32 * count:
            raise NotEnoughBytes("prover key polynomial block truncated")
        vals = [
            int.from_bytes(data[8 + 32 * i : 8 + 32 * (i + 1)], "little")
            for i in range(count)
        ]
        if any(v >= R for v in vals):
            from ..utils.errors import BlsScalarMalformed

            raise BlsScalarMalformed("non-canonical scalar in prover key")
        coeffs = FR.pack([v * FR.R % R for v in vals], shape=(15, n))
        return build_prover_key_tensors(n, jnp.asarray(coeffs))


_PK_INDEX = {name: i for i, name in enumerate(SELECTOR_ORDER + SIGMA_ORDER)}


class VerifierKey:
    """n (raw constraint count) + 15 commitments. Reference widget.rs:38-263."""

    # the reference sizes its buffer for 20 commitments and zero-pads
    SIZE = 8 + 20 * 48

    def __init__(self, n: int, commitments: dict[str, Commitment]):
        assert set(commitments) == set(VK_SERDE_ORDER)
        self.n = n
        self.commitments = commitments

    def __getattr__(self, name):
        try:
            return object.__getattribute__(self, "commitments")[name]
        except KeyError:
            raise AttributeError(name)

    def __eq__(self, o):
        return (
            isinstance(o, VerifierKey)
            and self.n == o.n
            and self.commitments == o.commitments
        )

    def seed_transcript(self, transcript, bind_s_sigma_4: bool = True):
        """Append the circuit description (widget.rs:211-250). The legacy
        variant re-appends s_sigma_1 in the s_sigma_4 slot (historic quirk)."""
        for name in VK_SEED_ORDER:
            comm = self.commitments[name]
            if name == "s_sigma_4" and not bind_s_sigma_4:
                comm = self.commitments["s_sigma_1"]
            transcript.append_commitment(name.encode(), comm)
        transcript.circuit_domain_sep(self.n)

    def seed_transcript_legacy(self, transcript):
        self.seed_transcript(transcript, bind_s_sigma_4=False)

    def to_bytes(self) -> bytes:
        out = int(self.n).to_bytes(8, "little")
        out += b"".join(self.commitments[k].to_bytes() for k in VK_SERDE_ORDER)
        return out + bytes(self.SIZE - len(out))

    @staticmethod
    def from_bytes(data: bytes) -> "VerifierKey":
        """Checked: every commitment point validated (widget.rs:113-199)."""
        from ..utils.errors import NotEnoughBytes

        if len(data) < VerifierKey.SIZE:
            raise NotEnoughBytes("verifier key is %d bytes" % VerifierKey.SIZE)
        n = int.from_bytes(data[:8], "little")
        comms = {}
        for i, name in enumerate(VK_SERDE_ORDER):
            comms[name] = Commitment.from_bytes(data[8 + 48 * i : 8 + 48 * (i + 1)])
        return VerifierKey(n, comms)
