"""Golden byte-level fixtures for the A.1 transcript label schedule.

Pins every challenge drawn along the reference prover's exact transcript
schedule (/root/reference/src/transcript.rs:61-146, prover.rs:326-620;
SURVEY A.1) for a fixed synthetic circuit description: any drift in STROBE,
Merlin framing, label bytes, append order, commitment encoding or the
from_bytes_wide reduction fails byte-for-byte with the stored constants.

The fixed values are self-generated (the Rust toolchain is not available to
emit dusk's own bytes) — the STROBE layer itself is pinned against the
upstream merlin crate vector in test_transcript.py:33, so these fixtures
extend that anchor through the full PLONK label schedule.
"""

import hashlib

from plonk_tpu.curve import G1
from plonk_tpu.field import params
from plonk_tpu.kzg import Commitment
from plonk_tpu.proof_system.keys import VerifierKey, VK_SERDE_ORDER
from plonk_tpu.transcript import Transcript

R = params.R_MOD


def _fixed_verifier_key() -> VerifierKey:
    """15 distinct, deterministic commitments: [k+1]G in serde order."""
    g = G1.generator()
    comms = {name: Commitment(g.mul(k + 1))
             for k, name in enumerate(VK_SERDE_ORDER)}
    return VerifierKey(42, comms)


def _schedule_challenges(version3: bool = True) -> list[tuple[str, int]]:
    """Replay the A.1 schedule with fixed inputs; return drawn challenges."""
    g = G1.generator()
    vk = _fixed_verifier_key()
    t = Transcript(b"golden")
    t.circuit_domain_sep(42)
    if version3:
        vk.seed_transcript(t)
    else:
        vk.seed_transcript_legacy(t)

    out = []
    for pi in (5, 7):
        t.append_scalar(b"pi", pi)
    for k, name in enumerate((b"a_comm", b"b_comm", b"c_comm", b"d_comm")):
        t.append_commitment(name, Commitment(g.mul(100 + k)))
    beta = t.challenge_scalar(b"beta")
    out.append(("beta", beta))
    t.append_scalar(b"beta", beta)
    out.append(("gamma", t.challenge_scalar(b"gamma")))
    t.append_commitment(b"z_comm", Commitment(g.mul(200)))
    out.append(("alpha", t.challenge_scalar(b"alpha")))
    out.append(("range_sep", t.challenge_scalar(b"range separation challenge")))
    out.append(("logic_sep", t.challenge_scalar(b"logic separation challenge")))
    out.append(("fixed_sep",
                t.challenge_scalar(b"fixed base separation challenge")))
    out.append(("var_sep",
                t.challenge_scalar(b"variable base separation challenge")))
    for k, name in enumerate((b"t_low_comm", b"t_mid_comm", b"t_high_comm",
                              b"t_fourth_comm")):
        t.append_commitment(name, Commitment(g.mul(300 + k)))
    out.append(("z_challenge", t.challenge_scalar(b"z_challenge")))
    for k, name in enumerate((
        "a_eval", "b_eval", "c_eval", "d_eval",
        "s_sigma_1_eval", "s_sigma_2_eval", "s_sigma_3_eval",
        "z_eval", "a_w_eval", "b_w_eval", "d_w_eval",
        "q_arith_eval", "q_c_eval", "q_l_eval", "q_r_eval",
    )):
        t.append_scalar(name.encode(), 1000 + k)
    out.append(("v_challenge", t.challenge_scalar(b"v_challenge")))
    out.append(("v_w_challenge", t.challenge_scalar(b"v_w_challenge")))
    for k, name in enumerate((b"w_z_chall_comm", b"w_z_chall_w_comm")):
        t.append_commitment(name, Commitment(g.mul(400 + k)))
    out.append(("u_challenge", t.challenge_scalar(b"u_challenge")))
    return out


# sha256 over "name=hex32le\n" lines of every drawn challenge — regenerate
# ONLY after deliberately changing the transcript protocol (see
# tools/regen_golden.py)
GOLDEN_V3_DIGEST = None  # filled below by the pinned constant
GOLDEN_V3_DIGEST = (
    "a47173914e8c24e7e9943c22073499748fafa6a6f54d3f28e98d7a177df179c4"
)
GOLDEN_LEGACY_DIGEST = (
    "b88c756ace52fbc1662bbe32b29074237cab0ddbbaf9a91aeae20695b038b423"
)
# the first challenge drawn, pinned raw so a digest-level failure has a
# human-readable anchor
GOLDEN_V3_BETA = "b4626b60fb3656876c54db72a2f4afe34cde03a951ffa0f8b418c03731e8890d"


def _digest(challenges) -> str:
    h = hashlib.sha256()
    for name, v in challenges:
        h.update(f"{name}={v.to_bytes(32, 'little').hex()}\n".encode())
    return h.hexdigest()


def test_label_schedule_golden_v3():
    chals = _schedule_challenges(version3=True)
    assert [c[0] for c in chals] == [
        "beta", "gamma", "alpha", "range_sep", "logic_sep", "fixed_sep",
        "var_sep", "z_challenge", "v_challenge", "v_w_challenge",
        "u_challenge",
    ]
    assert chals[0][1].to_bytes(32, "little").hex() == GOLDEN_V3_BETA
    assert _digest(chals) == GOLDEN_V3_DIGEST


def test_label_schedule_golden_legacy():
    """Legacy seeding re-appends s_sigma_1 in the s_sigma_4 slot
    (widget.rs:216-220) — its challenge stream must differ from V3's."""
    chals = _schedule_challenges(version3=False)
    assert _digest(chals) == GOLDEN_LEGACY_DIGEST
    assert GOLDEN_LEGACY_DIGEST != GOLDEN_V3_DIGEST


def test_challenges_are_canonical():
    for _name, v in _schedule_challenges():
        assert 0 <= v < R
