"""Native (C++) proof verification fast path.

Drives native/plonk_host.cpp `plonk_verify`: the full transcript replay
(STROBE-128/Merlin), widget scalars, the [D]/[F]/[E] batched-opening MSM and
the final 2-pairing check run in one C call — the reference's ~2.8 ms
circuit-size-independent verify (proof.rs:218-489) re-created host-side.
The Python implementation in proof_system/proof.py stays as the oracle
(PLONK_NO_NATIVE=1 forces it; tests cross-check both).
"""

from __future__ import annotations

import ctypes

import numpy as np

from .field import params
from .proof_system.proof import Proof, COMMITMENT_ORDER

R = params.R_MOD

_VERIFY_READY = False
_SELECTOR_SIGMA = (
    "q_m", "q_l", "q_r", "q_o", "q_f", "q_c",
    "q_arith", "q_range", "q_logic", "q_fixed_group_add",
    "q_variable_group_add", "s_sigma_1", "s_sigma_2", "s_sigma_3", "s_sigma_4",
)


def _lib():
    global _VERIFY_READY
    from . import native

    lib = native.get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "plonk_verify"):
        return None
    if not _VERIFY_READY:
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.plonk_verify.argtypes = [
            u8p, u8p, u8p, u8p, u8p, u8p, u8p, u8p, u8p,
            u8p, u8p, ctypes.c_long, ctypes.c_uint64, u8p, u8p, ctypes.c_int,
        ]
        lib.plonk_verify.restype = ctypes.c_int
        if not native._pairing_setup(lib):
            return None
        _VERIFY_READY = True
    return lib


def _u8(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=np.uint8).copy()


def _p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _affine96(point) -> tuple[bytes, int]:
    if point.inf:
        return b"\x00" * 96, 1
    return point.x.to_bytes(48, "little") + point.y.to_bytes(48, "little"), 0


def _g2_192(point) -> bytes:
    return (point.x.c0.to_bytes(48, "little")
            + point.x.c1.to_bytes(48, "little")
            + point.y.c0.to_bytes(48, "little")
            + point.y.c1.to_bytes(48, "little"))


def export_strobe(transcript) -> bytes:
    """200-byte Keccak state + pos + pos_begin + cur_flags (the layout
    plonk_verify resumes from)."""
    s = transcript.strobe
    return bytes(s.state) + bytes([s.pos, s.pos_begin, s.cur_flags])


class NativeVerifierContext:
    """Per-Verifier cached buffers: seeded transcript state, vk + opening-key
    affine encodings, domain constants."""

    def __init__(self, verifier_key, opening_key, size: int):
        from .ntt import EvaluationDomain

        vk_aff = b""
        vk_inf = []
        for name in _SELECTOR_SIGMA:
            aff, inf = _affine96(verifier_key.commitments[name].point)
            vk_aff += aff
            vk_inf.append(inf)
        self.vk_aff = _u8(vk_aff)
        self.vk_inf = np.asarray(vk_inf, dtype=np.uint8)
        g_aff, _ = _affine96(opening_key.g)
        self.g_aff = _u8(g_aff)
        self.h_aff = _u8(_g2_192(opening_key.h))
        self.xh_aff = _u8(_g2_192(opening_key.x_h))
        d = EvaluationDomain.get(size)
        self.n = size
        self.omega32 = _u8(d.omega.to_bytes(32, "little"))
        self.n_inv32 = _u8(d.n_inv.to_bytes(32, "little"))
        self.omega_inv = d.omega_inv
        self._winv_cache: dict[tuple[int, ...], np.ndarray] = {}
        self.seeded: dict[int, bytes] = {}  # version.value -> strobe203

    def winv(self, indexes) -> np.ndarray:
        key = tuple(indexes)
        w = self._winv_cache.get(key)
        if w is None:
            blob = b"".join(
                pow(self.omega_inv, i, R).to_bytes(32, "little")
                for i in indexes)
            w = _u8(blob) if blob else np.zeros(0, dtype=np.uint8)
            self._winv_cache[key] = w
        return w


def native_verify(ctx: NativeVerifierContext, strobe203: bytes, proof: Proof,
                  public_inputs, public_input_indexes,
                  legacy: bool) -> bool | None:
    """Returns True/False (accept/reject) or None when the native path is
    unavailable (caller falls back to the Python oracle)."""
    lib = _lib()
    if lib is None:
        return None
    proof_bytes = _u8(proof.to_bytes())
    paff = b""
    pinf = []
    for name in COMMITMENT_ORDER:
        aff, inf = _affine96(getattr(proof, name).point)
        paff += aff
        pinf.append(inf)
    proof_aff = _u8(paff)
    proof_inf = np.asarray(pinf, dtype=np.uint8)
    npi = len(public_inputs)
    pi_blob = b"".join((int(v) % R).to_bytes(32, "little")
                       for v in public_inputs)
    pis = _u8(pi_blob) if pi_blob else np.zeros(1, dtype=np.uint8)
    winv = ctx.winv(public_input_indexes)
    if winv.size == 0:
        winv = np.zeros(1, dtype=np.uint8)
    st = _u8(strobe203)
    r = lib.plonk_verify(
        _p(st), _p(proof_bytes), _p(proof_aff), _p(proof_inf),
        _p(ctx.vk_aff), _p(ctx.vk_inf), _p(ctx.g_aff), _p(ctx.h_aff),
        _p(ctx.xh_aff), _p(pis), _p(winv), npi, ctx.n,
        _p(ctx.omega32), _p(ctx.n_inv32), 1 if legacy else 0,
    )
    if r < 0:
        return None
    return bool(r)
