"""Residue-number-system (RNS) engine for Fp — the TPU-native bigint design.

The limb-Montgomery engine (mont.py / pallas_mont.py) spends its time on VPU
carry chains: every multiply is a 24x24 schoolbook convolution plus three
Kogge-Stone carry resolves.  RNS removes the carries entirely: an Fp element
is its residues modulo ~25 coprime 16-bit pseudo-Mersenne primes per base
(m = 2^16 - eps, eps < 2^11), so

  * multiplication / addition are CHANNEL-WISE u32 ops (VPU, no carries),
  * modular reduction per channel is 2-3 shift-mul-add folds (2^16 = eps),
  * the only cross-channel work — Montgomery base extension — is a small
    CONSTANT matrix multiply, which goes to the MXU as exact 8-bit-chunk
    bf16 matmuls (the same trick as pallas_mont.conv_const_matrices).

This is the classic Bajard-Kawamura "Cox-Rower" RNS Montgomery construction
(two bases A, B with M = prod(A) ~ 2^400 > 2^18 * p), with the floating-point
kappa estimator computed in f32 (error < 2^-14, offsets beta = ±2^-11).

Montgomery form here is the M-RESIDUE: a stored value x~ represents
x = x~ * M^{-1} mod p, so mul(x~, y~) = x~ y~ M^{-1} keeps the form closed.
Channel residues are REDUNDANT: values live in [0, 2^16), not [0, m); every
identity below is stable under that (see _fold notes).

Value-bound discipline (checked by tests/test_rns.py::test_bound_discipline):
mul inputs may be any a < alpha*p, b < beta*p with alpha*beta <= 2^17; the
output is always < 3p.  Curve formulas (pallas_rns.py) keep running values
< 7p, sums < ~200p, products alpha*beta < ~12000 — far inside the margin.

Counterpart of the reference's fixed 384-bit Fp arithmetic in dusk-bls12_381
(consumed via src/commitment_scheme/kzg10/key.rs MSMs); the reference has no
RNS — this design exists because TPUs have no 64-bit scalar ALUs but do have
an 8x128 VPU and a 128x128 MXU.
"""

from __future__ import annotations

import functools

import numpy as np

MASK16 = (1 << 16) - 1
K = 25          # channels per base
CH = 2 * K      # total channels (base A ++ base B)
EPS_MAX = 1 << 11


def _gen_primes(count: int) -> list[int]:
    """Deterministic pseudo-Mersenne 16-bit primes, descending from 2^16."""
    out = []
    m = (1 << 16) - 1
    while len(out) < count:
        for d in range(3, 256, 2):
            if d * d > m:
                out.append(m)
                break
            if m % d == 0:
                break
        m -= 2
        if (1 << 16) - m > EPS_MAX:  # pragma: no cover
            raise RuntimeError("not enough pseudo-Mersenne primes")
    return out


def _crt(vals, mods, consts=None) -> int:
    if consts is None:
        M = 1
        for m in mods:
            M *= int(m)
        consts = (M, [((M // int(m)) * pow(M // int(m), -1, int(m)), int(m))
                      for m in mods])
    M, rows = consts
    x = 0
    for v, (c, m) in zip(vals, rows):
        x += (int(v) % m) * c
    return x % M


def _chunk_matrix(C: np.ndarray) -> np.ndarray:
    """(R, I) u32 matrix with entries < 2^16 -> (3R, 2I) bf16 block matrix

        [[Clo, 0], [Chi, Clo], [0, Chi]]

    so that  M3 @ [xlo; xhi]  stacks [y00; ymid; y11] with
    y = y00 + ymid*2^8 + y11*2^16 (all sums < #terms * 2^16 < 2^24, exact
    in f32 accumulation).  One MXU dot per base extension."""
    import jax.numpy as jnp

    R, I = C.shape
    lo = (C & 0xFF).astype(np.float32)
    hi = ((C >> 8) & 0xFF).astype(np.float32)
    M3 = np.zeros((3 * R, 2 * I), np.float32)
    M3[0:R, 0:I] = lo
    M3[R:2 * R, 0:I] = hi
    M3[R:2 * R, I:2 * I] = lo
    M3[2 * R:3 * R, I:2 * I] = hi
    return M3.astype(jnp.bfloat16)


class RNSParams:
    """All constants for one prime p.  Everything numpy/host-side; device
    code receives these as packed kernel operands (see pallas_rns.py)."""

    # f32 kappa-estimator offsets.  Measured worst-case estimator error is
    # ~2^-19 (25 terms, each with 2 roundings at <= 2^-24); 2^-11 leaves
    # three orders of margin.  ext1 uses -beta (under-floor: kappa_hat in
    # {kappa-1, kappa}, so q_hat in {q, q+M} < 2M — absorbed by the r' < 3p
    # bound).  ext2 uses +beta (exact: the extended value is < 7p << M', so
    # its fractional part f < 2^-13 + beta < 1 and > 0 cannot straddle an
    # integer).  The +1 kappa bias keeps the matmul input row non-negative.
    BETA = 2.0 ** -11

    def __init__(self, p: int, k: int = K):
        self.p = p
        self.k = k
        primes = _gen_primes(2 * k)
        self.mods = np.array(primes, np.uint32)          # (2k,)
        self.eps = (np.uint32(1 << 16) - self.mods).astype(np.uint32)
        self.A = [int(m) for m in self.mods[:k]]
        self.B = [int(m) for m in self.mods[k:]]
        self.M = 1
        for m in self.A:
            self.M *= m
        self.M2 = 1
        for m in self.B:
            self.M2 *= m
        assert self.M > (1 << 18) * p and self.M2 > (1 << 18) * p

        A, B, M, M2 = self.A, self.B, self.M, self.M2
        # mul constants -------------------------------------------------
        # xi1 = t_A * (-p^{-1} * (M/m_i)^{-1}) mod m_i   (one premul)
        self.c_xi1 = np.array(
            [(pow(-p, -1, m) * pow(M // m, -1, m)) % m for m in A],
            np.uint32)
        self.p_mod_B = np.array([p % m for m in B], np.uint32)
        self.minv_B = np.array([pow(M % m, -1, m) for m in B], np.uint32)
        # xi2 = r'_B * (M2/m'_j)^{-1} mod m'_j
        self.c_xi2 = np.array(
            [pow(M2 // m, -1, m) % m for m in B], np.uint32)
        # ext1: A -> B.  inputs: xi (k rows) ++ (kappa_hat + 1) (1 row).
        # row i: (M/m_i) mod m'_j ; row k: (-M) mod m'_j ; additive
        # constant +M mod m'_j compensates the +1 bias.
        C1 = np.zeros((k + 1, k), np.uint32)
        for i, mi in enumerate(A):
            Mi = M // mi
            for j, mj in enumerate(B):
                C1[i, j] = Mi % mj
        for j, mj in enumerate(B):
            C1[k, j] = (-M) % mj
        self.ext1_mat = _chunk_matrix(C1.T.copy())        # (3k, 2(k+1))
        self.ext1_bias = np.array([M % m for m in B], np.uint32)
        self.inv_m_A = (1.0 / self.mods[:k].astype(np.float64)).astype(
            np.float32)
        # ext2: B -> A
        C2 = np.zeros((k + 1, k), np.uint32)
        for j, mj in enumerate(B):
            Mj = M2 // mj
            for i, mi in enumerate(A):
                C2[j, i] = Mj % mi
        for i, mi in enumerate(A):
            C2[k, i] = (-M2) % mi
        self.ext2_mat = _chunk_matrix(C2.T.copy())
        self.ext2_bias = np.array([M2 % m for m in A], np.uint32)
        self.inv_m_B = (1.0 / self.mods[k:].astype(np.float64)).astype(
            np.float32)
        # curve-formula constants --------------------------------------
        # subtraction offsets c*p (sub(a, b, c) = a + (c*p - b), exact
        # non-negative integers), the M-residue of 1 (for mixed adds), and
        # limb->channel conversion (2^16l mod m_c) for table building.
        self.sub_cp = {
            c: np.array([(c * p) % int(m) for m in self.mods], np.uint32)
            for c in (4, 8, 16, 32, 64, 128, 256)}
        self.one_mres = np.array(
            [(M % p) % int(m) for m in self.mods], np.uint32)
        # precomputed CRT rows for decode() — the per-commit host finalize
        # is on the prover's critical path 5x per prove
        self._crt_A = (M, [((M // m) * pow(M // m, -1, m), m) for m in A])
        self._minv_p = pow(M, -1, p)
        self.m_mod_p = M % p  # multiply by this (plain) in limb-Montgomery
        #   domain to turn xR (limb form) into x*M mod p (plain limbs)
        L = 24
        conv = np.zeros((2 * k, L), np.uint32)            # out=channels, in=limbs
        for l in range(L):
            for c, m in enumerate(self.mods):
                conv[c, l] = pow(2, 16 * l, int(m))
        self.limb_mat = _chunk_matrix(conv)               # (6k, 2L)
        # recon sum bound for limb->channel conversion and the extensions:
        # y00 + ymid*2^8 + y11*eps + bias must stay < 2^32 (u32 recon)
        max_eps = int(self.eps.max())
        for terms in (k + 1, L):
            y00 = terms * 255 * 255
            ymid = 2 * terms * 255 * 255
            bound = y00 + ymid * (1 << 8) + y00 * max_eps + (1 << 16)
            assert bound < (1 << 32), "ext recon overflow"

    # -- host-exact reference ops (tests + final CRT readback) ----------

    def to_rns(self, x: int) -> np.ndarray:
        return np.array([x % int(m) for m in self.mods], np.uint32)

    def from_rns(self, vec, base: str = "A") -> int:
        k = self.k
        if base == "A":
            return _crt(vec[:k], self.mods[:k])
        return _crt(vec[k:], self.mods[k:])

    def encode(self, x: int) -> np.ndarray:
        """x mod p -> M-residue channels."""
        return self.to_rns((x * self.M) % self.p)

    def decode(self, vec) -> int:
        """Channels (value < M, any multiple-of-p offset) -> x mod p."""
        return (self.from_rns(vec, "A") * pow(self.M, -1, self.p)) % self.p

    def mul_ref(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Exact host oracle of the device mul (incl. kappa estimator)."""
        k = self.k
        a = a.astype(np.uint64)
        b = b.astype(np.uint64)
        mods = self.mods.astype(np.uint64)
        t = np.array([_fold_full_host(int(v), int(m))
                      for v, m in zip(a * b, mods)], np.uint64)
        xi1 = np.array(
            [_fold_full_host(int(t[i]) * int(self.c_xi1[i]), self.A[i])
             for i in range(k)], np.uint64)
        qhat, _ = self._ext_ref(xi1, 1)
        s = [(int(qhat[j]) * int(self.p_mod_B[j]) + int(t[k + j]))
             for j in range(k)]
        rB = np.array(
            [_fold_full_host(
                _fold_full_host(s[j], self.B[j]) * int(self.minv_B[j]),
                self.B[j]) for j in range(k)], np.uint64)
        xi2 = np.array(
            [_fold_full_host(int(rB[j]) * int(self.c_xi2[j]), self.B[j])
             for j in range(k)], np.uint64)
        rA, _ = self._ext_ref(xi2, 2)
        return np.concatenate([rA, rB]).astype(np.uint32)

    def _ext_ref(self, xi, which: int):
        """Host mirror of the device base extension, f32 kappa included."""
        k = self.k
        if which == 1:
            inv, mat, bias, beta = (self.inv_m_A, self.ext1_mat,
                                    self.ext1_bias, -self.BETA)
            tgt = self.B
        else:
            inv, mat, bias, beta = (self.inv_m_B, self.ext2_mat,
                                    self.ext2_bias, self.BETA)
            tgt = self.A
        fr = np.float32(0.0)
        for i in range(k):
            fr = np.float32(fr + np.float32(np.float32(xi[i]) * inv[i]))
        kap1 = int(np.floor(fr + np.float32(beta))) + 1
        assert 0 <= kap1 <= 2 * k + 1
        x = np.concatenate([xi.astype(np.uint64), [np.uint64(kap1)]])
        xlo = (x & 0xFF).astype(np.float64)
        xhi = ((x >> np.uint64(8)) & 0xFF).astype(np.float64)
        m3 = mat.astype(np.float64)
        y3 = m3 @ np.concatenate([xlo, xhi])
        y00, ymid, y11 = y3[:k], y3[k:2 * k], y3[2 * k:]
        out = np.zeros(k, np.uint64)
        for j in range(k):
            m = int(tgt[j])
            eps = (1 << 16) - m
            acc = (int(y00[j]) + (int(ymid[j]) << 8)
                   + int(y11[j]) * eps + int(bias[j]))
            assert acc < 1 << 32, "ext recon overflow"
            out[j] = _fold_full_host(acc, m)
        return out, kap1


def _fold_full_host(x: int, m: int) -> int:
    """Host mirror of the device channel fold: x < 2^32 -> [0, 2^16)."""
    eps = (1 << 16) - m
    for _ in range(5):
        if x < (1 << 16):
            return x
        x = (x & MASK16) + (x >> 16) * eps
    assert x < (1 << 16)
    return x


@functools.cache
def get_params(p: int) -> RNSParams:
    return RNSParams(p)
