"""Vectorized multi-limb Montgomery arithmetic for TPU (JAX/XLA).

Design (TPU-first, not a port):
- A field element batch is a uint32 tensor of shape ``(L, *batch)`` where axis 0
  holds 16-bit little-endian limbs.  Limbs-first layout keeps the (large) batch
  axes on the VPU lane/sublane dimensions; the limb axis is a short leading axis
  that XLA unrolls into registers.
- 16-bit limbs x uint32 accumulators: every partial product a_i*b_j < 2^32 fits
  a uint32, and deferred-carry column sums stay < 2L * 2^16 < 2^22, so the whole
  schoolbook + Montgomery (SOS) reduction is branch-free uint32 code — exactly
  the kind of wide elementwise program the VPU eats.
- All loops below are over the *limb* index (static, unrolled at trace time);
  the batch axes are pure SIMD.  No data-dependent control flow: jit-safe.

The reference delegates this layer to the `dusk-bls12_381` Rust crate
(4x u64 Montgomery form); see SURVEY.md section 2.2.  We re-derive it for
16-bit limbs because TPUs have no 64-bit scalar datapath.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

W = 16  # limb width in bits
MASK = np.uint32((1 << W) - 1)


def int_to_limbs(x: int, L: int) -> np.ndarray:
    """Python int -> (L,) uint32 array of 16-bit limbs (little-endian)."""
    return np.array([(x >> (W * i)) & 0xFFFF for i in range(L)], dtype=np.uint32)


def limbs_to_int(a) -> int:
    """(L,) limb vector -> Python int."""
    a = np.asarray(a)
    return sum(int(v) << (W * i) for i, v in enumerate(a))


class Field:
    """A prime field with vectorized Montgomery arithmetic over (L, *batch) tensors.

    Montgomery radix R = 2^(16*L).  Elements are kept in Montgomery form on
    device; `to_mont` / `from_mont` convert at the host boundary.
    """

    def __init__(self, modulus: int, limbs: int, name: str = "F"):
        assert modulus % 2 == 1 and modulus < (1 << (W * limbs))
        self.p = modulus
        self.L = limbs
        self.name = name
        self.R = (1 << (W * limbs)) % modulus
        self.R2 = (self.R * self.R) % modulus
        self.R3 = (self.R2 * self.R) % modulus
        # n0inv = -p^-1 mod 2^16
        self.n0inv = np.uint32((-pow(modulus, -1, 1 << W)) % (1 << W))
        # numpy constants; broadcast against (L, *batch) by appending axes lazily
        self.p_limbs = int_to_limbs(modulus, limbs)
        self.r2_limbs = int_to_limbs(self.R2, limbs)
        self.one_mont_limbs = int_to_limbs(self.R, limbs)  # 1 in Montgomery form
        self.zero_limbs = np.zeros(limbs, dtype=np.uint32)
        # p - 2 bit string, MSB first, for Fermat inversion ladder
        pm2 = modulus - 2
        nbits = modulus.bit_length()
        self.inv_exp_bits = np.array(
            [(pm2 >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32
        )

    # -- host <-> device conversion --------------------------------------------

    def _const(self, limbs: np.ndarray, ndim: int) -> jnp.ndarray:
        """Broadcast an (L,) constant against an (L, *batch) tensor of rank ndim."""
        return jnp.asarray(limbs.reshape((self.L,) + (1,) * (ndim - 1)))

    def pack(self, values, shape=None) -> np.ndarray:
        """Python ints (canonical, NOT Montgomery) -> (L, N) uint32 numpy array."""
        if isinstance(values, int):
            values = [values]
        n = len(values)
        buf = b"".join(int(v % self.p).to_bytes(2 * self.L, "little") for v in values)
        arr = np.frombuffer(buf, dtype="<u2").reshape(n, self.L).astype(np.uint32)
        arr = np.ascontiguousarray(arr.T)  # (L, N)
        if shape is not None:
            arr = arr.reshape((self.L,) + tuple(shape))
        return arr

    def unpack(self, arr) -> list[int]:
        """(L, *batch) limb tensor (canonical form) -> flat list of ints."""
        a = np.asarray(arr).reshape(self.L, -1).astype(np.uint64)
        out = np.zeros(a.shape[1], dtype=object)
        for i in range(self.L - 1, -1, -1):
            out = (out << W) + a[i].astype(object)
        return list(out)

    # -- low-level limb helpers -------------------------------------------------

    def _normalize_signed(self, t):
        """Carry-propagate an int32 limb tensor (values may be negative or >2^16).

        Returns (limbs uint32 16-bit, top carry int32 >= 0). Total value must be
        non-negative and < 2^(16*(L+1)).
        """
        L = t.shape[0]
        out = []
        carry = jnp.zeros_like(t[0])
        for i in range(L):
            v = t[i] + carry
            carry = v >> W  # arithmetic shift: floor division, handles negatives
            out.append((v & jnp.int32(0xFFFF)).astype(jnp.uint32))
        return jnp.stack(out), carry

    def _carry_prop_u32(self, t):
        """Carry-propagate a uint32 limb tensor; returns (16-bit limbs, top carry)."""
        L = t.shape[0]
        out = []
        carry = jnp.zeros_like(t[0])
        for i in range(L):
            v = t[i] + carry
            carry = v >> W
            out.append(v & MASK)
        return jnp.stack(out), carry

    def _csub_p(self, a, top):
        """Conditionally subtract p: returns a mod p given a + top*2^(16L) < 2p."""
        pl = self._const(self.p_limbs, a.ndim)
        borrow = jnp.zeros_like(a[0])
        out = []
        for i in range(self.L):
            d = a[i] + jnp.uint32(0x10000) - pl[i] - borrow
            out.append(d & MASK)
            borrow = jnp.uint32(1) - (d >> W)
        diff = jnp.stack(out)
        take = (top > 0) | (borrow == 0)
        return jnp.where(take, diff, a)

    # -- field ops (device, Montgomery form unless noted) -----------------------

    def add(self, a, b):
        s = a + b  # < 2^17 per limb
        s, top = self._carry_prop_u32(s)
        return self._csub_p(s, top)

    def sub(self, a, b):
        pl = self._const(self.p_limbs, a.ndim)
        t = a.astype(jnp.int32) + pl.astype(jnp.int32) - b.astype(jnp.int32)
        s, top = self._normalize_signed(t)
        return self._csub_p(s, top.astype(jnp.uint32))

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Montgomery product: returns a*b*R^-1 mod p. Inputs/outputs canonical (<p)."""
        L = self.L
        batch = a.shape[1:]
        nl = self._const(self.p_limbs, a.ndim)
        acc = jnp.zeros((2 * L + 1,) + tuple(batch), dtype=jnp.uint32)
        # schoolbook product with deferred carries (column sums < 2L * 2^16)
        for j in range(L):
            p = a * b[j]  # (L, *batch) uint32, each < 2^32
            acc = acc.at[j : j + L].add(p & MASK)
            acc = acc.at[j + 1 : j + L + 1].add(p >> W)
        # interleaved Montgomery reduction: clear limbs 0..L-1
        n0 = jnp.uint32(self.n0inv)
        for i in range(L):
            m = (acc[i] * n0) & MASK
            p = nl * m
            acc = acc.at[i : i + L].add(p & MASK)
            acc = acc.at[i + 1 : i + L + 1].add(p >> W)
            acc = acc.at[i + 1].add(acc[i] >> W)
        res, top = self._carry_prop_u32(acc[L : 2 * L + 1])
        # Montgomery guarantees the result < 2p < 2^(16L+1): row L holds the
        # single overflow bit and `top` is always 0.
        return self._csub_p(res[:L], res[L] + top)

    def square(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        return self.mul(a, self._const(self.r2_limbs, a.ndim))

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[0].set(1)
        return self.mul(a, one)

    def select(self, cond, a, b):
        """cond: (*batch,) bool -> elementwise a where cond else b."""
        return jnp.where(cond[None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def pow_bits(self, a, bits):
        """a^e where e is given as an MSB-first uint32 {0,1} vector (static length).

        Runs as a fori_loop (1 square + 1 conditional mul per bit) so the graph
        stays small.  `a` in Montgomery form; result in Montgomery form.
        """
        bits = jnp.asarray(bits, dtype=jnp.uint32)
        one = jnp.broadcast_to(
            self._const(self.one_mont_limbs, a.ndim), a.shape
        ).astype(jnp.uint32)

        def body(i, acc):
            acc = self.square(acc)
            return jnp.where(bits[i] == 1, self.mul(acc, a), acc)

        return lax.fori_loop(0, bits.shape[0], body, one)

    def inv(self, a):
        """Field inverse via Fermat: a^(p-2). Montgomery in/out. inv(0) = 0."""
        return self.pow_bits(a, self.inv_exp_bits)

    def batch_inverse(self, a, block: int = 256):
        """Batched inversion via Montgomery's trick, O(n) muls + one inversion.

        a: (L, n) Montgomery-form elements, all assumed nonzero.
        Uses a two-level blocked prefix product so the sequential depth is
        ~2*block + 2*(n/block) vectorized field muls.
        """
        L, n = a.shape
        # inclusive prefix products via blocked scan
        pref = self._prefix_mul(a, block=block)
        total = pref[:, -1]
        total_inv = self.inv(total[:, None])[:, 0]  # (L,)
        # suffix pass: inv(a_i) = pref_{i-1} * suffinv_i, where
        # suffinv_i = total_inv * prod_{j>i} a_j ... computed by reverse scan
        rev = jnp.flip(a, axis=1)
        suff_excl = jnp.concatenate(
            [jnp.broadcast_to(self._const(self.one_mont_limbs, 2), (L, 1)),
             self._prefix_mul(rev, block=block)[:, :-1]], axis=1)
        suff_excl = jnp.flip(suff_excl, axis=1)  # prod_{j>i} a_j
        pref_excl = jnp.concatenate(
            [jnp.broadcast_to(self._const(self.one_mont_limbs, 2), (L, 1)),
             pref[:, :-1]], axis=1)  # prod_{j<i} a_j
        return self.mul(self.mul(pref_excl, suff_excl), total_inv[:, None])

    def _prefix_mul(self, a, block: int = 256):
        """Inclusive prefix product along axis 1 (length must be static)."""
        L, n = a.shape
        if n <= block:
            return self._prefix_mul_scan(a)
        nb = -(-n // block)
        pad = nb * block - n
        ap = jnp.concatenate(
            [a, jnp.broadcast_to(self._const(self.one_mont_limbs, 2), (L, pad))],
            axis=1) if pad else a
        blocks = ap.reshape(L, nb, block)
        # within-block inclusive scan: sequential over `block`, vectorized over nb
        intra = self._prefix_mul_scan_axis2(blocks)
        # block totals -> exclusive prefix across blocks (recursive)
        totals = intra[:, :, -1]  # (L, nb)
        tot_pref = self._prefix_mul(totals, block=block)
        one = jnp.broadcast_to(self._const(self.one_mont_limbs, 2), (L, 1))
        tot_excl = jnp.concatenate([one, tot_pref[:, :-1]], axis=1)  # (L, nb)
        out = self.mul(intra, tot_excl[:, :, None])
        return out.reshape(L, nb * block)[:, :n]

    def _prefix_mul_scan(self, a):
        """(L, n) inclusive prefix product, sequential scan of length n."""
        L, n = a.shape

        def step(carry, x):
            y = self.mul(carry[:, None], x[:, None])[:, 0]
            return y, y

        init = jnp.broadcast_to(jnp.asarray(self.one_mont_limbs), (L,)).astype(jnp.uint32)
        _, ys = lax.scan(step, init, jnp.moveaxis(a, 1, 0))
        return jnp.moveaxis(ys, 0, 1)

    def _prefix_mul_scan_axis2(self, a):
        """(L, nb, block) inclusive prefix product along last axis (sequential)."""
        L, nb, block = a.shape

        def step(carry, x):
            y = self.mul(carry, x)
            return y, y

        init = jnp.broadcast_to(
            self._const(self.one_mont_limbs, 2), (L, nb)).astype(jnp.uint32)
        _, ys = lax.scan(step, init, jnp.moveaxis(a, 2, 0))
        return jnp.moveaxis(ys, 0, 2)
