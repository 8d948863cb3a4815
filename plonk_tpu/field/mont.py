"""Vectorized multi-limb Montgomery arithmetic for TPU (JAX/XLA).

Design (TPU-first, not a port):
- A field element batch is a uint32 tensor of shape ``(L, *batch)`` where axis 0
  holds 16-bit little-endian limbs.  Limbs-first layout keeps the (large) batch
  axes on the VPU lane/sublane dimensions.
- 16-bit limbs x uint32 accumulators: partial products fit uint32 and
  deferred-carry column sums stay < 2L * 2^16 < 2^23 — branch-free VPU code.
- The schoolbook product is ONE broadcasted outer product; its anti-diagonal
  column sums are computed with a pad/flatten/reshape "skew" (three reshaping
  ops + one reduction) — no scatter, no dynamic-update-slice, tiny XLA graphs.
- Montgomery reduction is the *full-width* variant: m = (T mod R) * n' mod R
  with n' = -n^-1 mod R, then (T + m*n)/R — three convolutions total and zero
  sequential limb recurrences.
- Carry resolution is one ripple pass + a Kogge-Stone generate/propagate scan
  (log2 depth), exact for adversarial 0xFFFF chains.

The reference delegates this layer to the `dusk-bls12_381` Rust crate (4x u64
Montgomery form, carry chains; SURVEY.md section 2.2).  TPUs have no 64-bit
scalar datapath, so the algorithmics are re-derived for wide 16-bit SIMD.
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


def _shift_up(x, d: int = 1):
    """Shift limbs toward higher indices along axis 0 (zero fill)."""
    zeros = jnp.zeros((d,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([zeros, x[:-d]], axis=0)


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
        # full-width n' = -p^-1 mod 2^(16L)
        self.nprime_limbs = int_to_limbs(
            (-pow(modulus, -1, 1 << (W * limbs))) % (1 << (W * limbs)), limbs
        )
        self.p_limbs = int_to_limbs(modulus, limbs)
        self.p_comp_limbs = (MASK - self.p_limbs).astype(np.uint32)  # ~p limbwise
        self.r2_limbs = int_to_limbs(self.R2, limbs)
        self.one_mont_limbs = int_to_limbs(self.R, limbs)
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

    # -- low-level limb helpers --------------------------------------------------

    def _resolve(self, acc):
        """Carry-resolve a uint32 limb tensor (values < 2^28) to 16-bit limbs.

        Exact for arbitrary inputs: one ripple pass moves bulk carries one limb
        up, then a Kogge-Stone generate/propagate scan settles unit carries in
        log2 depth.  The top limb's outgoing carry is dropped (callers size the
        accumulator with a headroom limb so it is always zero, or explicitly
        want mod-2^(16K) behavior).
        """
        K = acc.shape[0]
        c = acc >> W
        s = (acc & MASK) + _shift_up(c)  # <= MASK + 2^12
        g = s >> W  # in {0, 1}
        p = ((s & MASK) == MASK).astype(jnp.uint32)
        d = 1
        while d < K:
            g = g | (p & _shift_up(g, d))
            p = p & _shift_up(p, d)
            d *= 2
        carry_in = _shift_up(g)
        return (s + carry_in) & MASK

    def _conv_cols(self, a, b):
        """Column sums of the schoolbook product (deferred carries).

        a, b: (L, *batch) 16-bit limb tensors (broadcast-compatible batches).
        Returns (2L+1, *batch) uint32 with values < 2L * 2^16.
        """
        L = self.L
        P = a[:, None] * b[None, :]  # (L, L, *batch); P[i, j] = a_i * b_j
        lo = P & MASK
        hi = P >> W

        def diagsum(M):
            # rows shifted: V[i, k] = M[i, k - i]; then sum over i
            pad_width = ((0, 0), (0, L + 1)) + ((0, 0),) * (M.ndim - 2)
            Mp = jnp.pad(M, pad_width)
            flat = Mp.reshape((L * (2 * L + 1),) + M.shape[2:])
            V = flat[: L * 2 * L].reshape((L, 2 * L) + M.shape[2:])
            return jnp.sum(V, axis=0)

        s_lo = diagsum(lo)  # (2L, *batch)
        s_hi = diagsum(hi)
        zeros = jnp.zeros((1,) + s_lo.shape[1:], dtype=jnp.uint32)
        s_lo = jnp.concatenate([s_lo, zeros], axis=0)  # (2L+1,)
        s_hi = jnp.concatenate([zeros, s_hi], axis=0)  # shifted up by 1
        return s_lo + s_hi

    def _csub_p(self, a, top):
        """Return a mod p given value = a + top*2^(16L) < 2p; a 16-bit limbs."""
        L = self.L
        comp = self._const(self.p_comp_limbs, a.ndim)
        s = a + comp  # <= 2*MASK
        s = s.at[0].add(1) if False else jnp.concatenate(
            [(s[0] + 1)[None], s[1:]], axis=0
        )
        ext = jnp.concatenate(
            [s, jnp.zeros((1,) + a.shape[1:], dtype=jnp.uint32)], axis=0
        )
        U = self._resolve(ext)  # value = a - p + 2^(16L)
        take = (top > 0) | (U[L] == 1)
        return jnp.where(take, U[:L], a)

    # -- field ops (device, Montgomery form unless noted) -------------------------

    def _bcast(self, a, b):
        if a.shape != b.shape:
            shape = jnp.broadcast_shapes(a.shape, b.shape)
            a = jnp.broadcast_to(a, shape)
            b = jnp.broadcast_to(b, shape)
        return a, b

    def add(self, a, b):
        from . import pallas_mont

        fused = pallas_mont.mont_addsub(self, a, b, "add")
        if fused is not None:
            return fused
        a, b = self._bcast(a, b)
        L = self.L
        ext = jnp.concatenate(
            [a + b, jnp.zeros((1,) + a.shape[1:], dtype=jnp.uint32)], axis=0
        )
        U = self._resolve(ext)
        return self._csub_p(U[:L], U[L])

    def sub(self, a, b):
        """a - b mod p, via complement addition: a + ~b + 1 + p == a - b + p + 2^(16L)."""
        from . import pallas_mont

        fused = pallas_mont.mont_addsub(self, a, b, "sub")
        if fused is not None:
            return fused
        a, b = self._bcast(a, b)
        L = self.L
        pl = self._const(self.p_limbs, a.ndim)
        s = a + (MASK - b) + pl  # <= 3*MASK
        s = jnp.concatenate([(s[0] + 1)[None], s[1:]], axis=0)
        ext = jnp.concatenate(
            [s, jnp.zeros((1,) + a.shape[1:], dtype=jnp.uint32)], axis=0
        )
        U = self._resolve(ext)  # value = (a - b + p) + 2^(16L); top limb >= 1
        return self._csub_p(U[:L], U[L] - 1)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p (full-width reduction).

        On TPU backends large batches route to the fused Pallas kernel
        (pallas_mont.py) — same algorithm, VMEM-tiled so no (L, L, batch)
        HBM transient.  This jnp path is the CPU/interpret oracle."""
        from . import pallas_mont

        fused = pallas_mont.mont_mul(self, a, b)
        if fused is not None:
            return fused
        a, b = self._bcast(a, b)
        L = self.L
        acc = self._conv_cols(a, b)  # (2L+1, *batch) deferred sums, T
        # m = (T mod R) * n' mod R
        t_lo = self._resolve(acc[: L + 1])[:L]  # T mod R as 16-bit limbs
        npr = self._const(self.nprime_limbs, a.ndim)
        m = self._resolve(self._conv_cols(t_lo, npr)[: L + 1])[:L]
        # U = (T + m*n) / R
        mn = self._conv_cols(m, self._const(self.p_limbs, a.ndim))
        total = acc + mn  # < 2^23
        U = self._resolve(total)  # low L limbs are zero
        return self._csub_p(U[L : 2 * L], U[2 * L])

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
        """a^e, e as an MSB-first {0,1} vector (static length); Montgomery in/out."""
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
        """Batched inversion via Montgomery's trick, O(n) muls + one inversion."""
        L, n = a.shape
        pref = self._prefix_mul(a, block=block)
        total = pref[:, -1]
        total_inv = self.inv(total[:, None])[:, 0]
        rev = jnp.flip(a, axis=1)
        suff_excl = jnp.concatenate(
            [jnp.broadcast_to(self._const(self.one_mont_limbs, 2), (L, 1)),
             self._prefix_mul(rev, block=block)[:, :-1]], axis=1)
        suff_excl = jnp.flip(suff_excl, axis=1)
        pref_excl = jnp.concatenate(
            [jnp.broadcast_to(self._const(self.one_mont_limbs, 2), (L, 1)),
             pref[:, :-1]], axis=1)
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
        intra = self._prefix_mul_scan_axis2(blocks)
        totals = intra[:, :, -1]
        tot_pref = self._prefix_mul(totals, block=block)
        one = jnp.broadcast_to(self._const(self.one_mont_limbs, 2), (L, 1))
        tot_excl = jnp.concatenate([one, tot_pref[:, :-1]], axis=1)
        out = self.mul(intra, tot_excl[:, :, None])
        return out.reshape(L, nb * block)[:, :n]

    def _prefix_mul_scan(self, a):
        L, n = a.shape

        def step(carry, x):
            y = self.mul(carry[:, None], x[:, None])[:, 0]
            return y, y

        init = jnp.asarray(self.one_mont_limbs).astype(jnp.uint32)
        _, ys = lax.scan(step, init, jnp.moveaxis(a, 1, 0))
        return jnp.moveaxis(ys, 0, 1)

    def _prefix_mul_scan_axis2(self, a):
        L, nb, block = a.shape

        def step(carry, x):
            y = self.mul(carry, x)
            return y, y

        init = jnp.broadcast_to(
            self._const(self.one_mont_limbs, 2), (L, nb)).astype(jnp.uint32)
        _, ys = lax.scan(step, init, jnp.moveaxis(a, 2, 0))
        return jnp.moveaxis(ys, 0, 2)
