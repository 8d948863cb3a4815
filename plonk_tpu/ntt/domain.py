"""Radix-2 NTT evaluation domains, TPU-native.

Counterpart of the reference's `EvaluationDomain`
(/root/reference/src/fft/domain.rs:119-327) re-designed for XLA:

- The reference runs a *serial* in-place Cooley-Tukey with bit-reversal
  (domain.rs:339-376).  Here every stage is a reshape + one vectorized field
  multiply over n/2 butterflies — the butterfly pairing is expressed through
  the tensor layout `(..., n/m, 2, m/2)` so XLA sees static strided slices,
  never a gather (the single bit-reversal gather happens once, up front).
- Twiddles come from one precomputed power table per direction; stage s uses
  the static stride slice `table[:, ::n/m][:m/2]`.
- Everything is batched: the prover NTTs 11-16 same-shape polynomials at once
  (axis -2), unlike the reference's serial per-poly calls (compiler.rs:158-168).
- Coset (i)NTTs fold the `distribute_powers` pointwise scale
  (domain.rs:193-227) into the same jitted call.

All tensors are Montgomery-form uint32 limbs, shape (L, ..., n).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FR, params


def _bit_reverse_indices(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev.astype(np.int32)


def ntt_host(coeffs: list[int], omega: int, p: int) -> list[int]:
    """O(n log n) host NTT on Python ints — the test oracle."""
    n = len(coeffs)
    if n == 1:
        return list(coeffs)
    even = ntt_host(coeffs[0::2], omega * omega % p, p)
    odd = ntt_host(coeffs[1::2], omega * omega % p, p)
    out = [0] * n
    w = 1
    for i in range(n // 2):
        t = w * odd[i] % p
        out[i] = (even[i] + t) % p
        out[i + n // 2] = (even[i] - t) % p
        w = w * omega % p
    return out


class EvaluationDomain:
    """Multiplicative subgroup of Fr of power-of-two order n (2-adicity <= 32)."""

    _cache: dict[int, "EvaluationDomain"] = {}

    def __init__(self, n: int):
        assert n & (n - 1) == 0 and n >= 1
        logn = n.bit_length() - 1
        assert logn <= params.TWO_ADICITY
        self.n = n
        self.logn = logn
        p = params.R_MOD
        # group generator omega: ROOT_OF_UNITY squared down to order n
        # (mirrors domain.rs:137-143)
        self.omega = pow(params.FR_ROOT_OF_UNITY, 1 << (params.TWO_ADICITY - logn), p)
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv = pow(n, -1, p)
        self.generator = params.FR_GENERATOR
        self.generator_inv = pow(self.generator, -1, p)
        self._bitrev = _bit_reverse_indices(n)
        # Montgomery-form power tables (built lazily on first device use)
        self._tables = None
        self._tables_dev = None

    @classmethod
    def get(cls, n: int) -> "EvaluationDomain":
        if n not in cls._cache:
            cls._cache[n] = EvaluationDomain(n)
        return cls._cache[n]

    # -- host helpers -----------------------------------------------------------

    def elements(self) -> list[int]:
        p, out, acc = params.R_MOD, [], 1
        for _ in range(self.n):
            out.append(acc)
            acc = acc * self.omega % p
        return out

    def evaluate_vanishing_polynomial(self, tau: int) -> int:
        return (pow(tau, self.n, params.R_MOD) - 1) % params.R_MOD

    # -- device tables ----------------------------------------------------------

    def _powers_host(self, base: int, count: int) -> np.ndarray:
        """(L, count) Montgomery-form powers base^0..base^{count-1} (numpy)."""
        p = params.R_MOD
        vals, acc = [], 1
        R = FR.R
        for _ in range(count):
            vals.append(acc * R % p)  # store directly in Montgomery form
            acc = acc * base % p
        return FR.pack(vals)  # pack reduces mod p; values already < p

    def tables(self):
        """Build & cache twiddle/coset tables (Montgomery form, numpy)."""
        if self._tables is None:
            half = max(self.n // 2, 1)
            # plain numpy: safe to build & cache inside any jit trace
            self._tables = {
                "w": self._powers_host(self.omega, half),
                "winv": self._powers_host(self.omega_inv, half),
                "coset": self._powers_host(self.generator, self.n),
                "coset_inv": self._powers_host(self.generator_inv, self.n),
                "n_inv": FR.pack([self.n_inv * FR.R % params.R_MOD]),
                "bitrev": self._bitrev,
            }
        return self._tables

    TB_KEYS = ("w", "winv", "coset", "coset_inv", "n_inv")

    def tables_dev(self):
        """The power tables as a jit-ARGUMENT pytree (dict of device arrays).

        The (i)fft methods accept this via `tb=`; pass it as an argument to
        every jitted program instead of letting the methods close over the
        numpy tables.  Closure constants are inlined into the lowered HLO as
        literals — at n = 2^16 that is ~150 MB of twiddles per prover round
        module, which made every XLA (remote-)compile request huge and
        overflowed the compile tunnel's request limit at 2^17.  As arguments
        they are ordinary device buffers, shared across all modules and
        shardable on a mesh.  (`bitrev` stays a closure constant: int32
        gather indices, n*4 bytes, and XLA folds static gathers.)"""
        if self._tables_dev is None:
            t = self.tables()
            self._tables_dev = {k: jnp.asarray(t[k]) for k in self.TB_KEYS}
        return self._tables_dev

    # -- device transforms ------------------------------------------------------

    def _butterflies(self, x, table):
        """Shared DIT stage loop. x: (L, ..., n) bit-reversed input.

        Each stage is one fused Pallas butterfly launch (mul+add+sub in
        VMEM, field/pallas_mont.py mont_butterfly) when the backend allows;
        the composed FR-op path is the CPU oracle."""
        from ..field import pallas_mont

        n, L = self.n, FR.L
        batch_ndim = x.ndim - 2
        for s in range(1, self.logn + 1):
            m = 1 << s
            half = m // 2
            tw = table[:, :: n // m][:, :half]  # (L, half): omega_m^j
            tw = tw.reshape((L,) + (1,) * (batch_ndim + 1) + (half,))
            xr = x.reshape(x.shape[:-1] + (n // m, 2, half))
            u = xr[..., 0, :]
            fused = pallas_mont.mont_butterfly(FR, u, xr[..., 1, :], tw)
            if fused is not None:
                hi, lo = fused
            else:
                t = FR.mul(xr[..., 1, :], tw)
                hi, lo = FR.add(u, t), FR.sub(u, t)
            x = jnp.concatenate(
                [hi[..., None, :], lo[..., None, :]], axis=-2
            ).reshape(x.shape)
        return x

    def fft(self, x, tb=None):
        """Coefficients -> evaluations over H. x: (L, ..., n) Montgomery.

        tb: optional tables_dev() pytree passed as a jit argument; defaults
        to the numpy closure tables (standalone/oracle use)."""
        t = self.tables() if tb is None else tb
        x = jnp.take(x, self._bitrev, axis=-1)
        return self._butterflies(x, t["w"])

    def ifft(self, x, tb=None):
        """Evaluations over H -> coefficients."""
        t = self.tables() if tb is None else tb
        x = jnp.take(x, self._bitrev, axis=-1)
        x = self._butterflies(x, t["winv"])
        ninv = t["n_inv"].reshape((FR.L,) + (1,) * (x.ndim - 1))
        return FR.mul(x, ninv)

    def coset_fft(self, x, tb=None):
        """Coefficients -> evaluations over gH (generator coset)."""
        t = self.tables() if tb is None else tb
        coset = t["coset"].reshape((FR.L,) + (1,) * (x.ndim - 2) + (self.n,))
        return self.fft(FR.mul(x, coset), tb=tb)

    def coset_ifft(self, x, tb=None):
        """Evaluations over gH -> coefficients."""
        t = self.tables() if tb is None else tb
        x = self.ifft(x, tb=tb)
        cinv = t["coset_inv"].reshape((FR.L,) + (1,) * (x.ndim - 2) + (self.n,))
        return FR.mul(x, cinv)

    # -- jitted entry points (cached per (n, batch-shape)) ----------------------

    @functools.lru_cache(maxsize=None)
    def _jitted(self, name):
        return jax.jit(getattr(self, name))

    def evaluate_all_lagrange_coefficients(self, tau: int) -> list[int]:
        """L_i(tau) for every i (host ints; domain.rs:232-279).

        tau in H yields the indicator vector; otherwise the barycentric form
        L_i(tau) = z_H(tau)/n * omega^i / (tau - omega^i) with one batched
        inversion (Montgomery trick, util.rs:87-118)."""
        p = params.R_MOD
        n = self.n
        tau %= p
        zh = (pow(tau, n, p) - 1) % p
        elems = self.elements()
        if zh == 0:
            return [1 if e == tau else 0 for e in elems]
        denoms = [(tau - e) % p for e in elems]
        # batch inversion: prefix products + single inverse
        pref = []
        acc = 1
        for d in denoms:
            acc = acc * d % p
            pref.append(acc)
        inv = pow(acc, -1, p)
        invs = [0] * n
        for i in range(n - 1, -1, -1):
            invs[i] = inv * (pref[i - 1] if i else 1) % p
            inv = inv * denoms[i] % p
        scale = zh * self.n_inv % p
        return [scale * e % p * invs[i] % p for i, e in enumerate(elems)]

    def evaluate_vanishing_poly_over_coset(self, coset_n: int) -> list[int]:
        """z_H(g * w^i) for w over the coset domain of size coset_n (host ints).

        Mirrors domain.rs:294-313: the vanishing poly of THIS domain evaluated
        over the coset of a (larger) domain of size coset_n.
        """
        p = params.R_MOD
        # z_H(g w^i) = (g w^i)^n - 1 ; (w^i)^n cycles with period coset_n / gcd
        gn = pow(self.generator, self.n, p)
        wn = pow(
            EvaluationDomain.get(coset_n).omega, self.n, p
        )
        out, acc = [], gn
        for _ in range(coset_n):
            out.append((acc - 1) % p)
            acc = acc * wn % p
        return out
