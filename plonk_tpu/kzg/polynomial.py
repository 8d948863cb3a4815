"""Coefficient-form `Polynomial` and evaluation-form `Evaluations` values.

Counterparts of /root/reference/src/fft/polynomial.rs and
/root/reference/src/fft/evaluations.rs.  The prover hot path deliberately works
on raw stacked `(L, K, n)` Montgomery tensors (one XLA program over all polys
at once); these classes are the VALUE types of the public algebra layer — the
self-contained, serializable objects the reference exposes — backed by the
same device tensors, so converting between the two worlds is free.

Design notes (TPU-first, not a translation):
- A polynomial is one `(L, n)` uint32 Montgomery-limb tensor, device-resident.
  Host big-ints only materialize at the serde and `evaluate` boundaries.
- `__mul__` is an FFT multiply on the smallest power-of-two domain that fits
  the product (polynomial.rs:371-394 does the same via coset domains); the
  pointwise product is one fused device op.
- `Evaluations.from_slice` is the strict recompute-and-compare domain check of
  evaluations.rs:64-90: the announced domain parameters are recomputed from
  the announced size and any mismatch is rejected, so malformed parameters
  cannot enter arithmetic through deserialization.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import FR, params
from ..utils.errors import InvalidBytes, NotEnoughBytes, BlsScalarMalformed
from . import poly as poly_ops

R = params.R_MOD
SCALAR_SIZE = 32
# size u64 + log_size u32 + 5 scalars (domain.rs:59-77)
DOMAIN_SIZE_BYTES = 8 + 4 + 5 * SCALAR_SIZE


def _read_scalar(data: bytes, off: int) -> int:
    v = int.from_bytes(data[off : off + SCALAR_SIZE], "little")
    if v >= R:
        raise BlsScalarMalformed("non-canonical scalar")
    return v


class Polynomial:
    """Dense coefficient-form polynomial over Fr (ascending degree).

    Backed by an `(L, n)` Montgomery device tensor; the zero polynomial is the
    empty `(L, 0)` tensor (polynomial.rs:64-77 keeps an empty vec)."""

    __slots__ = ("coeffs",)

    def __init__(self, coeffs):
        self.coeffs = jnp.asarray(coeffs, dtype=jnp.uint32)
        assert self.coeffs.ndim == 2 and self.coeffs.shape[0] == FR.L

    # -- constructors ---------------------------------------------------------

    @staticmethod
    def zero() -> "Polynomial":
        return Polynomial(jnp.zeros((FR.L, 0), jnp.uint32))

    @staticmethod
    def from_coefficients(values) -> "Polynomial":
        """Canonical host ints, ascending degree; leading zeros dropped
        (polynomial.rs:79-93)."""
        vals = [int(v) % R for v in values]
        while vals and vals[-1] == 0:
            vals.pop()
        if not vals:
            return Polynomial.zero()
        return Polynomial(FR.pack([v * FR.R % R for v in vals]))

    @staticmethod
    def from_tensor(coeffs) -> "Polynomial":
        """Wrap an existing `(L, n)` Montgomery tensor (no copy)."""
        return Polynomial(coeffs)

    # -- inspection -----------------------------------------------------------

    def __len__(self) -> int:
        return int(self.coeffs.shape[-1])

    def to_ints(self) -> list[int]:
        """Canonical (non-Montgomery) host coefficients."""
        mont_inv = pow(FR.R, -1, R)
        return [v * mont_inv % R for v in FR.unpack(np.asarray(self.coeffs))]

    def is_zero(self) -> bool:
        return len(self) == 0 or not any(self.to_ints())

    def degree(self) -> int:
        """Highest non-zero coefficient index; 0 for the zero polynomial
        (polynomial.rs:95-111)."""
        for i, v in reversed(list(enumerate(self.to_ints()))):
            if v:
                return i
        return 0

    def __eq__(self, other):
        if not isinstance(other, Polynomial):
            return NotImplemented
        a, b = self.to_ints(), other.to_ints()
        k = max(len(a), len(b))
        a += [0] * (k - len(a))
        b += [0] * (k - len(b))
        return a == b

    def __hash__(self):
        return hash(tuple(self.to_ints()))

    # -- algebra --------------------------------------------------------------

    def _padded_pair(self, other: "Polynomial"):
        n = max(len(self), len(other))

        def pad(t):
            d = n - t.shape[-1]
            if d == 0:
                return t
            return jnp.concatenate(
                [t, jnp.zeros((FR.L, d), jnp.uint32)], axis=-1)

        return pad(self.coeffs), pad(other.coeffs)

    def __add__(self, other: "Polynomial") -> "Polynomial":
        a, b = self._padded_pair(other)
        return Polynomial(FR.add(a, b))

    def __sub__(self, other: "Polynomial") -> "Polynomial":
        a, b = self._padded_pair(other)
        return Polynomial(FR.sub(a, b))

    def __neg__(self) -> "Polynomial":
        return Polynomial(FR.neg(self.coeffs))

    def scale(self, scalar: int) -> "Polynomial":
        """scalar * p (the reference's `AddAssign<(BlsScalar, &Polynomial)>`
        building block, polynomial.rs:236-256)."""
        s = FR.pack([int(scalar) % R * FR.R % R]).reshape(FR.L, 1)
        return Polynomial(FR.mul(self.coeffs, jnp.asarray(s)))

    def __mul__(self, other: "Polynomial") -> "Polynomial":
        """FFT product (polynomial.rs:371-394).  Both inputs are zero-padded
        to the smallest power-of-two domain holding the product, evaluated
        with one batched NTT, multiplied pointwise on device, interpolated
        back."""
        if self.is_zero() or other.is_zero():
            return Polynomial.zero()
        from ..ntt import EvaluationDomain

        out_len = len(self) + len(other) - 1
        n = 1 << max(0, out_len - 1).bit_length()
        d = EvaluationDomain.get(n)

        def pad(t):
            return jnp.concatenate(
                [t, jnp.zeros((FR.L, n - t.shape[-1]), jnp.uint32)], axis=-1)

        both = jnp.stack([pad(self.coeffs), pad(other.coeffs)], axis=1)
        ev = d.fft(both)                       # (L, 2, n) one batched NTT
        prod = FR.mul(ev[:, 0], ev[:, 1])
        coeffs = d.ifft(prod)
        return Polynomial.from_coefficients(
            v * pow(FR.R, -1, R) % R
            for v in FR.unpack(np.asarray(coeffs))[:out_len])

    def evaluate(self, z: int) -> int:
        """p(z) as a canonical host int (polynomial.rs:120-137; device Horner
        scan, kzg/poly.py)."""
        if len(self) == 0:
            return 0
        ev = poly_ops.evaluate(self.coeffs, int(z) % R)
        return FR.unpack(np.asarray(ev).reshape(FR.L, 1))[0] * pow(
            FR.R, -1, R) % R

    def ruffini(self, z: int) -> "Polynomial":
        """Quotient of p(X) / (X - z) (polynomial.rs:345-367)."""
        if len(self) == 0:
            return Polynomial.zero()
        quot, _rem = poly_ops.ruffini(self.coeffs, int(z) % R)
        mont_inv = pow(FR.R, -1, R)
        vals = [v * mont_inv % R for v in FR.unpack(np.asarray(quot))]
        return Polynomial.from_coefficients(vals)

    # -- serde (polynomial.rs:141-164) ----------------------------------------

    def to_var_bytes(self) -> bytes:
        vals = self.to_ints()[: self.degree() + 1]
        return b"".join(v.to_bytes(SCALAR_SIZE, "little") for v in vals)

    @staticmethod
    def from_slice(data: bytes) -> "Polynomial":
        if len(data) % SCALAR_SIZE:
            raise InvalidBytes("polynomial byte length not a scalar multiple")
        vals = [_read_scalar(data, off)
                for off in range(0, len(data), SCALAR_SIZE)]
        return Polynomial.from_coefficients(vals)


class Evaluations:
    """Evaluation-form polynomial bound to its domain (evaluations.rs:40-115).

    evals: `(L, n)` Montgomery device tensor, n == domain.n."""

    __slots__ = ("evals", "domain")

    def __init__(self, evals, domain):
        self.evals = jnp.asarray(evals, dtype=jnp.uint32)
        self.domain = domain
        assert self.evals.shape == (FR.L, domain.n)

    @staticmethod
    def from_values(values, domain) -> "Evaluations":
        vals = [int(v) % R for v in values]
        if len(vals) != domain.n:
            raise InvalidBytes("evaluation count does not match domain size")
        return Evaluations(FR.pack([v * FR.R % R for v in vals]), domain)

    def to_ints(self) -> list[int]:
        mont_inv = pow(FR.R, -1, R)
        return [v * mont_inv % R for v in FR.unpack(np.asarray(self.evals))]

    def __getitem__(self, i: int) -> int:
        return self.to_ints()[i]

    def __eq__(self, other):
        return (isinstance(other, Evaluations)
                and self.domain.n == other.domain.n
                and self.to_ints() == other.to_ints())

    def interpolate(self) -> Polynomial:
        """IFFT back to coefficient form (evaluations.rs:108-113)."""
        coeffs = self.domain.ifft(self.evals)
        mont_inv = pow(FR.R, -1, R)
        return Polynomial.from_coefficients(
            v * mont_inv % R for v in FR.unpack(np.asarray(coeffs)))

    def _check_compatible(self, other: "Evaluations"):
        if self.domain.n != other.domain.n:
            raise InvalidBytes("evaluations domains differ")

    def __mul__(self, other: "Evaluations") -> "Evaluations":
        self._check_compatible(other)
        return Evaluations(FR.mul(self.evals, other.evals), self.domain)

    def __add__(self, other: "Evaluations") -> "Evaluations":
        self._check_compatible(other)
        return Evaluations(FR.add(self.evals, other.evals), self.domain)

    def __sub__(self, other: "Evaluations") -> "Evaluations":
        self._check_compatible(other)
        return Evaluations(FR.sub(self.evals, other.evals), self.domain)

    # -- serde (evaluations.rs:50-105; domain layout domain.rs:59-77) ---------

    def _domain_bytes(self) -> bytes:
        d = self.domain
        out = int(d.n).to_bytes(8, "little")
        out += int(d.logn).to_bytes(4, "little")
        for v in (d.n % R, d.n_inv, d.omega, d.omega_inv, d.generator_inv):
            out += int(v).to_bytes(SCALAR_SIZE, "little")
        return out

    def to_var_bytes(self) -> bytes:
        return self._domain_bytes() + b"".join(
            v.to_bytes(SCALAR_SIZE, "little") for v in self.to_ints())

    @staticmethod
    def from_slice(data: bytes) -> "Evaluations":
        """Strict: reconstruct the canonical domain for the announced size and
        reject any parameter mismatch (evaluations.rs:64-90)."""
        from ..ntt import EvaluationDomain

        if len(data) < DOMAIN_SIZE_BYTES:
            raise NotEnoughBytes("evaluations domain header truncated")
        size = int.from_bytes(data[0:8], "little")
        log_size = int.from_bytes(data[8:12], "little")
        if size <= 0 or size > (1 << 40) or size & (size - 1):
            raise InvalidBytes("domain size must be a power of two")
        domain = EvaluationDomain.get(size)
        announced = [
            _read_scalar(data, 12 + i * SCALAR_SIZE) for i in range(5)
        ]
        expected = [size % R, domain.n_inv, domain.omega, domain.omega_inv,
                    domain.generator_inv]
        if log_size != domain.logn or announced != expected:
            raise InvalidBytes("domain parameters do not match size")
        body = data[DOMAIN_SIZE_BYTES:]
        if len(body) != size * SCALAR_SIZE:
            raise InvalidBytes("evaluation block length mismatch")
        vals = [_read_scalar(body, off)
                for off in range(0, len(body), SCALAR_SIZE)]
        return Evaluations.from_values(vals, domain)
