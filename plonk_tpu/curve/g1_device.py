"""Device-side G1: batched complete projective arithmetic in Fp limb tensors.

A point batch is a uint32 tensor of shape (3, L, *batch): projective
(X : Y : Z) rows over Fp (L=24 16-bit limbs, Montgomery form).  Identity is
(0 : 1 : 0) — any (0 : l : 0) is treated as identity on readback.

Addition is the *complete* a=0 projective formula (Renes–Costello–Batina 2015,
Alg. 7, b3 = 3*4 = 12): one branch-free formula covers add, double, identity
and inverses — exactly what a masked/sorted SIMD pipeline needs.  The
reference's G1 ops live in the dusk-bls12_381 crate (Jacobian, branchy);
branchy Jacobian is the wrong shape for a TPU, complete-projective is.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import FP, params
from .bls12_381 import G1

P = params.P_MOD


def _mul12(a):
    """12*a via double/add chain (b3 = 3b = 12 for BLS12-381)."""
    d1 = FP.double(a)          # 2a
    t = FP.add(d1, a)          # 3a
    return FP.double(FP.double(t))  # 12a


def padd(p, q):
    """Complete projective addition; p, q: (3, L, *batch) -> (3, L, *batch).

    Large batches on TPU route to the fused Pallas kernel (pallas_g1.py):
    one launch for the whole 12-mul formula instead of ~29."""
    from . import pallas_g1

    fused = pallas_g1.padd(p, q)
    if fused is not None:
        return fused
    X1, Y1, Z1 = p[0], p[1], p[2]
    X2, Y2, Z2 = q[0], q[1], q[2]
    M, A, S = FP.mul, FP.add, FP.sub
    t0 = M(X1, X2)
    t1 = M(Y1, Y2)
    t2 = M(Z1, Z2)
    t3 = S(S(M(A(X1, Y1), A(X2, Y2)), t0), t1)   # X1Y2 + X2Y1
    t4 = S(S(M(A(Y1, Z1), A(Y2, Z2)), t1), t2)   # Y1Z2 + Y2Z1
    xz = S(S(M(A(X1, Z1), A(X2, Z2)), t0), t2)   # X1Z2 + X2Z1
    t0_3 = A(A(t0, t0), t0)                       # 3 X1X2
    t2b3 = _mul12(t2)                             # b3 Z1Z2
    z3t = A(t1, t2b3)
    t1m = S(t1, t2b3)
    y3b3 = _mul12(xz)                             # b3 (X1Z2+X2Z1)
    X3 = S(M(t3, t1m), M(t4, y3b3))
    Y3 = A(M(y3b3, t0_3), M(t1m, z3t))
    Z3 = A(M(z3t, t4), M(t0_3, t3))
    return jnp.stack([X3, Y3, Z3])


def pneg(p):
    return jnp.stack([p[0], FP.neg(p[1]), p[2]])


def psub(p, q):
    from . import pallas_g1

    fused = pallas_g1.padd(p, q, negate_q=True)
    if fused is not None:
        return fused
    return padd(p, pneg(q))


def pselect(cond, p, q):
    """cond: (*batch,) -> p where cond else q."""
    return jnp.where(cond[None, None], p, q)


def identity(batch_shape=()) -> np.ndarray:
    """(3, L, *batch) identity points (numpy, safe inside jit)."""
    out = np.zeros((3, FP.L) + tuple(batch_shape), dtype=np.uint32)
    one = FP.one_mont_limbs.reshape((FP.L,) + (1,) * len(batch_shape))
    out[1] = np.broadcast_to(one, out[1].shape)
    return out


def identity_dev(batch_shape=()):
    """(3, L, *batch) identity points built ON DEVICE as a broadcast of one
    288-byte literal.  Inside jit this MUST be used instead of
    jnp.asarray(identity(shape)): a full-shape numpy constant is baked into
    the HLO literally, and at prover scale (e.g. (3, L, K, 2^16) exclusive-
    prefix seeds) those literals reach hundreds of MB — past the axon
    remote_compile request-body cap, and ~0.2 s/MB of compile transfer below
    it."""
    batch_shape = tuple(batch_shape)
    base = jnp.asarray(identity(()))  # (3, L)
    t = base.reshape((3, FP.L) + (1,) * len(batch_shape))
    return jnp.broadcast_to(t, (3, FP.L) + batch_shape)


def is_identity(p):
    return jnp.all(p[2] == 0, axis=0)


# -- host <-> device --------------------------------------------------------

def to_device(points: list[G1]) -> np.ndarray:
    """Host affine points -> (3, L, n) Montgomery projective (numpy)."""
    Rm = FP.R
    xs = [(pt.x * Rm) % P if not pt.inf else 0 for pt in points]
    ys = [(pt.y * Rm) % P if not pt.inf else Rm % P for pt in points]
    zs = [Rm % P if not pt.inf else 0 for pt in points]
    return np.stack([FP.pack(xs), FP.pack(ys), FP.pack(zs)])


def from_device(arr) -> list[G1]:
    """(3, L, *batch) Montgomery projective -> host affine points.

    Uses the native batch-normalize (one shared field inversion, C++) when
    available; Python fallback below is the oracle."""
    a = np.asarray(arr).reshape(3, FP.L, -1)
    from ..native import g1_from_device as native_from_device

    native = native_from_device(a)
    if native is not None:
        return native
    xs = FP.unpack(a[0])
    ys = FP.unpack(a[1])
    zs = FP.unpack(a[2])
    Rinv = pow(FP.R, -1, P)
    out = []
    for X, Y, Z in zip(xs, ys, zs):
        X, Y, Z = X * Rinv % P, Y * Rinv % P, Z * Rinv % P
        if Z == 0:
            out.append(G1.identity())
        else:
            zi = pow(Z, -1, P)
            out.append(G1(X * zi % P, Y * zi % P))
    return out
