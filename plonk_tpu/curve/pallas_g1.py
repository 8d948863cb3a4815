"""Pallas TPU kernel: fused complete projective G1 addition.

One scan step of the Pippenger pipeline is a complete point addition — 12 Fp
multiplications plus ~17 additions/subtractions (Renes-Costello-Batina alg. 7,
a=0, b3=12).  Composed from individual field ops that is ~29 kernel launches
and ~29 HBM round-trips of the full batch; fused here it is ONE launch that
reads 2 points and writes 1, with every intermediate in VMEM.

Layout: points cross the boundary as (3, 24, N) uint32 Montgomery tensors
(matching curve/g1_device.py); the wrapper reshapes to (72, N) so one
BlockSpec tile carries a full point column.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FP
from ..field.pallas_mont import (
    W, MASK, _mul_body, _resolve, _add_const_rows, _mode,
)

LANE_TILE = 256  # 12 muls deep: smaller tiles keep VMEM pressure low
L = 24

_P_LIMBS = tuple(FP.p_limbs.tolist())
_PCOMP = tuple(FP.p_comp_limbs.tolist())
_NPRIME = tuple(FP.nprime_limbs.tolist())


def _fp_mul(a, b):
    return _mul_body(a, b, L=L, np_limbs=_NPRIME, p_limbs=_P_LIMBS,
                     pcomp_limbs=_PCOMP)


def _csub_p(a, top):
    """a mod p given value = a + top*2^(16L) < 2p (mont.py _csub_p)."""
    s = _add_const_rows(a, _PCOMP)
    s = jnp.concatenate([(s[0] + 1)[None], s[1:]], axis=0)
    ext = jnp.concatenate([s, jnp.zeros((1,) + a.shape[1:], jnp.uint32)],
                          axis=0)
    U = _resolve(ext)
    take = (top > 0) | (U[L] == 1)
    return jnp.where(take[None, :], U[:L], a)


def _fp_add(a, b):
    ext = jnp.concatenate(
        [a + b, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], axis=0)
    U = _resolve(ext)
    return _csub_p(U[:L], U[L])


def _fp_sub(a, b):
    s = _add_const_rows(a + (MASK - b), _P_LIMBS)
    s = jnp.concatenate([(s[0] + 1)[None], s[1:]], axis=0)
    ext = jnp.concatenate([s, jnp.zeros((1,) + a.shape[1:], jnp.uint32)],
                          axis=0)
    U = _resolve(ext)
    return _csub_p(U[:L], U[L] - 1)


def _fp_neg(a):
    return _fp_sub(jnp.zeros_like(a), a)


def _mul12(a):
    t = _fp_add(_fp_add(a, a), a)   # 3a
    s = _fp_add(t, t)               # 6a
    return _fp_add(s, s)            # 12a


def _padd_body(p, q, negate_q: bool):
    X1, Y1, Z1 = p[0:L], p[L : 2 * L], p[2 * L : 3 * L]
    X2, Y2, Z2 = q[0:L], q[L : 2 * L], q[2 * L : 3 * L]
    if negate_q:
        Y2 = _fp_neg(Y2)
    M, A, S = _fp_mul, _fp_add, _fp_sub
    t0 = M(X1, X2)
    t1 = M(Y1, Y2)
    t2 = M(Z1, Z2)
    t3 = S(S(M(A(X1, Y1), A(X2, Y2)), t0), t1)
    t4 = S(S(M(A(Y1, Z1), A(Y2, Z2)), t1), t2)
    xz = S(S(M(A(X1, Z1), A(X2, Z2)), t0), t2)
    t0_3 = A(A(t0, t0), t0)
    t2b3 = _mul12(t2)
    z3t = A(t1, t2b3)
    t1m = S(t1, t2b3)
    y3b3 = _mul12(xz)
    X3 = S(M(t3, t1m), M(t4, y3b3))
    Y3 = A(M(y3b3, t0_3), M(t1m, z3t))
    Z3 = A(M(z3t, t4), M(t0_3, t3))
    return jnp.concatenate([X3, Y3, Z3], axis=0)


@functools.cache
def _padd_kernel(negate_q: bool, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(p_ref, q_ref, o_ref):
        o_ref[:] = _padd_body(p_ref[:], q_ref[:], negate_q)

    @jax.jit
    def call(p, q):
        n = p.shape[-1]
        grid = (n // LANE_TILE,)
        spec = pl.BlockSpec((3 * L, LANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3 * L, n), jnp.uint32),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(p, q)

    return call


def padd(p, q, negate_q: bool = False):
    """Fused complete addition for (3, L, *batch) tensors, or None to fall
    back to the composed jnp path."""
    mode = _mode()
    if mode == "off":
        return None
    shape = jnp.broadcast_shapes(p.shape, q.shape)
    n = int(np.prod(shape[2:], dtype=np.int64)) if len(shape) > 2 else 1
    if n < LANE_TILE:
        return None
    p = jnp.broadcast_to(p, shape).reshape(3 * L, n)
    q = jnp.broadcast_to(q, shape).reshape(3 * L, n)
    pad = (-n) % LANE_TILE
    if pad:
        zz = jnp.zeros((3 * L, pad), jnp.uint32)
        p = jnp.concatenate([p, zz], axis=-1)
        q = jnp.concatenate([q, zz], axis=-1)
    out = _padd_kernel(negate_q, interpret=(mode == "interpret"))(p, q)
    if pad:
        out = out[:, :n]
    return out.reshape(shape)
