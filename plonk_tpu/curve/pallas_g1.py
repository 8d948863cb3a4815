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
    conv_const_matrices, const_cols,
)

import os as _os

LANE_TILE = int(_os.environ.get("PLONK_G1_TILE", "256"))  # VMEM-pressure cap
L = 24

_P_LIMBS = tuple(FP.p_limbs.tolist())
_PCOMP = tuple(FP.p_comp_limbs.tolist())
_NPRIME = tuple(FP.nprime_limbs.tolist())

# redundant-form constants: kernels keep Fp in [0, 2p) (4p < 2^384), so adds
# and subs reduce mod 2p and muls skip their conditional subtract entirely;
# host readback (native fp_from_u16limbs / from_device) canonicalizes.
_P2 = 2 * FP.p
_P2_LIMBS = tuple((_P2 >> (16 * i)) & 0xFFFF for i in range(L))
_P2COMP = tuple(((1 << (16 * L)) - 1 - _P2 >> (16 * i)) & 0xFFFF
                for i in range(L))


@functools.cache
def _mats_np():
    """(4, 2L+1, 2L) bf16 MXU matrices: [n' even, n' odd, p even, p odd]."""
    return np.concatenate([conv_const_matrices(_NPRIME, L),
                           conv_const_matrices(_P_LIMBS, L)])


@functools.cache
def _cols_np():
    """(3, L, 1) u32 const columns passed into kernels: [2p (+1 folded for
    subtraction), comp(2p) (+1 folded for csub), Montgomery one]."""
    return const_cols(_P2_LIMBS, _P2COMP, _ONE_MONT, plus_one=(0, 1))


def _fp_mul(a, b, mats=None):
    if mats is not None:
        return _mul_body(a, b, L=L, np_limbs=_NPRIME, p_limbs=_P_LIMBS,
                         pcomp_limbs=_PCOMP, nmats=mats[0:2],
                         pmats=mats[2:4], csub=False)
    return _mul_body(a, b, L=L, np_limbs=_NPRIME, p_limbs=_P_LIMBS,
                     pcomp_limbs=_PCOMP, csub=False)


def _csub_2p(a, top, cols):
    """value = a + top*2^(16L) < 4p -> value mod 2p (redundant form)."""
    s = a + cols[1]
    ext = jnp.concatenate([s, jnp.zeros((1,) + a.shape[1:], jnp.uint32)],
                          axis=0)
    U = _resolve(ext)
    take = (top > 0) | (U[L] == 1)
    return jnp.where(take[None, :], U[:L], a)


def _fp_add(a, b, cols):
    ext = jnp.concatenate(
        [a + b, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], axis=0)
    U = _resolve(ext)
    return _csub_2p(U[:L], U[L], cols)


def _fp_sub(a, b, cols):
    # a - b + 2p in (0, 4p), then reduce mod 2p
    s = a + (MASK - b) + cols[0]
    ext = jnp.concatenate([s, jnp.zeros((1,) + a.shape[1:], jnp.uint32)],
                          axis=0)
    U = _resolve(ext)
    return _csub_2p(U[:L], U[L] - 1, cols)


def _fp_neg(a, cols):
    return _fp_sub(jnp.zeros_like(a), a, cols)


def _mul12(a, cols):
    t = _fp_add(_fp_add(a, a, cols), a, cols)   # 3a
    s = _fp_add(t, t, cols)                     # 6a
    return _fp_add(s, s, cols)                  # 12a


def _padd_body(p, q, negate_q: bool, mats=None, cols=None):
    X1, Y1, Z1 = p[0:L], p[L : 2 * L], p[2 * L : 3 * L]
    X2, Y2, Z2 = q[0:L], q[L : 2 * L], q[2 * L : 3 * L]
    if negate_q:
        Y2 = _fp_neg(Y2, cols)

    def A(a, b):
        return _fp_add(a, b, cols)

    def S(a, b):
        return _fp_sub(a, b, cols)

    def M(a, b):
        return _fp_mul(a, b, mats)
    t0 = M(X1, X2)
    t1 = M(Y1, Y2)
    t2 = M(Z1, Z2)
    t3 = S(S(M(A(X1, Y1), A(X2, Y2)), t0), t1)
    t4 = S(S(M(A(Y1, Z1), A(Y2, Z2)), t1), t2)
    xz = S(S(M(A(X1, Z1), A(X2, Z2)), t0), t2)
    t0_3 = A(A(t0, t0), t0)
    t2b3 = _mul12(t2, cols)
    z3t = A(t1, t2b3)
    t1m = S(t1, t2b3)
    y3b3 = _mul12(xz, cols)
    X3 = S(M(t3, t1m), M(t4, y3b3))
    Y3 = A(M(y3b3, t0_3), M(t1m, z3t))
    Z3 = A(M(z3t, t4), M(t0_3, t3))
    return jnp.concatenate([X3, Y3, Z3], axis=0)


_ONE_MONT = tuple(FP.one_mont_limbs.tolist())


def _add_one_const(x, cols):
    """x + R (Montgomery one) in redundant form: const col + resolve, no
    csub (x < p canonical affine => result < 2p)."""
    s = x + cols[2]
    ext = jnp.concatenate([s, jnp.zeros((1,) + x.shape[1:], jnp.uint32)],
                          axis=0)
    return _resolve(ext)[:L]


def _one_rows(T, cols):
    return jnp.broadcast_to(cols[2], (L, T))


def _padd_mixed_body(p, q, mats=None, cols=None):
    """Complete mixed addition: p projective (3L, T), q AFFINE (2L, T)
    canonical (implicit Z2 = 1) — the t2 = Z1*Z2 mul is free."""
    X1, Y1, Z1 = p[0:L], p[L : 2 * L], p[2 * L : 3 * L]
    X2, Y2 = q[0:L], q[L : 2 * L]

    def A(a, b):
        return _fp_add(a, b, cols)

    def S(a, b):
        return _fp_sub(a, b, cols)

    def M(a, b):
        return _fp_mul(a, b, mats)

    x2p1 = _add_one_const(X2, cols)
    y2p1 = _add_one_const(Y2, cols)
    t0 = M(X1, X2)
    t1 = M(Y1, Y2)
    t2 = Z1
    t3 = S(S(M(A(X1, Y1), A(X2, Y2)), t0), t1)
    t4 = S(S(M(A(Y1, Z1), y2p1), t1), t2)
    xz = S(S(M(A(X1, Z1), x2p1), t0), t2)
    t0_3 = A(A(t0, t0), t0)
    t2b3 = _mul12(t2, cols)
    z3t = A(t1, t2b3)
    t1m = S(t1, t2b3)
    y3b3 = _mul12(xz, cols)
    X3 = S(M(t3, t1m), M(t4, y3b3))
    Y3 = A(M(y3b3, t0_3), M(t1m, z3t))
    Z3 = A(M(z3t, t4), M(t0_3, t3))
    return jnp.concatenate([X3, Y3, Z3], axis=0)


@functools.cache
def _padd_kernel(negate_q: bool, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(m_ref, c_ref, p_ref, q_ref, o_ref):
        o_ref[:] = _padd_body(p_ref[:], q_ref[:], negate_q, mats=m_ref[:],
                              cols=c_ref[:])

    @jax.jit
    def call(p, q):
        n = p.shape[-1]
        grid = (n // LANE_TILE,)
        spec = pl.BlockSpec((3 * L, LANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((4, 2 * L + 1, 2 * L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((3, L, 1), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3 * L, n), jnp.uint32),
            grid=grid,
            in_specs=[cspec, kspec, spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(jnp.asarray(_mats_np()), jnp.asarray(_cols_np()), p, q)

    return call


# -- fused blocked prefix scan ------------------------------------------------
#
# One scan *level* of the Pippenger pipeline (msm.py _prefix_scan_points) as a
# single pallas_call: grid (M/TILE, block) iterated sequentially with the
# running point held in VMEM scratch across grid steps.  Replaces `block`
# separate kernel launches (lax.scan over the fused padd) whose carry
# round-trips HBM every step.  Layout: the caller transposes the blocked
# points to (block, 3*L, M) so step j reads the contiguous full-lane slab
# x[j] — lanes stay the minor axis.

@functools.cache
def _scan_kernel(block: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(m_ref, c_ref, x_ref, o_ref, carry_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            carry_ref[:] = x_ref[0]

        @pl.when(j > 0)
        def _():
            carry_ref[:] = _padd_body(carry_ref[:], x_ref[0], False,
                                      mats=m_ref[:], cols=c_ref[:])

        o_ref[0] = carry_ref[:]

    @jax.jit
    def call(x):
        m = x.shape[-1]
        spec = pl.BlockSpec((1, 3 * L, LANE_TILE), lambda i, j: (j, 0, i),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((4, 2 * L + 1, 2 * L), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((3, L, 1), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((block, 3 * L, m), jnp.uint32),
            grid=(m // LANE_TILE, block),
            in_specs=[cspec, kspec, spec],
            out_specs=spec,
            scratch_shapes=[pltpu.VMEM((3 * L, LANE_TILE), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(jnp.asarray(_mats_np()), jnp.asarray(_cols_np()), x)

    return call


@functools.cache
def _scan_kernel_affine(block: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(m_ref, c_ref, x_ref, o_ref, carry_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            xa = x_ref[0]
            carry_ref[:] = jnp.concatenate(
                [xa, _one_rows(xa.shape[-1], c_ref[:])], axis=0)

        @pl.when(j > 0)
        def _():
            carry_ref[:] = _padd_mixed_body(carry_ref[:], x_ref[0],
                                            mats=m_ref[:], cols=c_ref[:])

        o_ref[0] = carry_ref[:]

    @jax.jit
    def call(x):
        m = x.shape[-1]
        ispec = pl.BlockSpec((1, 2 * L, LANE_TILE), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, 3 * L, LANE_TILE), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((4, 2 * L + 1, 2 * L), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((3, L, 1), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((block, 3 * L, m), jnp.uint32),
            grid=(m // LANE_TILE, block),
            in_specs=[cspec, kspec, ispec],
            out_specs=ospec,
            scratch_shapes=[pltpu.VMEM((3 * L, LANE_TILE), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(jnp.asarray(_mats_np()), jnp.asarray(_cols_np()), x)

    return call


def prefix_scan_affine_parts(pts, block: int):
    """Blocked scan PARTS for AFFINE (2, L, *batch, n) canonical points:
    (intra, tot_excl) with
      intra:    (3, L, *batch, n)  inclusive prefix WITHIN each block
      tot_excl: (3, L, *batch, nb) exclusive running block totals
    so the full inclusive prefix at j is intra[j] + tot_excl[j // block] —
    or None (CPU fallback).

    The caller folds the carry only at the positions it actually gathers
    (2*2^16 bucket boundaries), NOT across all n points: the O(n) carry-fold
    padd of a materialized full prefix was ~half the scan's work.

    Level 0 runs the mixed Z2=1 kernel; block totals recurse through the
    projective scan.  Tail padding repeats the first point (prefixes past
    the true end are never consumed by the bucket gather)."""
    mode = _mode()
    if mode == "off":
        return None
    n = pts.shape[-1]
    batch = pts.shape[2:-1]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    if n < 2 * block or B * ((n + block - 1) // block) < LANE_TILE:
        return None
    from . import g1_device as g1

    nb = -(-n // block)
    pad = nb * block - n
    x = pts.reshape(2 * L, B, n)
    if pad:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[..., :1], (2 * L, B, pad))], axis=-1)
    x = jnp.moveaxis(x.reshape(2 * L, B, nb, block), -1, 0)
    x = x.reshape(block, 2 * L, B * nb)
    m = B * nb
    mpad = (-m) % LANE_TILE
    if mpad:
        x = jnp.concatenate(
            [x, jnp.zeros((block, 2 * L, mpad), jnp.uint32)], axis=-1)
    intra = _scan_kernel_affine(block, interpret=(mode == "interpret"))(x)
    intra = intra[..., :m]
    totals = intra[-1].reshape(3, L, B, nb)
    from .msm import _prefix_scan_points

    tot_incl = _prefix_scan_points(totals, block=block)
    idfirst = g1.identity_dev((B, 1))
    tot_excl = jnp.concatenate([idfirst, tot_incl[..., :-1]], axis=-1)
    intra = jnp.moveaxis(intra.reshape(block, 3, L, B, nb), 0, -1)
    intra = intra.reshape(3, L, B, nb * block)[..., :n]
    return (intra.reshape((3, L) + batch + (n,)),
            tot_excl.reshape((3, L) + batch + (nb,)))


def prefix_scan_affine(pts, block: int):
    """Full inclusive prefix of AFFINE points (parts + one O(n) carry fold),
    or None.  Prefer prefix_scan_affine_parts when only a few positions are
    consumed."""
    parts = prefix_scan_affine_parts(pts, block)
    if parts is None:
        return None
    from . import g1_device as g1

    intra, tot_excl = parts
    n = intra.shape[-1]
    blk = jnp.arange(n) // block
    carry = jnp.take(tot_excl, blk, axis=-1)
    return g1.padd(intra, carry)


def prefix_scan(pts, block: int):
    """Inclusive prefix group-add of (3, L, *batch, n) along the last axis,
    or None to fall back to the composed lax.scan path.

    Strategy: intra-block scans fused in one kernel, recursive scan of the
    block totals, one fused padd to fold the exclusive block carries back in
    (the blocked-scan recurrence of msm.py _prefix_scan_points)."""
    mode = _mode()
    if mode == "off":
        return None
    n = pts.shape[-1]
    batch = pts.shape[2:-1]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    if n < 2 * block or B * ((n + block - 1) // block) < LANE_TILE:
        return None
    from . import g1_device as g1

    nb = -(-n // block)
    pad = nb * block - n
    x = pts.reshape(3 * L, B, n)
    if pad:
        idp = g1.identity_dev((B, pad)).reshape(3 * L, B, pad)
        x = jnp.concatenate([x, idp], axis=-1)
    # (3L, B, nb, block) -> (block, 3L, B*nb)
    x = jnp.moveaxis(x.reshape(3 * L, B, nb, block), -1, 0)
    x = x.reshape(block, 3 * L, B * nb)
    m = B * nb
    mpad = (-m) % LANE_TILE
    if mpad:
        x = jnp.concatenate(
            [x, jnp.zeros((block, 3 * L, mpad), jnp.uint32)], axis=-1)
    intra = _scan_kernel(block, interpret=(mode == "interpret"))(x)
    intra = intra[..., :m]                       # (block, 3L, B*nb)
    totals = intra[-1].reshape(3, L, B, nb)
    from .msm import _prefix_scan_points

    tot_incl = _prefix_scan_points(totals, block=block)
    idfirst = g1.identity_dev((B, 1))
    tot_excl = jnp.concatenate([idfirst, tot_incl[..., :-1]], axis=-1)
    # back to (3, L, B, nb, block); fold the block carries in
    intra = jnp.moveaxis(intra.reshape(block, 3, L, B, nb), 0, -1)
    out = g1.padd(intra, tot_excl[..., None])
    out = out.reshape(3, L, B, nb * block)[..., :n]
    return out.reshape(pts.shape)


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
