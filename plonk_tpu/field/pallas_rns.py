"""Device bodies + Pallas kernels for the RNS Fp engine (see rns.py).

Every arithmetic body is plain jnp on (C, T) uint32 channel tensors, so the
same code runs three ways: composed under jit on CPU (the oracle for tests),
inside pallas_call on TPU (the production path), and in pallas interpret
mode.  Constants cross the kernel boundary as packed operands — Mosaic
cannot capture array constants (same pattern as pallas_mont.py).

Channel-laziness discipline (bounds in comments are per-channel values):
  r16   strictly < 2^16 — legal mul/matmul input
  lazy  < 2^19 — sums of few r16 terms; _fold2 renormalizes
Value bounds (multiples of p) are tracked per expression in the curve
bodies; every mul's alpha*beta stays < 2^14 against a 2^19 margin (rns.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import params as fparams
from .rns import get_params, RNSParams, K, CH

MASK = np.uint32(0xFFFF)
P = fparams.P_MOD

import os as _os

LANE_TILE = int(_os.environ.get("PLONK_RNS_TILE", "256"))


# -- packed constant blocks --------------------------------------------------

U_EPS, U_2M, U_XI1, U_PB, U_MINVB, U_XI2, U_B1, U_B2, U_ONE = range(9)
U_SUB = {4: 9, 8: 10, 64: 11, 128: 12}
NU = 13


@functools.cache
def _consts_np(p: int = P):
    """(ucols (NU, CH, 1) u32, invm (2, K, 1) f32, mats (2, 3K, 2(K+1)) bf16)."""
    c = get_params(p)
    u = np.zeros((NU, CH), np.uint32)
    u[U_EPS] = c.eps
    u[U_2M] = 2 * c.mods.astype(np.uint32)
    u[U_XI1, :K] = c.c_xi1
    u[U_PB, :K] = c.p_mod_B
    u[U_MINVB, :K] = c.minv_B
    u[U_XI2, :K] = c.c_xi2
    u[U_B1, :K] = c.ext1_bias
    u[U_B2, :K] = c.ext2_bias
    u[U_ONE] = c.one_mres
    for cc, idx in U_SUB.items():
        u[idx] = c.sub_cp[cc]
    invm = np.stack([c.inv_m_A, c.inv_m_B])[..., None]   # (2, K, 1)
    mats = np.stack([c.ext1_mat, c.ext2_mat])            # (2, 3K, 2(K+1))
    return u[..., None], invm.astype(np.float32), mats


def consts_dev(p: int = P):
    u, invm, mats = _consts_np(p)
    return jnp.asarray(u), jnp.asarray(invm), jnp.asarray(mats)


# -- channel primitives ------------------------------------------------------

def _fold1(x, eps):
    return (x & MASK) + (x >> 16) * eps


def _fold2(x, eps):
    """lazy (< 2^19) -> r16."""
    return _fold1(_fold1(x, eps), eps)


def _fold_full(x, eps):
    """any u32 -> r16 (5 folds; see rns.py bound chain)."""
    for _ in range(5):
        x = _fold1(x, eps)
    return x


def _ext_body(xi, invm, mat, bias, eps_tgt, beta: float):
    """Base extension: xi (K, T) r16 -> (K, T) r16 in the other base.

    Kawamura f32 kappa estimate (+1 bias keeps the matmul row >= 0), one
    MXU dot against the 8-bit-chunk block matrix, exact u32 reconstruction
    y00 + ymid*2^8 + y11*eps (+ bias), full fold.  Recon sum < 2^32 is
    asserted statically in RNSParams."""
    fr = jnp.sum(xi.astype(jnp.int32).astype(jnp.float32) * invm,
                 axis=0, keepdims=True)
    kap1 = (jnp.floor(fr + np.float32(beta)).astype(jnp.int32)
            + 1).astype(jnp.uint32)                      # (1, T)
    x = jnp.concatenate([xi, kap1], axis=0)              # (K+1, T)
    xin = jnp.concatenate([x & np.uint32(0xFF), x >> 8], axis=0)
    xin = xin.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    y3 = lax.dot_general(mat, xin, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    y3 = y3.astype(jnp.int32).astype(jnp.uint32)         # (3K, T)
    y = (y3[:K] + (y3[K:2 * K] << 8) + y3[2 * K:] * eps_tgt + bias)
    return _fold_full(y, eps_tgt)


def rns_mul_body(a, b, u, invm, mats):
    """(CH, T) r16 x (CH, T) r16 -> (CH, T) r16; value < 3p given
    alpha*beta <= 2^14 (rns.py margin 2^19)."""
    eps = u[U_EPS]
    epsA, epsB = eps[:K], eps[K:]
    t = _fold_full(a * b, eps)
    xi1 = _fold_full(t[:K] * u[U_XI1, :K], epsA)
    qhat = _ext_body(xi1, invm[0], mats[0], u[U_B1, :K], epsB,
                     -RNSParams.BETA)
    s = qhat * u[U_PB, :K] + t[K:]                       # < 2^32 exactly
    rB = _fold_full(_fold_full(s, epsB) * u[U_MINVB, :K], epsB)
    xi2 = _fold_full(rB * u[U_XI2, :K], epsB)
    rA = _ext_body(xi2, invm[1], mats[1], u[U_B2, :K], epsA,
                   RNSParams.BETA)
    return jnp.concatenate([rA, rB], axis=0)


# -- curve-formula helpers (value bounds in multiples of p) ------------------

def _A(a, b):
    """lazy add (values add; channels stay < 2^19 by call-site discipline)."""
    return a + b


def _S(a, b, c: int, u):
    """a + c*p - b (b must be r16; result lazy). c covers b's value bound."""
    return a + u[U_SUB[c]] + (u[U_2M] - b)


def _mul12(a, u):
    """12*a; a r16, result lazy < 2^18. Value 12*|a|."""
    eps = u[U_EPS]
    t = _fold2(_A(_A(a, a), a), eps)     # 3a, r16
    d = _A(t, t)                         # 6a  < 2^17
    return _A(d, d)                      # 12a < 2^18


def _M(a, b, u, invm, mats):
    eps = u[U_EPS]
    return rns_mul_body(_fold2(a, eps), _fold2(b, eps), u, invm, mats)


def padd_body(p, q, u, invm, mats, negate_q: bool = False):
    """Complete projective add, RNS channels: p, q (3*CH, T) r16 -> r16.

    Renes-Costello-Batina alg. 7 (b3 = 12), the same formula as
    pallas_g1._padd_body.  Inputs < 7p (value), outputs < 7p — stable."""
    eps = u[U_EPS]
    X1, Y1, Z1 = p[:CH], p[CH:2 * CH], p[2 * CH:]
    X2, Y2, Z2 = q[:CH], q[CH:2 * CH], q[2 * CH:]
    if negate_q:
        Y2 = _fold2(u[U_SUB[8]] + (u[U_2M] - Y2), eps)   # 8p - Y2 < 8p

    def M(a, b):
        return _M(a, b, u, invm, mats)

    t0 = M(X1, X2)                                       # < 3p
    t1 = M(Y1, Y2)
    t2 = M(Z1, Z2)
    t3 = _S(_S(M(_A(X1, Y1), _A(X2, Y2)), t0, 4, u), t1, 4, u)    # < 11p
    t4 = _S(_S(M(_A(Y1, Z1), _A(Y2, Z2)), t1, 4, u), t2, 4, u)    # < 11p
    xz = _S(_S(M(_A(X1, Z1), _A(X2, Z2)), t0, 4, u), t2, 4, u)    # < 11p
    t3 = _fold2(t3, eps)
    t4 = _fold2(t4, eps)
    t0_3 = _A(_A(t0, t0), t0)                            # < 9p
    t2b3 = _fold2(_mul12(t2, u), eps)                    # < 36p, r16
    z3t = _A(t1, t2b3)                                   # < 39p
    t1m = _S(t1, t2b3, 64, u)                            # < 67p
    y3b3 = _mul12(_fold2(xz, eps), u)                    # < 132p
    X3 = _S(M(t3, t1m), M(t4, y3b3), 4, u)               # < 7p
    Y3 = _A(M(y3b3, t0_3), M(t1m, z3t))                  # < 6p
    Z3 = _A(M(z3t, t4), M(t0_3, t3))                     # < 6p
    return jnp.concatenate(
        [_fold2(X3, eps), _fold2(Y3, eps), _fold2(Z3, eps)], axis=0)


def padd_mixed_body(p, q, u, invm, mats):
    """p projective (3*CH, T) < 7p; q AFFINE (2*CH, T) < p (Z2 = 1).

    Mirror of pallas_g1._padd_mixed_body; t2 = Z1 passes through raw."""
    eps = u[U_EPS]
    X1, Y1, Z1 = p[:CH], p[CH:2 * CH], p[2 * CH:]
    X2, Y2 = q[:CH], q[CH:]

    def M(a, b):
        return _M(a, b, u, invm, mats)

    x2p1 = _A(X2, u[U_ONE])                              # < 2p
    y2p1 = _A(Y2, u[U_ONE])
    t0 = M(X1, X2)                                       # < 3p
    t1 = M(Y1, Y2)
    t2 = Z1                                              # < 7p (carry)
    t3 = _S(_S(M(_A(X1, Y1), _A(X2, Y2)), t0, 4, u), t1, 4, u)    # < 11p
    t4 = _S(_S(M(_A(Y1, Z1), y2p1), t1, 4, u), t2, 8, u)          # < 15p
    xz = _S(_S(M(_A(X1, Z1), x2p1), t0, 4, u), t2, 8, u)          # < 15p
    t3 = _fold2(t3, eps)
    t4 = _fold2(t4, eps)
    t0_3 = _A(_A(t0, t0), t0)                            # < 9p
    t2b3 = _fold2(_mul12(t2, u), eps)                    # < 84p, r16
    z3t = _A(t1, t2b3)                                   # < 87p
    t1m = _S(t1, t2b3, 128, u)                           # < 131p
    y3b3 = _mul12(_fold2(xz, eps), u)                    # < 180p
    X3 = _S(M(t3, t1m), M(t4, y3b3), 4, u)               # < 7p
    Y3 = _A(M(y3b3, t0_3), M(t1m, z3t))                  # < 6p
    Z3 = _A(M(z3t, t4), M(t0_3, t3))                     # < 6p
    return jnp.concatenate(
        [_fold2(X3, eps), _fold2(Y3, eps), _fold2(Z3, eps)], axis=0)


# -- composed (no-pallas) wrappers: CPU oracle + small batches ---------------

def rns_mul(a, b):
    """(CH, *batch) x (CH, *batch) -> (CH, *batch), composed jnp."""
    u, invm, mats = consts_dev()
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    n = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
    a2 = jnp.broadcast_to(a, shape).reshape(CH, n)
    b2 = jnp.broadcast_to(b, shape).reshape(CH, n)
    return rns_mul_body(a2, b2, u, invm, mats).reshape(shape)


def rns_padd(p, q, negate_q: bool = False):
    """(3, CH, *batch) complete add, composed jnp or fused kernel."""
    fused = padd_fused(p, q, negate_q)
    if fused is not None:
        return fused
    u, invm, mats = consts_dev()
    shape = jnp.broadcast_shapes(p.shape, q.shape)
    n = int(np.prod(shape[2:], dtype=np.int64)) if len(shape) > 2 else 1
    p2 = jnp.broadcast_to(p, shape).reshape(3 * CH, n)
    q2 = jnp.broadcast_to(q, shape).reshape(3 * CH, n)
    out = padd_body(p2, q2, u, invm, mats, negate_q)
    return out.reshape(shape)


def rns_identity(batch_shape=()):
    """(3, CH, *batch) identity (0 : 1~ : 0) built on device."""
    u, _, _ = consts_dev()
    one = u[U_ONE, :, 0]                                 # (CH,)
    base = jnp.stack([jnp.zeros_like(one), one, jnp.zeros_like(one)])
    t = base.reshape((3, CH) + (1,) * len(batch_shape))
    return jnp.broadcast_to(t, (3, CH) + tuple(batch_shape))


# -- pallas kernels ----------------------------------------------------------

def _mode() -> str:
    from .pallas_mont import _mode as m

    return m()


def _specs(pl, pltpu, rows, lane):
    return pl.BlockSpec((rows, lane), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _const_specs(pl, pltpu):
    uspec = pl.BlockSpec((NU, CH, 1), lambda *a: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((2, K, 1), lambda *a: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((2, 3 * K, 2 * (K + 1)), lambda *a: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    return uspec, ispec, mspec


@functools.cache
def _padd_kernel(negate_q: bool, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(u_ref, i_ref, m_ref, p_ref, q_ref, o_ref):
        o_ref[:] = padd_body(p_ref[:], q_ref[:], u_ref[:, :, 0][..., None],
                             i_ref[:, :, 0][..., None], m_ref[:], negate_q)

    @jax.jit
    def call(p, q):
        n = p.shape[-1]
        u, invm, mats = consts_dev()
        spec = _specs(pl, pltpu, 3 * CH, LANE_TILE)
        uspec, ispec, mspec = _const_specs(pl, pltpu)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3 * CH, n), jnp.uint32),
            grid=(n // LANE_TILE,),
            in_specs=[uspec, ispec, mspec, spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(u, invm, mats, p, q)

    return call


def padd_fused(p, q, negate_q: bool = False):
    """Fused kernel for (3, CH, *batch), or None (fallback to composed)."""
    mode = _mode()
    if mode == "off":
        return None
    shape = jnp.broadcast_shapes(p.shape, q.shape)
    n = int(np.prod(shape[2:], dtype=np.int64)) if len(shape) > 2 else 1
    if n < LANE_TILE:
        return None
    p = jnp.broadcast_to(p, shape).reshape(3 * CH, n)
    q = jnp.broadcast_to(q, shape).reshape(3 * CH, n)
    pad = (-n) % LANE_TILE
    if pad:
        zz = jnp.zeros((3 * CH, pad), jnp.uint32)
        p = jnp.concatenate([p, zz], axis=-1)
        q = jnp.concatenate([q, zz], axis=-1)
    out = _padd_kernel(negate_q, interpret=(mode == "interpret"))(p, q)
    if pad:
        out = out[:, :n]
    return out.reshape(shape)


@functools.cache
def _scan_kernel_affine(block: int, interpret: bool = False):
    """Blocked mixed-add prefix scan: x (block, 2*CH, m) affine slabs ->
    (block, 3*CH, m) inclusive intra-block prefixes (same contract as
    pallas_g1._scan_kernel_affine)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(u_ref, i_ref, m_ref, x_ref, o_ref, carry_ref):
        j = pl.program_id(1)
        u = u_ref[:, :, 0][..., None]
        iv = i_ref[:, :, 0][..., None]

        @pl.when(j == 0)
        def _():
            xa = x_ref[0]
            one = jnp.broadcast_to(u[U_ONE], (CH, xa.shape[-1]))
            carry_ref[:] = jnp.concatenate([xa, one], axis=0)

        @pl.when(j > 0)
        def _():
            carry_ref[:] = padd_mixed_body(carry_ref[:], x_ref[0], u, iv,
                                           m_ref[:])

        o_ref[0] = carry_ref[:]

    @jax.jit
    def call(x):
        m = x.shape[-1]
        u, invm, mats = consts_dev()
        ispec = pl.BlockSpec((1, 2 * CH, LANE_TILE), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, 3 * CH, LANE_TILE), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM)
        uspec, iv_spec, mspec = _const_specs(pl, pltpu)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((block, 3 * CH, m), jnp.uint32),
            grid=(m // LANE_TILE, block),
            in_specs=[uspec, iv_spec, mspec, ispec],
            out_specs=ospec,
            scratch_shapes=[pltpu.VMEM((3 * CH, LANE_TILE), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(u, invm, mats, x)

    return call


@functools.cache
def _scan_kernel_affine_rows(block: int, interpret: bool = False):
    """Row-major variant of the affine scan: x (block, m, 2*CH) u16 ROWS
    (gather output order — no host-side transpose of the 400 MB payload),
    transposed to channel-major per-tile in VMEM.  Output layout unchanged:
    (block, 3*CH, m) u32 intra prefixes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(u_ref, i_ref, m_ref, x_ref, o_ref, carry_ref):
        j = pl.program_id(1)
        u = u_ref[:, :, 0][..., None]
        iv = i_ref[:, :, 0][..., None]
        xa = jnp.transpose(
            x_ref[0].astype(jnp.int32).astype(jnp.uint32), (1, 0))

        @pl.when(j == 0)
        def _():
            one = jnp.broadcast_to(u[U_ONE], (CH, xa.shape[-1]))
            carry_ref[:] = jnp.concatenate([xa, one], axis=0)

        @pl.when(j > 0)
        def _():
            carry_ref[:] = padd_mixed_body(carry_ref[:], xa, u, iv,
                                           m_ref[:])

        o_ref[0] = carry_ref[:]

    @jax.jit
    def call(x):
        m = x.shape[1]
        u, invm, mats = consts_dev()
        ispec = pl.BlockSpec((1, LANE_TILE, 2 * CH), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, 3 * CH, LANE_TILE), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM)
        uspec, iv_spec, mspec = _const_specs(pl, pltpu)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((block, 3 * CH, m), jnp.uint32),
            grid=(m // LANE_TILE, block),
            in_specs=[uspec, iv_spec, mspec, ispec],
            out_specs=ospec,
            scratch_shapes=[pltpu.VMEM((3 * CH, LANE_TILE), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(u, invm, mats, x)

    return call


@functools.cache
def _scan_kernel(block: int, interpret: bool = False):
    """Projective blocked prefix scan (block totals, suffix reductions)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(u_ref, i_ref, m_ref, x_ref, o_ref, carry_ref):
        j = pl.program_id(1)
        u = u_ref[:, :, 0][..., None]
        iv = i_ref[:, :, 0][..., None]

        @pl.when(j == 0)
        def _():
            carry_ref[:] = x_ref[0]

        @pl.when(j > 0)
        def _():
            carry_ref[:] = padd_body(carry_ref[:], x_ref[0], u, iv,
                                     m_ref[:])

        o_ref[0] = carry_ref[:]

    @jax.jit
    def call(x):
        m = x.shape[-1]
        u, invm, mats = consts_dev()
        spec = pl.BlockSpec((1, 3 * CH, LANE_TILE), lambda i, j: (j, 0, i),
                            memory_space=pltpu.VMEM)
        uspec, iv_spec, mspec = _const_specs(pl, pltpu)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((block, 3 * CH, m), jnp.uint32),
            grid=(m // LANE_TILE, block),
            in_specs=[uspec, iv_spec, mspec, spec],
            out_specs=spec,
            scratch_shapes=[pltpu.VMEM((3 * CH, LANE_TILE), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(u, invm, mats, x)

    return call
