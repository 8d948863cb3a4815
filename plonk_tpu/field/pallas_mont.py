"""Pallas TPU kernel for fused Montgomery multiplication.

The jnp path in mont.py materializes the (L, L, batch) partial-product tensor
and the (2L+1, batch) column sums in HBM — a 33-49x transient blowup that both
caps batch sizes (OOM at 8n = 2^19) and burns bandwidth.  This kernel computes
the whole product -> reduce -> carry-resolve -> conditional-subtract chain on
VMEM tiles: HBM traffic is exactly read(a) + read(b) + write(out).

Layout: operands are (L, N) uint32 16-bit limb tensors (limbs on sublanes,
batch on lanes), tiled as (L, LANE_TILE) blocks over a 1-D grid.  All loops
are static and fully unrolled — branch-free VPU code, same algorithm as
mont.py (full-width Montgomery, one ripple + Kogge-Stone carry resolve).

Dispatch: Field.mul routes here when the default backend is TPU and the
batch is large enough to amortize the launch; the jnp path remains the
CPU/interpret oracle (cross-checked in tests/test_field_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

W = 16
MASK = np.uint32((1 << W) - 1)
LANE_TILE = 512


def _conv_cols(a, b, L: int):
    """Column sums of the schoolbook product: (2L+1, T) u32.

    Full-tile formulation: row k needs sum_i lo(a_i*b_{k-i}) + hi(a_i*b_{k-1-i}),
    i.e. the (L+1, T) lo/hi block of each a_i*b product dropped in at row
    offset i.  Accumulating whole shifted blocks keeps every VPU op at full
    (sublane, lane) width — the previous per-output-row gather issued ~4.7k
    (1, T) ops per mul at 1/8 sublane utilization and dominated kernel time.
    Row sums stay < 2L * 2^16 <= 2^21.6, no u32 overflow."""
    T = a.shape[-1]
    zrow = jnp.zeros((1, T), jnp.uint32)
    acc = None
    for i in range(L):
        p = a[i][None, :] * b                        # (L, T), < 2^32
        blk = (jnp.concatenate([p & MASK, zrow], axis=0)
               + jnp.concatenate([zrow, p >> W], axis=0))  # (L+1, T)
        # Mosaic rejects zero-size vectors, so only emit non-empty pads.
        parts = [blk]
        if i:
            parts.insert(0, jnp.zeros((i, T), jnp.uint32))
        if L - i:
            parts.append(jnp.zeros((L - i, T), jnp.uint32))
        shifted = jnp.concatenate(parts, axis=0)     # (2L+1, T)
        acc = shifted if acc is None else acc + shifted
    return acc


def _shift_up(x, d: int = 1):
    zeros = jnp.zeros((d,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([zeros, x[:-d]], axis=0)


def _resolve(acc):
    """Carry-resolve to 16-bit limbs (mont.py Field._resolve, same algebra)."""
    K = acc.shape[0]
    c = acc >> W
    s = (acc & MASK) + _shift_up(c)
    g = s >> W
    p = ((s & MASK) == MASK).astype(jnp.uint32)
    d = 1
    while d < K:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    return (s + _shift_up(g)) & MASK


def _conv_cols_const(a, cvec, L: int):
    """Column sums of a * const-vector: constants enter as scalar literals
    (Pallas kernels cannot capture array constants); scatter-free."""
    T = a.shape[-1]
    ps = {j: a * jnp.uint32(cj) for j, cj in enumerate(cvec) if cj}
    zero = jnp.zeros((1, T), jnp.uint32)
    rows = []
    for k in range(2 * L + 1):
        acc = zero
        for j, p in ps.items():
            i = k - j
            if 0 <= i < L:
                acc = acc + (p[i : i + 1] & MASK)
            i2 = k - 1 - j
            if 0 <= i2 < L:
                acc = acc + (p[i2 : i2 + 1] >> W)
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def _add_const_rows(x, cvec):
    """x + cvec[:, None] with cvec as scalar literals; x: (L, T).

    Legacy per-row form (1/8 sublane utilization) — kernels prefer passing
    const_cols(...) as an input and broadcasting (see _add_col)."""
    rows = [x[i : i + 1] + jnp.uint32(c) for i, c in enumerate(cvec)]
    return jnp.concatenate(rows, axis=0)


def const_cols(*vecs, plus_one=()) -> np.ndarray:
    """(k, L, 1) uint32 constant columns for kernel inputs (Mosaic cannot
    capture array constants, so they cross the boundary as operands).
    Indices in plus_one get +1 on limb 0 — folding the two's-complement +1
    of a subtract into the constant so no separate (1, T) op is needed."""
    cols = []
    for idx, v in enumerate(vecs):
        c = np.asarray(v, np.uint32).reshape(-1, 1).copy()
        if idx in plus_one:
            c[0, 0] += 1
        cols.append(c)
    return np.stack(cols)


# -- MXU const-convolution ----------------------------------------------------
#
# The two Montgomery-reduction convolutions (t * n' and m * p) have a CONSTANT
# operand, so they factor as banded-matrix products y = M_c . x8 over the limb
# axis — an MXU matmul shared by every lane.  Operands go in as 8-bit chunks
# (exact in bfloat16); accumulation is f32-exact: products < 2^16, <= 2L <= 48
# terms => sums < 2^22 < 2^24.  Even/odd output chunks are two matmuls so the
# 2^8 recombination happens exactly in uint32.

def conv_const_matrices(cvec, L: int) -> np.ndarray:
    """(2, 2L+1, 2L) bf16 banded matrices [even; odd] for a 16-bit limb
    constant vector; passed into kernels as an input (Pallas kernels cannot
    capture array constants)."""
    c8 = np.zeros(2 * L, np.uint32)
    for j, c in enumerate(cvec):
        c8[2 * j] = c & 0xFF
        c8[2 * j + 1] = (c >> 8) & 0xFF
    me = np.zeros((2 * L + 1, 2 * L), np.float32)
    mo = np.zeros((2 * L + 1, 2 * L), np.float32)
    for k in range(2 * L + 1):
        for j8 in range(2 * L):
            if 0 <= 2 * k - j8 < 2 * L:
                me[k, j8] = c8[2 * k - j8]
            if 0 <= 2 * k + 1 - j8 < 2 * L:
                mo[k, j8] = c8[2 * k + 1 - j8]
    import jax.numpy as _jnp

    return np.stack([me, mo]).astype(_jnp.bfloat16)


def _split8(x, L: int):
    """(L, T) 16-bit limbs -> (2L, T) interleaved 8-bit chunks."""
    lo = x & jnp.uint32(0xFF)
    hi = (x >> 8) & jnp.uint32(0xFF)
    return jnp.stack([lo, hi], axis=1).reshape(2 * L, x.shape[-1])


def _conv_const_mxu(x, mats, L: int):
    """Column sums of x * const via two MXU matmuls; mats: (2, 2L+1, 2L).

    Casts chain through int32/float32 (Mosaic has no direct u32<->bf16);
    every value is a small exact integer so each step is lossless."""
    x8 = (_split8(x, L).astype(jnp.int32)
          .astype(jnp.float32).astype(jnp.bfloat16))
    ye = jax.lax.dot_general(
        mats[0], x8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    yo = jax.lax.dot_general(
        mats[1], x8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ye = ye.astype(jnp.int32).astype(jnp.uint32)
    yo = yo.astype(jnp.int32).astype(jnp.uint32)
    return ye + (yo << 8)


def _mul_body(a, b, *, L, np_limbs, p_limbs, pcomp_limbs,
              nmats=None, pmats=None, csub=True, pc1_col=None):
    """(L, T), (L, T) Montgomery residues -> (L, T) product (mont.py mul).

    With csub=False the conditional subtract is skipped and the result stays
    in redundant [0, 2p) form — valid whenever 4p < 2^(16L) (true for Fp,
    not Fr) and the operands are < 2p: U < ab/R + p < 2p.

    pc1_col: optional (L, 1) kernel input holding pcomp with +1 folded into
    limb 0 — the full-tile path for the conditional subtract."""
    acc = _conv_cols(a, b, L)                       # (2L+1, T)
    t_lo = _resolve(acc[: L + 1])[:L]
    if nmats is not None:
        m = _resolve(_conv_const_mxu(t_lo, nmats, L)[: L + 1])[:L]
        mn = _conv_const_mxu(m, pmats, L)
    else:
        m = _resolve(_conv_cols_const(t_lo, np_limbs, L)[: L + 1])[:L]
        mn = _conv_cols_const(m, p_limbs, L)
    U = _resolve(acc + mn)                          # low L limbs zero
    hi, top = U[L : 2 * L], U[2 * L]
    if not csub:
        return hi

    # conditional subtract p (value = hi + top*2^(16L) < 2p)
    if pc1_col is not None:
        s = hi + pc1_col
    else:
        s = _add_const_rows(hi, pcomp_limbs)
        s = jnp.concatenate([(s[0] + 1)[None], s[1:]], axis=0)
    ext = jnp.concatenate([s, jnp.zeros((1,) + hi.shape[1:], jnp.uint32)], axis=0)
    Us = _resolve(ext)
    take = (top > 0) | (Us[L] == 1)
    return jnp.where(take[None, :], Us[:L], hi)


@functools.cache
def _mul_kernel(L: int, np_limbs: tuple, p_limbs: tuple, pcomp: tuple,
                interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nmats_np = conv_const_matrices(np_limbs, L)
    pmats_np = conv_const_matrices(p_limbs, L)
    ccols_np = const_cols(pcomp, plus_one=(0,))     # (1, L, 1)

    def kernel(nm_ref, pm_ref, c_ref, a_ref, b_ref, o_ref):
        o_ref[:] = _mul_body(
            a_ref[:], b_ref[:], L=L, np_limbs=np_limbs, p_limbs=p_limbs,
            pcomp_limbs=pcomp, nmats=nm_ref[:], pmats=pm_ref[:],
            pc1_col=c_ref[0])

    @jax.jit
    def call(a, b):
        n = a.shape[-1]
        grid = (n // LANE_TILE,)
        spec = pl.BlockSpec((L, LANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((2, 2 * L + 1, 2 * L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((1, L, 1), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=grid,
            in_specs=[cspec, cspec, kspec, spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(jnp.asarray(nmats_np), jnp.asarray(pmats_np),
          jnp.asarray(ccols_np), a, b)

    return call


def _mode() -> str:
    """'off' | 'compiled' | 'interpret' (CPU testing of the kernel logic)."""
    import os

    flag = os.environ.get("PLONK_PALLAS", "auto")
    if flag in ("0", "off"):
        return "off"
    if flag == "interpret":
        return "interpret"
    if flag in ("1", "on"):
        return "compiled"
    try:
        return "compiled" if jax.default_backend() != "cpu" else "off"
    except Exception:
        return "off"


def mont_mul(field, a, b):
    """Pallas-tiled Montgomery mul for (L, *batch) tensors, or None to
    fall back to the jnp path (CPU backend / tiny batches / odd shapes)."""
    mode = _mode()
    if mode == "off":
        return None
    L = field.L
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    n = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
    if n < LANE_TILE:
        return None
    a = jnp.broadcast_to(a, shape).reshape(L, n)
    b = jnp.broadcast_to(b, shape).reshape(L, n)
    pad = (-n) % LANE_TILE
    if pad:
        a = jnp.concatenate([a, jnp.zeros((L, pad), jnp.uint32)], axis=-1)
        b = jnp.concatenate([b, jnp.zeros((L, pad), jnp.uint32)], axis=-1)
    call = _mul_kernel(
        L, tuple(field.nprime_limbs.tolist()), tuple(field.p_limbs.tolist()),
        tuple(field.p_comp_limbs.tolist()), interpret=(mode == "interpret"))
    out = call(a, b)
    if pad:
        out = out[:, :n]
    return out.reshape(shape)


# -- fused add / sub ----------------------------------------------------------

def _add_body(a, b, L, p_limbs, pcomp_limbs, cols=None):
    """cols: optional (2, L, 1) kernel input [p +1 folded, pcomp +1 folded]."""
    ext = jnp.concatenate(
        [a + b, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], axis=0)
    U = _resolve(ext)
    return _csub_body(U[:L], U[L], L, pcomp_limbs, cols)


def _sub_body(a, b, L, p_limbs, pcomp_limbs, cols=None):
    if cols is not None:
        s = a + (MASK - b) + cols[0]
    else:
        s = _add_const_rows(a + (MASK - b), p_limbs)
        s = jnp.concatenate([(s[0] + 1)[None], s[1:]], axis=0)
    ext = jnp.concatenate(
        [s, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], axis=0)
    U = _resolve(ext)
    return _csub_body(U[:L], U[L] - 1, L, pcomp_limbs, cols)


def _csub_body(a, top, L, pcomp_limbs, cols=None):
    if cols is not None:
        s = a + cols[1]
    else:
        s = _add_const_rows(a, pcomp_limbs)
        s = jnp.concatenate([(s[0] + 1)[None], s[1:]], axis=0)
    ext = jnp.concatenate(
        [s, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], axis=0)
    U = _resolve(ext)
    take = (top > 0) | (U[L] == 1)
    return jnp.where(take[None, :], U[:L], a)


@functools.cache
def _addsub_kernel(op: str, L: int, p_limbs: tuple, pcomp: tuple,
                   interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    body = _add_body if op == "add" else _sub_body
    ccols_np = const_cols(p_limbs, pcomp, plus_one=(0, 1))

    def kernel(c_ref, a_ref, b_ref, o_ref):
        o_ref[:] = body(a_ref[:], b_ref[:], L, p_limbs, pcomp, cols=c_ref[:])

    @jax.jit
    def call(a, b):
        n = a.shape[-1]
        grid = (n // LANE_TILE,)
        spec = pl.BlockSpec((L, LANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((2, L, 1), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=grid,
            in_specs=[kspec, spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(jnp.asarray(ccols_np), a, b)

    return call


def mont_addsub(field, a, b, op: str):
    """Fused modular add/sub for (L, *batch) tensors, or None (fallback)."""
    mode = _mode()
    if mode == "off":
        return None
    L = field.L
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    n = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
    if n < LANE_TILE:
        return None
    a = jnp.broadcast_to(a, shape).reshape(L, n)
    b = jnp.broadcast_to(b, shape).reshape(L, n)
    pad = (-n) % LANE_TILE
    if pad:
        zz = jnp.zeros((L, pad), jnp.uint32)
        a = jnp.concatenate([a, zz], axis=-1)
        b = jnp.concatenate([b, zz], axis=-1)
    call = _addsub_kernel(
        op, L, tuple(field.p_limbs.tolist()),
        tuple(field.p_comp_limbs.tolist()), interpret=(mode == "interpret"))
    out = call(a, b)
    if pad:
        out = out[:, :n]
    return out.reshape(shape)


# -- fused NTT butterfly ------------------------------------------------------
#
# One radix-2 DIT stage is (u, t, tw) -> (u + t*tw, u - t*tw): a Montgomery
# mul plus an add and a sub.  Composed that is 3 kernel launches and 5 HBM
# passes of the full batch per stage; fused it is ONE launch that reads three
# tensors and writes two, with the product held in VMEM.

@functools.cache
def _butterfly_kernel(L: int, np_limbs: tuple, p_limbs: tuple, pcomp: tuple,
                      interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nmats_np = conv_const_matrices(np_limbs, L)
    pmats_np = conv_const_matrices(p_limbs, L)
    ccols_np = const_cols(p_limbs, pcomp, plus_one=(0, 1))

    def kernel(nm_ref, pm_ref, c_ref, u_ref, t_ref, tw_ref, x_ref, y_ref):
        u = u_ref[:]
        cols = c_ref[:]
        prod = _mul_body(
            t_ref[:], tw_ref[:], L=L, np_limbs=np_limbs, p_limbs=p_limbs,
            pcomp_limbs=pcomp, nmats=nm_ref[:], pmats=pm_ref[:],
            pc1_col=cols[1])
        x_ref[:] = _add_body(u, prod, L, p_limbs, pcomp, cols=cols)
        y_ref[:] = _sub_body(u, prod, L, p_limbs, pcomp, cols=cols)

    @jax.jit
    def call(u, t, tw):
        n = u.shape[-1]
        grid = (n // LANE_TILE,)
        spec = pl.BlockSpec((L, LANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((2, 2 * L + 1, 2 * L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((2, L, 1), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((L, n), jnp.uint32),
                       jax.ShapeDtypeStruct((L, n), jnp.uint32)],
            grid=grid,
            in_specs=[cspec, cspec, kspec, spec, spec, spec],
            out_specs=[spec, spec],
            interpret=interpret,
        )(jnp.asarray(nmats_np), jnp.asarray(pmats_np),
          jnp.asarray(ccols_np), u, t, tw)

    return call


def mont_butterfly(field, u, t, tw):
    """(u + t*tw, u - t*tw) mod p for (L, *batch) tensors, or None."""
    mode = _mode()
    if mode == "off":
        return None
    L = field.L
    shape = jnp.broadcast_shapes(u.shape, t.shape, tw.shape)
    n = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
    if n < LANE_TILE:
        return None
    u = jnp.broadcast_to(u, shape).reshape(L, n)
    t = jnp.broadcast_to(t, shape).reshape(L, n)
    tw = jnp.broadcast_to(tw, shape).reshape(L, n)
    pad = (-n) % LANE_TILE
    if pad:
        zz = jnp.zeros((L, pad), jnp.uint32)
        u = jnp.concatenate([u, zz], axis=-1)
        t = jnp.concatenate([t, zz], axis=-1)
        tw = jnp.concatenate([tw, zz], axis=-1)
    call = _butterfly_kernel(
        L, tuple(field.nprime_limbs.tolist()), tuple(field.p_limbs.tolist()),
        tuple(field.p_comp_limbs.tolist()), interpret=(mode == "interpret"))
    x, y = call(u, t, tw)
    if pad:
        x, y = x[:, :n], y[:, :n]
    return x.reshape(shape), y.reshape(shape)
