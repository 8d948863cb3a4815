"""Flat fixed-base MSM on the RNS G1 engine — the TPU production commit path.

Same algorithm skeleton as msm.msm_flat_device (pre-shifted bases, 16x16-bit
window digits = scalar limbs, sort-by-digit, blocked prefix scan, bucket
reduction) with two upgrades:

  * All group arithmetic runs on the RNS channel engine (field/pallas_rns.py)
    — ~3x the adds/s of the limb-Montgomery kernels on TPU v5e.
  * The bucket phase TELESCOPES: with E_b := prefix sum before the first
    element of bucket b (one gather at segment starts) and E_nb := the total,

        sum_b b * S_b  =  (nb - 1) * E_nb  -  sum_{b=1..nb-1} E_b

    so the old psub + flip + suffix-scan + weighted-sum (~5*nb group adds)
    becomes one gather + one running sum (~2*nb adds), and the final
    (nb-1)-scalar-mul and subtraction happen on the host on a single point.

Table rows are stored uint16 (channel residues are < 2^16) — 200 B/point,
half the HBM traffic of the 400 B u32 layout in the sorted gather.

Reference counterpart: dusk-bls12_381 msm_variable_base consumed at
/root/reference/src/commitment_scheme/kzg10/key.rs:222 (scalar Pippenger,
no fixed-base path, no RNS).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FR, FP
from ..field.rns import get_params, K as RK, CH
from ..field import pallas_rns as prns
from ..field import params as fparams
from . import g1_device as g1
from .bls12_381 import G1
from .msm import FLAT_W, FLAT_BUCKETS, SCAN_BLOCK

P = fparams.P_MOD


# -- table conversion --------------------------------------------------------

def rns_from_limbs(x):
    """(L, N) PLAIN 16-bit limb values (< p) -> (CH, N) r16 channels.

    One chunked const matmul (limb_mat) — no kappa needed: the limb sum IS
    the value, so channel c is just (sum_l limb_l 2^16l) mod m_c."""
    u, _, _ = prns.consts_dev()
    ctx = get_params(P)
    mat = jnp.asarray(ctx.limb_mat)                      # (3CH, 2L)
    xin = jnp.concatenate([x & np.uint32(0xFF), x >> 8], axis=0)
    xin = xin.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    y3 = jax.lax.dot_general(mat, xin, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    y3 = y3.astype(jnp.int32).astype(jnp.uint32)         # (3CH, N)
    eps = u[prns.U_EPS]
    y = y3[:CH] + (y3[CH:2 * CH] << 8) + y3[2 * CH:] * eps
    return prns._fold_full(y, eps)


@functools.cache
def _shifts_to_rns_jit():
    @jax.jit
    def f(shifted):
        """(16, n, 2, L) affine limb-Montgomery table -> (16n, 2*CH) u16
        rows of M-residue channels (w-major, row = [X ch..., Y ch...])."""
        W, n = shifted.shape[0], shifted.shape[1]
        lim = jnp.transpose(shifted, (3, 0, 1, 2)).reshape(FP.L, W * n * 2)
        # xR (Montgomery) * (M mod p) via FP.mul -> plain limbs of x*M mod p
        ctx = get_params(P)
        mconst = jnp.asarray(
            np.array([(ctx.m_mod_p >> (16 * i)) & 0xFFFF
                      for i in range(FP.L)], np.uint32)[:, None])
        plain = FP.mul(lim, mconst)
        ch = rns_from_limbs(plain)                       # (CH, W*n*2)
        ch = ch.reshape(CH, W * n, 2)
        return jnp.transpose(ch, (1, 2, 0)).reshape(
            W * n, 2 * CH).astype(jnp.uint16)

    return f


def precompute_shifts_rns(shifted) -> jnp.ndarray:
    """msm.precompute_shifts output -> (16n, 2*CH) u16 RNS table rows."""
    return _shifts_to_rns_jit()(jnp.asarray(shifted))


# -- generic RNS point scans (mirrors msm._prefix_scan_points) ---------------

def _scan_points_last_axis(pts):
    """Sequential inclusive scan via lax.scan; pts (3, CH, *batch, n)."""
    moved = jnp.moveaxis(pts, -1, 0)

    def step(carry, x):
        y = prns.rns_padd(carry, x)
        return y, y

    init = prns.rns_identity(pts.shape[2:-1])
    _, ys = jax.lax.scan(step, init, moved)
    return jnp.moveaxis(ys, 0, -1)


def _fused_scan_parts(pts, block: int):
    """(3, CH, *batch, n) -> (intra, tot_excl) via the fused kernel, or
    None on CPU / small shapes.  Same contract as pallas_g1 parts."""
    if prns._mode() == "off":
        return None
    n = pts.shape[-1]
    batch = pts.shape[2:-1]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    if n < 2 * block:
        return None
    nb = -(-n // block)
    pad = nb * block - n
    x = pts.reshape(3 * CH, B, n)
    if pad:
        idp = prns.rns_identity((B, pad)).reshape(3 * CH, B, pad)
        x = jnp.concatenate([x, idp], axis=-1)
    x = jnp.moveaxis(x.reshape(3 * CH, B, nb, block), -1, 0)
    x = x.reshape(block, 3 * CH, B * nb)
    m = B * nb
    mpad = (-m) % prns.LANE_TILE
    if mpad:
        x = jnp.concatenate(
            [x, jnp.zeros((block, 3 * CH, mpad), jnp.uint32)], axis=-1)
    intra = prns._scan_kernel(
        block, interpret=(prns._mode() == "interpret"))(x)
    intra = intra[..., :m]
    totals = intra[-1].reshape(3, CH, B, nb)
    tot_incl = _prefix_scan_points(totals, block=block)
    idfirst = prns.rns_identity((B, 1))
    tot_excl = jnp.concatenate([idfirst, tot_incl[..., :-1]], axis=-1)
    intra = jnp.moveaxis(intra.reshape(block, 3, CH, B, nb), 0, -1)
    intra = intra.reshape(3, CH, B, nb * block)[..., :n]
    return (intra.reshape((3, CH) + batch + (n,)),
            tot_excl.reshape((3, CH) + batch + (nb,)))


def _prefix_scan_points(pts, block: int = SCAN_BLOCK):
    """Inclusive prefix group-add along the last axis (recursive blocked)."""
    parts = _fused_scan_parts(pts, block)
    if parts is not None:
        intra, tot_excl = parts
        n = intra.shape[-1]
        blk = jnp.arange(n) // block
        carry = jnp.take(tot_excl, blk, axis=-1)
        return prns.rns_padd(intra, carry)
    n = pts.shape[-1]
    if n <= block:
        return _scan_points_last_axis(pts)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        idpad = prns.rns_identity(pts.shape[2:-1] + (pad,))
        pts = jnp.concatenate([pts, idpad], axis=-1)
    blocks = pts.reshape(pts.shape[:-1] + (nb, block))
    intra = _scan_points_last_axis(blocks)
    totals = intra[..., -1]
    tot_incl = _prefix_scan_points(totals, block=block)
    idfirst = prns.rns_identity(totals.shape[2:-1] + (1,))
    tot_excl = jnp.concatenate([idfirst, tot_incl[..., :-1]], axis=-1)
    out = prns.rns_padd(intra, tot_excl[..., None])
    return out.reshape(out.shape[:-2] + (nb * block,))[..., :n]


def _sum_points_last_axis(pts, block: int = SCAN_BLOCK):
    """Group sum along the last axis.

    Parts-based: sum = intra[-1] + tot_excl[-1] — skips the O(n) carry
    fold a full prefix would pay."""
    parts = _fused_scan_parts(pts, block)
    if parts is None:
        return _prefix_scan_points(pts, block=block)[..., -1]
    intra, tot_excl = parts
    return prns.rns_padd(intra[..., -1], tot_excl[..., -1])


def _affine_scan_parts_rows(rows_u16, perm, Kb: int, Wn: int, block: int):
    """Gather + blocked mixed-add scan, fused layout: the permutation is
    pre-shuffled into scan order so the u16 row gather EMITS the kernel's
    (block, m, 2*CH) slab layout directly — no transpose of the ~400 MB
    payload ever materializes (the kernel transposes each (256, 2CH) tile
    in VMEM).  Returns (intra_blocked, tot_excl) like
    _affine_scan_parts_blocked."""
    nb = -(-Wn // block)
    pad = nb * block - Wn
    if pad:
        perm = jnp.concatenate(
            [perm, jnp.broadcast_to(perm[:, :1], (Kb, pad))], axis=-1)
    p2 = jnp.moveaxis(perm.reshape(Kb, nb, block), -1, 0)   # (block, K, nb)
    p2 = p2.reshape(block, Kb * nb)
    m = Kb * nb
    mpad = (-m) % prns.LANE_TILE
    if mpad:
        p2 = jnp.concatenate(
            [p2, jnp.zeros((block, mpad), p2.dtype)], axis=-1)
    srows = jnp.take(rows_u16, p2.reshape(-1), axis=0)
    srows = srows.reshape(block, m + mpad, 2 * CH)
    intra = prns._scan_kernel_affine_rows(
        block, interpret=(prns._mode() == "interpret"))(srows)
    totals = intra[-1, :, :m].reshape(3, CH, Kb, nb)
    tot_incl = _prefix_scan_points(totals, block=block)
    idfirst = prns.rns_identity((Kb, 1))
    tot_excl = jnp.concatenate([idfirst, tot_incl[..., :-1]], axis=-1)
    return intra, tot_excl


def _affine_scan_parts_blocked(spts, block: int):
    """(2, CH, K, n) AFFINE -> (intra_blocked, tot_excl), or None.

    intra_blocked is the RAW kernel layout (block, 3*CH, m_pad) with
    m = K*nb lanes ordered k*nb + b — the inclusive prefix of element
    p = b*block + j of poly k lives at [j, :, k*nb + b].  Consumers gather
    straight from this layout (gather_prefix_blocked); skipping the
    (3, CH, K, n) un-transpose saves two full passes over ~630 MB at 2^16.

    Level 0 runs the mixed Z2=1 kernel; block totals recurse through the
    projective scan.  Tail padding repeats the first point (prefixes past
    the true end are never gathered)."""
    if prns._mode() == "off":
        return None
    n = spts.shape[-1]
    Kb = spts.shape[2]
    if n < 2 * block:
        return None
    nb = -(-n // block)
    pad = nb * block - n
    x = spts.reshape(2 * CH, Kb, n)
    if pad:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[..., :1], (2 * CH, Kb, pad))], axis=-1)
    x = jnp.moveaxis(x.reshape(2 * CH, Kb, nb, block), -1, 0)
    x = x.reshape(block, 2 * CH, Kb * nb)
    m = Kb * nb
    mpad = (-m) % prns.LANE_TILE
    if mpad:
        x = jnp.concatenate(
            [x, jnp.zeros((block, 2 * CH, mpad), jnp.uint32)], axis=-1)
    intra = prns._scan_kernel_affine(
        block, interpret=(prns._mode() == "interpret"))(x)
    totals = intra[-1, :, :m].reshape(3, CH, Kb, nb)
    tot_incl = _prefix_scan_points(totals, block=block)
    idfirst = prns.rns_identity((Kb, 1))
    tot_excl = jnp.concatenate([idfirst, tot_incl[..., :-1]], axis=-1)
    return intra, tot_excl


def _gather_prefix_blocked(intra_blocked, tot_excl, pos, block, nb):
    """Exclusive prefix values at positions pos (K, npos) in [0, n*block]:
    intra[pos-1] + tot_excl[(pos-1)//block], identity at pos == 0."""
    Kb = pos.shape[0]
    pm1 = jnp.maximum(pos - 1, 0)
    j = pm1 % block                                     # step within block
    b = pm1 // block                                    # block index
    lane = jnp.arange(Kb, dtype=pos.dtype)[:, None] * nb + b
    ia = intra_blocked[j, :, lane]                      # (K, npos, 3CH)
    ia = jnp.moveaxis(ia, -1, 0).reshape(3, CH, Kb, pos.shape[-1])
    tb = jnp.take_along_axis(tot_excl, b[None, None], axis=-1)
    val = prns.rns_padd(ia, tb)
    ident = prns.rns_identity((Kb, pos.shape[-1]))
    return jnp.where((pos == 0)[None, None], ident, val)


# -- the MSM -----------------------------------------------------------------

def msm_flat_rns_device(rows_u16, scalars_mont):
    """K MSMs against an RNS table.  rows_u16: (16n, 2*CH) u16;
    scalars_mont: (16, n) or (16, K, n) Montgomery Fr.

    Returns the K result points, (3, CH[, K]) RNS projective (the
    telescoped reduction (nb-1)*E_nb - sum E_b runs on device)."""
    batched = scalars_mont.ndim == 3
    if not batched:
        scalars_mont = scalars_mont[:, None, :]
    Kb = scalars_mont.shape[1]
    n = scalars_mont.shape[-1]
    Wn = FLAT_W * n
    digits = FR.from_mont(scalars_mont).astype(jnp.int32)   # (16, K, n)
    dflat = jnp.moveaxis(digits, 0, 1).reshape(Kb, Wn)      # w-major per k
    # one variadic sort yields BOTH the sorted keys and the permutation —
    # argsort + take_along_axis re-gathers keys the sort already had
    # (~15 ms/M wasted on the minor-axis gather)
    iota = jnp.broadcast_to(
        jnp.arange(Wn, dtype=jnp.int32)[None], (Kb, Wn))
    keys, perm = jax.lax.sort((dflat, iota), dimension=-1, num_keys=1)

    nb = FLAT_BUCKETS
    # pos[b-1] = start of bucket b's segment = #keys < b, for b = 1..nb-1,
    # then Wn (E_nb = total).  Scatter-min over sorted keys + backward
    # cummin fills empty buckets — 2x faster than vmapped searchsorted.
    iota = jnp.arange(Wn, dtype=jnp.int32)

    def _starts(sk):
        st = jnp.full((nb,), Wn, jnp.int32).at[sk].min(iota, mode="drop")
        st = jax.lax.associative_scan(jnp.minimum, st, reverse=True)
        return jnp.concatenate([st[1:], jnp.full((1,), Wn, jnp.int32)])

    pos = jax.vmap(_starts)(keys)                           # (K, nb)

    use_fused = prns._mode() != "off" and Wn >= 2 * SCAN_BLOCK
    if use_fused:
        parts = _affine_scan_parts_rows(rows_u16, perm, Kb, Wn, SCAN_BLOCK)
    else:
        parts = None
    if parts is None:
        srows = jnp.take(rows_u16, perm, axis=0)            # (K, Wn, 2CH)
        spts = jnp.moveaxis(srows.astype(jnp.uint32), -1, 0)
        spts = spts.reshape(2, CH, Kb, Wn)
        one = prns.rns_identity((Kb, Wn))[1:2]
        proj = jnp.concatenate([spts, one], axis=0)
        pref = _prefix_scan_points(proj)
        idfirst = prns.rns_identity((Kb, 1))
        pref_excl = jnp.concatenate([idfirst, pref], axis=-1)
        E = jnp.take_along_axis(pref_excl, pos[None, None], axis=-1)
    else:
        intra_b, tot_excl = parts
        nblk = -(-Wn // SCAN_BLOCK)
        E = _gather_prefix_blocked(intra_b, tot_excl, pos, SCAN_BLOCK,
                                   nblk)                    # (3, CH, K, nb)
    total = E[..., -1]                                      # E_nb
    sumE = _sum_points_last_axis(E[..., :-1])               # E_1..E_{nb-1}
    out = _reduce_telescoped(total, sumE)                   # (3, CH, K)
    return out if batched else out[..., 0]


def _reduce_telescoped(total, sumE):
    """(nb-1)*E_nb - sum(E_b) ON DEVICE: 16 doublings + 2 subs on a
    K-point tensor (the host double-and-add finalize cost ~40ms on the
    prover critical path; this is ~20 tiny composed adds inside the jit)."""
    x = total
    for _ in range(16):                                     # 2^16 * total
        x = prns.rns_padd(x, x)
    x = prns.rns_padd(x, total, negate_q=True)              # (nb-1) * total
    return prns.rns_padd(x, sumE, negate_q=True)


@functools.cache
def _msm_rns_jit():
    return jax.jit(msm_flat_rns_device)


def _decode_point(ctx, arr) -> G1:
    x, y, z = (ctx.decode(np.asarray(arr)[i]) for i in range(3))
    if z == 0:
        return G1.identity()
    zi = pow(z, -1, P)
    return G1((x * zi) % P, (y * zi) % P)


def finalize_flat(result) -> list[G1]:
    """(3, CH[, K]) device result points -> host G1 (decode only)."""
    ctx = get_params(P)
    arr = np.asarray(result)
    if arr.ndim == 2:
        arr = arr[..., None]
    return [_decode_point(ctx, arr[..., k]) for k in range(arr.shape[-1])]


def msm_flat_rns(rows_u16, scalars_mont) -> list[G1] | G1:
    """Host entry: K commitments against an RNS table, one dispatch."""
    out = _msm_rns_jit()(rows_u16, scalars_mont)
    pts = finalize_flat(out)
    return pts if np.asarray(scalars_mont).ndim == 3 else pts[0]
