"""Scatter-free Pippenger multi-scalar multiplication on TPU.

Counterpart of dusk-bls12_381's `msm_variable_base` (consumed at
/root/reference/src/commitment_scheme/kzg10/key.rs:14,222) — every KZG commit
is one of these.  The reference's Pippenger uses scalar bucket *scatter*
accumulation; TPUs have no fast scatter, so the design is:

  1. slice scalars into c-bit window digits                  (bit math, VPU)
  2. per window: sort point indices by digit                 (XLA sort)
  3. one *inclusive prefix scan* of points in sorted order   (blocked lax.scan)
  4. bucket sum = prefix[end_b] - prefix[start_b]            (searchsorted + gather)
  5. weighted bucket reduction via suffix sums               (same scan machinery)
  6. window combine on host (c doublings per window, ~300 tiny host ops)

All windows are batched into one leading axis, so phases 3-5 are single wide
SIMD programs of total work ~= (255/c) * n point-adds — the same asymptotic
work as serial Pippenger, with no scatter and no data-dependent shapes.
Zero scalars cost nothing (digit 0 buckets are skipped by the weighting), so
fixed-size MSMs with zero-padded scalars are free — commits of any degree reuse
one compiled executable.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..field import FR, FP
from . import g1_device as g1
from .bls12_381 import G1

WINDOW_BITS = 13
SCAN_BLOCK = 64


def best_window_bits(n: int) -> int:
    """Pippenger window width for an n-point MSM.

    Balances scan work over points (~(255/c)*n adds) against bucket-phase work
    (~(255/c)*2^c adds): optimum near c = log2(n) - log2(log2(n)).  Clamped to
    [4, WINDOW_BITS]; tiny MSMs still pay 255/c windows so keep c small there.
    """
    if n <= 32:
        return 4
    lg = max(1, n.bit_length() - 1)
    return max(4, min(WINDOW_BITS, lg - max(0, lg.bit_length() - 2)))


def window_digits(scalars_canonical, c: int = WINDOW_BITS):
    """(16, n) canonical Fr limbs -> (W, n) int32 window digits, W = ceil(256/c)."""
    nbits = 16 * FR.L
    W = -(-nbits // c)
    outs = []
    for w in range(W):
        off = w * c
        j, sh = off >> 4, off & 15
        d = scalars_canonical[j] >> sh
        if sh + c > 16 and j + 1 < FR.L:
            d = d | (scalars_canonical[j + 1] << (16 - sh))
        if sh + c > 32 and j + 2 < FR.L:
            d = d | (scalars_canonical[j + 2] << (32 - sh))
        outs.append(d & jnp.uint32((1 << c) - 1))
    return jnp.stack(outs).astype(jnp.int32)


def _prefix_scan_points(pts, block: int = SCAN_BLOCK):
    """Inclusive prefix 'sum' (group add) of points along the LAST axis.

    pts: (3, L, *batch, n). Blocked: sequential depth ~block per level,
    vectorized across everything else.  Large inputs route to the fused
    single-launch Pallas scan (pallas_g1.prefix_scan); this composed path is
    the recursion terminal and the CPU/interpret oracle.
    """
    from . import pallas_g1

    fused = pallas_g1.prefix_scan(pts, block)
    if fused is not None:
        return fused
    n = pts.shape[-1]
    if n <= block:
        return _scan_points_last_axis(pts)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        idpad = g1.identity_dev(pts.shape[2:-1] + (pad,))
        pts = jnp.concatenate([pts, idpad], axis=-1)
    blocks = pts.reshape(pts.shape[:-1] + (nb, block))
    intra = _scan_points_last_axis(blocks)             # per-block inclusive
    totals = intra[..., -1]                            # (3, L, *batch, nb)
    tot_incl = _prefix_scan_points(totals, block=block)
    idfirst = g1.identity_dev(totals.shape[2:-1] + (1,))
    tot_excl = jnp.concatenate([idfirst, tot_incl[..., :-1]], axis=-1)
    out = g1.padd(intra, tot_excl[..., None])
    return out.reshape(out.shape[:-2] + (nb * block,))[..., :n]


def _scan_points_last_axis(pts):
    """Sequential inclusive scan along last axis via lax.scan (carry-wide)."""
    moved = jnp.moveaxis(pts, -1, 0)  # (n, 3, L, *batch)

    def step(carry, x):
        y = g1.padd(carry, x)
        return y, y

    init = g1.identity_dev(pts.shape[2:-1])
    _, ys = lax.scan(step, init, moved)
    return jnp.moveaxis(ys, 0, -1)


def _sum_points_last_axis(pts, block: int = SCAN_BLOCK):
    """Group sum along last axis: fold blocks sequentially, then fold the rest."""
    from . import pallas_g1

    fused = pallas_g1.prefix_scan(pts, block)
    if fused is not None:
        return fused[..., -1]
    n = pts.shape[-1]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        idpad = g1.identity_dev(pts.shape[2:-1] + (pad,))
        pts = jnp.concatenate([pts, idpad], axis=-1)
    blocks = jnp.moveaxis(pts.reshape(pts.shape[:-1] + (nb, block)), -1, 0)

    def step(carry, x):
        return g1.padd(carry, x), None

    init = g1.identity_dev(pts.shape[2:-1] + (nb,))
    totals, _ = lax.scan(step, init, blocks)           # (3, L, *batch, nb)
    if nb == 1:
        return totals[..., 0]
    return _sum_points_last_axis(totals, block=block)


# -- flat fixed-base MSM (precomputed limb shifts) ----------------------------
#
# Commit bases (the SRS) are fixed across proves, so each base P_i can be
# pre-shifted to P_i * 2^(16w), w = 0..15.  A commitment then collapses to a
# SINGLE-window MSM over 16n (point, digit) pairs whose digits are exactly the
# canonical 16-bit scalar limbs: no digit extraction, no per-window bucket
# reduction (one weighted suffix pass over 2^16 buckets), and no host window
# combine — the reduced point IS the commitment.  The reference's Pippenger
# (dusk-bls12_381 msm_variable_base, key.rs:14) has no fixed-base fast path.

FLAT_W = 16  # windows == scalar limbs (c = 16)
FLAT_BUCKETS = 1 << 16  # bucket count (tests shrink it with bounded digits)


@functools.cache
def _double16_jit(n: int):
    def f(pts):
        for _ in range(16):
            pts = g1.padd(pts, pts)
        return pts

    return jax.jit(f)


@functools.cache
def _normalize_jit(n: int):
    def f(pts):
        # (16, 3, L, n) projective, no identities -> (16, 2, L, n) affine.
        # The field layer's contract is limb-axis-FIRST, so flatten each
        # coordinate to (L, 16n) before FP ops and restore after.
        X, Y, Z = pts[:, 0], pts[:, 1], pts[:, 2]          # each (16, L, n)

        def limb_first(t):
            return t.swapaxes(0, 1).reshape(FP.L, FLAT_W * n)

        def limb_back(t):
            return t.reshape(FP.L, FLAT_W, n).swapaxes(0, 1)

        zinv = FP.batch_inverse(limb_first(Z))             # (L, 16n)
        xa = limb_back(FP.mul(limb_first(X), zinv))
        ya = limb_back(FP.mul(limb_first(Y), zinv))
        return jnp.stack([xa, ya], axis=1)

    return jax.jit(f)


def precompute_shifts(points):
    """(3, L, n) base points -> (16, n, 2, L): slot [w, i] = P_i * 2^(16w),
    AFFINE (canonical Montgomery x, y).

    PRECONDITION: no base may be the identity (affine can't represent it,
    and a zero Z would poison the shared Montgomery-trick inversion).  SRS
    commit bases are powers tau^i * G, never identity (srs.rs:71).

    Affine point-major rows make the sorted gather read contiguous 192-byte
    rows (vs 288 projective), and the scan's first level uses the mixed
    Z2=1 addition (11 muls).  One batched Z-inversion (Montgomery trick)
    normalizes all 16n shifts; SRS powers are never the identity.  Chunked
    as 15 jitted 16-double steps so test-sized keys compile tiny graphs."""
    rows = [jnp.asarray(points)]
    for _ in range(FLAT_W - 1):
        rows.append(_double16_jit(points.shape[-1])(rows[-1]))
    stacked = jnp.stack(rows, axis=0)              # (16, 3, L, n)
    affine = _normalize_jit(points.shape[-1])(stacked)  # (16, 2, L, n)
    return jnp.transpose(affine, (0, 3, 1, 2))     # (16, n, 2, L)


def msm_flat_device(shifted, scalars_mont):
    """K MSMs against pre-shifted AFFINE bases. shifted: (16, n, 2, L);
    scalars_mont: (16, n) or (16, K, n). Returns (3, L[, K]) result points.

    The blocked scan's carry fold is applied ONLY at the 2*2^16 gathered
    bucket boundaries (prefix_scan_affine_parts), not across all 16n
    prefixes — the O(16n) full-prefix fold was ~half the scan's work."""
    from . import pallas_g1

    batched = scalars_mont.ndim == 3
    if not batched:
        scalars_mont = scalars_mont[:, None, :]
    K = scalars_mont.shape[1]
    n = scalars_mont.shape[-1]
    Wn = FLAT_W * n
    digits = FR.from_mont(scalars_mont).astype(jnp.int32)   # (16, K, n)
    dflat = jnp.moveaxis(digits, 0, 1).reshape(K, Wn)       # w-major per k
    rows = shifted.reshape(Wn, 2 * FP.L)
    perm = jnp.argsort(dflat, axis=-1)
    keys = jnp.take_along_axis(dflat, perm, axis=-1)        # (K, Wn) sorted
    srows = jnp.take(rows, perm, axis=0)                    # (K, Wn, 48)
    spts = jnp.moveaxis(srows, -1, 0).reshape(2, FP.L, K, Wn)

    nb = FLAT_BUCKETS
    bucket_ids = jnp.arange(nb, dtype=jnp.int32)
    starts = jax.vmap(
        lambda sk: jnp.searchsorted(sk, bucket_ids, side="left"))(keys)
    ends = jax.vmap(
        lambda sk: jnp.searchsorted(sk, bucket_ids, side="right"))(keys)

    parts = pallas_g1.prefix_scan_affine_parts(spts, SCAN_BLOCK)
    if parts is None:
        # CPU/interpret terminal: lift to projective (Z = 1) and reuse the
        # generic scan; materialize the full prefix
        one = g1.identity_dev((K, Wn))[1:2]
        pref = _prefix_scan_points(jnp.concatenate([spts, one], axis=0))
        idfirst = g1.identity_dev((K, 1))
        pref_excl = jnp.concatenate([idfirst, pref], axis=-1)
        P_s = jnp.take_along_axis(pref_excl, starts[None, None], axis=-1)
        P_e = jnp.take_along_axis(pref_excl, ends[None, None], axis=-1)
    else:
        intra, tot_excl = parts                 # (3,L,K,Wn), (3,L,K,Wn/blk)

        def excl_at(pos):
            # exclusive prefix at pos: intra[pos-1] + tot_excl[(pos-1)//blk],
            # identity at pos == 0 (gathers clamp, then mask)
            pm1 = jnp.maximum(pos - 1, 0)
            ia = jnp.take_along_axis(intra, pm1[None, None], axis=-1)
            tb = jnp.take_along_axis(
                tot_excl, (pm1 // SCAN_BLOCK)[None, None], axis=-1)
            val = g1.padd(ia, tb)
            ident = g1.identity_dev((K, pos.shape[-1]))
            return jnp.where((pos == 0)[None, None], ident, val)

        P_s = excl_at(starts)
        P_e = excl_at(ends)
    buckets = g1.psub(P_e, P_s)                             # (3, L, K, 2^16)

    rev = jnp.flip(buckets, axis=-1)
    suff = jnp.flip(_prefix_scan_points(rev), axis=-1)
    out = _sum_points_last_axis(suff[..., 1:])              # (3, L, K)
    return out if batched else out[..., 0]


@functools.cache
def _msm_flat_jit():
    return jax.jit(msm_flat_device)


def msm_flat(shifted, scalars_mont) -> list[G1]:
    """Host entry: K commitments from pre-shifted bases, one dispatch."""
    out = _msm_flat_jit()(shifted, scalars_mont)
    if out.ndim == 2:
        return g1.from_device(out)[0]
    return g1.from_device(out)


def msm_device(points, scalars_mont, c: int = WINDOW_BITS):
    """Window partial sums for K MSMs over a shared point set.

    points: (3, L, n) projective Montgomery; scalars_mont: (16, n) or
    (16, K, n) Montgomery.  Returns (3, L, W) / (3, L, K, W) — per-window
    results W_w; caller combines sum_w 2^(c*w) W_w (host, ~W*c tiny ops).

    Batched commits (the prover's 4 wire polys, 4 quotient chunks, the
    preprocessor's 15 selector/sigma polys) share one dispatch: the sorted
    prefix scans get a K-wide batch axis — same sequential depth, K times
    the SIMD width, so K commits cost ~one on TPU.
    """
    batched = scalars_mont.ndim == 3
    if not batched:
        scalars_mont = scalars_mont[:, None, :]
    K = scalars_mont.shape[1]
    scal = FR.from_mont(scalars_mont)                  # (16, K, n)
    digits = jnp.stack(
        [window_digits(scal[:, k], c) for k in range(K)], axis=1
    )                                                  # (W, K, n)
    W, _, n = digits.shape
    perm = jnp.argsort(digits, axis=-1)
    keys = jnp.take_along_axis(digits, perm, axis=-1)  # (W, K, n) sorted
    spts = jnp.take(points, perm, axis=2)              # (3, L, W, K, n)

    pref = _prefix_scan_points(spts)                   # inclusive
    idfirst = g1.identity_dev((W, K, 1))
    pref_excl = jnp.concatenate([idfirst, pref], axis=-1)  # (3, L, W, K, n+1)

    nb = 1 << c
    bucket_ids = jnp.arange(nb, dtype=jnp.int32)
    flat_keys = keys.reshape(W * K, n)
    starts = jax.vmap(
        lambda sk: jnp.searchsorted(sk, bucket_ids, side="left"))(flat_keys)
    ends = jax.vmap(
        lambda sk: jnp.searchsorted(sk, bucket_ids, side="right"))(flat_keys)
    starts = starts.reshape(W, K, nb)
    ends = ends.reshape(W, K, nb)
    P_s = jnp.take_along_axis(pref_excl, starts[None, None], axis=-1)
    P_e = jnp.take_along_axis(pref_excl, ends[None, None], axis=-1)
    buckets = g1.psub(P_e, P_s)                        # (3, L, W, K, 2^c)

    # weighted reduction: sum_b b*S_b = sum_{j>=1} T_j, T_j = sum_{b>=j} S_b
    rev = jnp.flip(buckets, axis=-1)
    suff = jnp.flip(_prefix_scan_points(rev), axis=-1)  # T_j inclusive suffix
    out = _sum_points_last_axis(suff[..., 1:])         # (3, L, W, K)
    out = jnp.moveaxis(out, -1, -2)                    # (3, L, K, W)
    return out if batched else out[:, :, 0]


@functools.cache
def _msm_jit(c):
    return jax.jit(functools.partial(msm_device, c=c))


def combine_windows_host(window_pts, c: int = WINDOW_BITS) -> G1:
    """sum_w 2^(c*w) W_w on host (top window first, c doublings between)."""
    arr = np.asarray(window_pts)
    from ..native import g1_combine_windows as native_combine

    res = native_combine(arr, c)
    if res is not None:
        return res
    pts = g1.from_device(window_pts)
    acc = G1.identity()
    for pt in reversed(pts):
        for _ in range(c):
            acc = acc + acc
        acc = acc + pt
    return acc


def _window_width(points, c: int | None) -> int:
    if c is not None:
        return c
    from ..config import get_config

    override = get_config().msm_window_bits
    return override if override else best_window_bits(points.shape[-1])


def msm(points, scalars_mont, c: int | None = None) -> G1:
    """Full MSM: device phases + host window combine. Window width adapts to
    the MSM size unless pinned by the caller or config."""
    c = _window_width(points, c)
    return combine_windows_host(_msm_jit(c)(points, scalars_mont), c)


def msm_batch(points, scalars_mont, c: int | None = None) -> list[G1]:
    """K MSMs over one point set in a single device dispatch.

    scalars_mont: (16, K, n). Returns K host points.
    """
    c = _window_width(points, c)
    windows = _msm_jit(c)(points, scalars_mont)        # (3, L, K, W)
    return [combine_windows_host(windows[:, :, k], c)
            for k in range(scalars_mont.shape[1])]
