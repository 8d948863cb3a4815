"""Fused Pallas G1 addition vs the composed jnp path and the host oracle
(interpret mode on the CPU CI mesh)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.curve import G1
from plonk_tpu.curve import g1_device as g1
from plonk_tpu.curve import pallas_g1
from plonk_tpu.field import params

rng = random.Random(0x6A11)
R = params.R_MOD


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("PLONK_PALLAS", "interpret")


def rand_points(n):
    g = G1.generator()
    return [g.mul(rng.randrange(1, R)) for _ in range(n)]


def test_fused_padd_matches_host():
    n = pallas_g1.LANE_TILE
    a = rand_points(n - 3) + [G1.identity(), G1.generator(), G1.generator()]
    b = rand_points(n - 3) + [G1.generator(), G1.identity(), G1.generator()]
    da = jnp.asarray(g1.to_device(a))
    db = jnp.asarray(g1.to_device(b))
    out = pallas_g1.padd(da, db)
    assert out is not None
    got = g1.from_device(np.asarray(out))
    assert got == [x + y for x, y in zip(a, b)]


def test_fused_psub_matches_host():
    n = pallas_g1.LANE_TILE
    a = rand_points(n)
    b = rand_points(n - 1) + [a[-1]]  # last: p - p = identity
    da = jnp.asarray(g1.to_device(a))
    db = jnp.asarray(g1.to_device(b))
    out = pallas_g1.padd(da, db, negate_q=True)
    assert out is not None
    got = g1.from_device(np.asarray(out))
    assert got == [x + (-y) for x, y in zip(a, b)]


def test_small_batch_falls_back():
    da = jnp.asarray(g1.to_device(rand_points(4)))
    assert pallas_g1.padd(da, da) is None


def test_fused_prefix_scan_matches_oracle():
    """Fused blocked scan vs a host running-sum, across batch + padding."""
    block = 8
    n = 37                       # pad to 5 blocks of 8
    B = 64                       # 2 batch dims x lanes -> B*nb >= LANE_TILE? (forced below)
    pts = [rand_points(n) for _ in range(B)]
    dev = np.stack([np.asarray(g1.to_device(p)) for p in pts], axis=2)
    # (3, L, B, n)
    out = pallas_g1.prefix_scan(jnp.asarray(dev), block)
    assert out is not None
    for bi in (0, B // 2, B - 1):
        got = g1.from_device(np.asarray(out[:, :, bi]))
        acc = G1.identity()
        want = []
        for p in pts[bi]:
            acc = acc + p
            want.append(acc)
        assert got == want


def test_fused_prefix_scan_small_falls_back():
    dev = jnp.asarray(g1.to_device(rand_points(8)))[..., None, :]
    assert pallas_g1.prefix_scan(dev, 64) is None


def test_fused_affine_scan_matches_oracle():
    """Mixed-add (Z2=1) scan kernel vs host running-sum."""
    import numpy as _np
    from plonk_tpu.field import FP

    block = 8
    n, B = 24, 96
    pts = [rand_points(n) for _ in range(B)]
    aff = _np.zeros((2, FP.L, B, n), _np.uint32)
    for b, col in enumerate(pts):
        aff[0, :, b, :] = _np.asarray(FP.pack(
            [p.x * FP.R % FP.p for p in col]))
        aff[1, :, b, :] = _np.asarray(FP.pack(
            [p.y * FP.R % FP.p for p in col]))
    out = pallas_g1.prefix_scan_affine(jnp.asarray(aff), block)
    assert out is not None
    for bi in (0, B - 1):
        got = g1.from_device(np.asarray(out[:, :, bi]))
        acc, want = G1.identity(), []
        for p in pts[bi]:
            acc = acc + p
            want.append(acc)
        assert got == want


def test_flat_msm_parts_bucket_path_matches_host(monkeypatch):
    """Drive msm_flat_device through the PARTS path (intra + block-total
    gather fold, the TPU production path) in interpret mode with shrunken
    tiles, against the host oracle.  Guards the accelerator-only branch the
    CPU fallback skips (round-1 regression class)."""
    import functools
    from plonk_tpu.curve import msm as msm_mod
    from plonk_tpu.field import FR

    monkeypatch.setattr(pallas_g1, "LANE_TILE", 8)
    monkeypatch.setattr(msm_mod, "SCAN_BLOCK", 4)
    # 2^16 buckets would mean thousands of interpreted suffix-scan steps;
    # bound the digits to 6 bits and shrink the bucket table to match
    monkeypatch.setattr(msm_mod, "FLAT_BUCKETS", 64)
    # kernel builders cache by (block, interpret): clear so the shrunken
    # LANE_TILE is captured fresh
    pallas_g1._scan_kernel_affine.cache_clear()
    pallas_g1._scan_kernel.cache_clear()
    pallas_g1._padd_kernel.cache_clear()

    n, K = 16, 1
    pts = rand_points(n)
    dev_pts = jnp.asarray(g1.to_device(pts))
    shifted = msm_mod.precompute_shifts(dev_pts)
    # scalars with every 16-bit limb < 64 (so 64 buckets suffice)
    scalars = [[sum(rng.randrange(64) << (16 * w) for w in range(16))
                for _ in range(n)]]
    scalars[0][3] = 0
    packed = np.stack(
        [FR.pack([s * FR.R % R for s in col]) for col in scalars], axis=1)

    out = msm_mod.msm_flat_device(shifted, jnp.asarray(packed))
    got = g1.from_device(np.asarray(out))
    for k in range(K):
        host = G1.identity()
        for p, s in zip(pts, scalars[k]):
            host = host + p.mul(s)
        assert got[k] == host

    pallas_g1._scan_kernel_affine.cache_clear()
    pallas_g1._scan_kernel.cache_clear()
    pallas_g1._padd_kernel.cache_clear()
