"""RNS device bodies (composed jnp path, CPU): mul + complete padd oracle.

Exercises plonk_tpu/field/pallas_rns.py's jnp bodies WITHOUT pallas — the
same code the TPU kernels run — against python bigints and the host G1
class.  Adversarial channel values (all 0xFFFF) probe the u32 overflow
discipline; the curve cases cover add, double, identity and inverse (the
complete-formula guarantees the sorted-scan MSM relies on).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from plonk_tpu.field import params as fparams
from plonk_tpu.field.rns import get_params, K, CH
from plonk_tpu.field import pallas_rns as prns
from plonk_tpu.curve.bls12_381 import G1

P = fparams.P_MOD


@pytest.fixture(scope="module")
def ctx():
    return get_params(P)


def enc_batch(ctx, vals):
    return jnp.asarray(np.stack([ctx.encode(v) for v in vals], -1))


def dec_batch(ctx, arr):
    a = np.asarray(arr)
    return [ctx.decode(a[:, i]) for i in range(a.shape[-1])]


def test_rns_mul_matches_bigint(ctx):
    rng = np.random.default_rng(10)
    xs = [int.from_bytes(rng.bytes(48), "little") % P for _ in range(8)]
    ys = [int.from_bytes(rng.bytes(48), "little") % P for _ in range(8)]
    out = prns.rns_mul(enc_batch(ctx, xs), enc_batch(ctx, ys))
    got = dec_batch(ctx, out)
    for g, x, y in zip(got, xs, ys):
        assert g == (x * y) % P  # mul keeps M-residue form; decode strips it


def test_rns_mul_adversarial_channels(ctx):
    """All-0xFFFF channels: worst-case r16 inputs must not overflow u32
    anywhere in the mul pipeline (fold/recon bounds)."""
    a = jnp.full((CH, 4), 0xFFFF, jnp.uint32)
    out = np.asarray(prns.rns_mul(a, a))
    assert (out < (1 << 16)).all()
    # consistent redundant channels (x_i + m_i where it fits) must give the
    # exact product
    rng = np.random.default_rng(11)
    x = int.from_bytes(rng.bytes(48), "little") % P
    y = int.from_bytes(rng.bytes(48), "little") % P
    ax = ctx.encode(x).astype(np.uint64)
    ay = ctx.encode(y).astype(np.uint64)
    for i, m in enumerate(ctx.mods):
        if int(ax[i]) + int(m) < (1 << 16):
            ax[i] += m
        if int(ay[i]) + int(m) < (1 << 16):
            ay[i] += m
    out2 = prns.rns_mul(jnp.asarray(ax.astype(np.uint32))[:, None],
                        jnp.asarray(ay.astype(np.uint32))[:, None])
    assert ctx.decode(np.asarray(out2)[:, 0]) == (x * y) % P


def point_to_rns(ctx, pt: G1):
    """Host G1 -> (3, CH) RNS projective (M-residue)."""
    if pt.inf:
        return np.stack([ctx.encode(0), ctx.encode(1), ctx.encode(0)])
    return np.stack([ctx.encode(pt.x), ctx.encode(pt.y), ctx.encode(1)])


def rns_to_point(ctx, arr) -> G1:
    x, y, z = (ctx.decode(np.asarray(arr)[i]) for i in range(3))
    if z == 0:
        return G1.identity()
    zi = pow(z, -1, P)
    return G1((x * zi) % P, (y * zi) % P)


def batch_points(ctx, pts):
    return jnp.asarray(
        np.stack([point_to_rns(ctx, p) for p in pts], -1))  # (3, CH, n)


def test_rns_padd_matches_host(ctx):
    g = G1.generator()
    acc = g
    pts_a, pts_b = [], []
    for i in range(2, 8):
        nxt = acc + g
        pts_a.append(acc)
        pts_b.append(nxt)
        acc = nxt
    # adversarial cases: double, identity both sides, inverse pair
    inv = G1(pts_a[0].x, (-pts_a[0].y) % P)
    pts_a += [g, g, G1.identity(), pts_a[0]]
    pts_b += [g, G1.identity(), g, inv]
    out = prns.rns_padd(batch_points(ctx, pts_a), batch_points(ctx, pts_b))
    for i, (a, b) in enumerate(zip(pts_a, pts_b)):
        got = rns_to_point(ctx, np.asarray(out)[..., i])
        want = a + b
        assert got.inf == want.inf and got.x == want.x and got.y == want.y, i


def test_rns_psub_matches_host(ctx):
    g = G1.generator()
    a = g + g + g
    out = prns.rns_padd(batch_points(ctx, [a, g]),
                        batch_points(ctx, [g, g]), negate_q=True)
    got0 = rns_to_point(ctx, np.asarray(out)[..., 0])
    want0 = a + G1(g.x, (-g.y) % P)
    assert (got0.x, got0.y) == (want0.x, want0.y)
    got1 = rns_to_point(ctx, np.asarray(out)[..., 1])
    assert got1.inf


def test_rns_mixed_body_matches_host(ctx):
    """padd_mixed_body (affine q, implicit Z2=1) against host adds."""
    u, invm, mats = prns.consts_dev()
    g = G1.generator()
    p_pts = [g + g, g + g + g, G1.identity()]
    q_pts = [g, g + g, g]
    p_arr = batch_points(ctx, p_pts).reshape(3 * CH, len(p_pts))
    q_arr = jnp.asarray(np.stack(
        [np.stack([ctx.encode(q.x), ctx.encode(q.y)]) for q in q_pts],
        -1)).reshape(2 * CH, len(q_pts))
    out = prns.padd_mixed_body(p_arr, q_arr, u, invm, mats)
    out = np.asarray(out).reshape(3, CH, len(p_pts))
    for i, (a, b) in enumerate(zip(p_pts, q_pts)):
        got = rns_to_point(ctx, out[..., i])
        want = a + b
        assert (got.inf, got.x, got.y) == (want.inf, want.x, want.y), i
