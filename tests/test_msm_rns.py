"""RNS flat MSM == host oracle (CPU composed path, full 2^16 buckets).

Covers the telescoped bucket reduction ((nb-1)*E_nb - sum E_b), the u16
RNS table conversion (limb-Montgomery -> M-residue channels), and zero
scalars.  Mirrors tests/test_msm.py::test_msm_flat_matches_host.
"""

import random

import numpy as np
import jax.numpy as jnp

from plonk_tpu.field import FR
from plonk_tpu.curve import g1_device as g1
from plonk_tpu.curve.bls12_381 import G1
from plonk_tpu.curve.msm import precompute_shifts
from plonk_tpu.curve.msm_rns import precompute_shifts_rns, msm_flat_rns

R = FR.p
rng = random.Random(77)


def rand_points(n):
    gp = G1.generator()
    return [gp.mul(rng.randrange(1, R)) for _ in range(n)]


def test_msm_flat_rns_matches_host():
    n, K = 12, 2
    pts = rand_points(n)
    dev_pts = jnp.asarray(g1.to_device(pts))
    shifted = precompute_shifts(dev_pts)
    rows = precompute_shifts_rns(shifted)
    assert rows.dtype == jnp.uint16 and rows.shape == (16 * n, 100)
    scalars = [[rng.randrange(R) for _ in range(n)] for _ in range(K)]
    scalars[0][2] = 0
    packed = np.stack(
        [FR.pack([s * FR.R % R for s in col]) for col in scalars], axis=1)
    got = msm_flat_rns(rows, jnp.asarray(packed))
    for k in range(K):
        host = G1.identity()
        for p, s in zip(pts, scalars[k]):
            host = host + p.mul(s)
        assert got[k] == host, k


def test_rns_kernels_interpret_mode(monkeypatch):
    """Pallas-kernel-specific logic (u16 tile transpose in the rows scan,
    packed const operands, scratch carry) under interpret mode on CPU."""
    import jax.numpy as jnp
    from plonk_tpu.field import pallas_rns as prns
    from plonk_tpu.field.rns import get_params, CH
    from plonk_tpu.field import params as fparams

    monkeypatch.setenv("PLONK_PALLAS", "interpret")
    ctx = get_params(fparams.P_MOD)
    g = G1.generator()
    pts = [g.mul(i + 1) for i in range(8)]

    # fused padd (one grid step)
    def enc_pt(pt):
        return np.stack(
            [ctx.encode(pt.x), ctx.encode(pt.y), ctx.encode(1)])

    pa = jnp.asarray(np.stack(
        [enc_pt(pts[i % 8]) for i in range(256)], -1))
    out = np.asarray(prns.rns_padd(pa, pa))
    for i in (0, 7, 255):
        x, y, z = (ctx.decode(out[c, :, i]) for c in range(3))
        zi = pow(z, -1, fparams.P_MOD)
        want = pts[i % 8] + pts[i % 8]
        assert ((x * zi) % fparams.P_MOD, (y * zi) % fparams.P_MOD) == \
            (want.x, want.y)

    # rows scan kernel: block=4, m=256 (u16 rows + in-VMEM tile transpose)
    block, m = 4, 256
    rows16 = np.zeros((block * m, 2 * CH), np.uint16)
    hosts = []
    for j in range(block):
        p = pts[j % 8]
        rows16[j * m:(j + 1) * m] = np.concatenate(
            [ctx.encode(p.x), ctx.encode(p.y)]).astype(np.uint16)
        hosts.append(p)
    # x layout (block, m, 2CH): lane l scans hosts[0..j]
    x = jnp.asarray(rows16.reshape(block, m, 2 * CH))
    intra = np.asarray(prns._scan_kernel_affine_rows(
        block, interpret=True)(x))
    acc = G1.identity()
    for j in range(block):
        acc = acc + hosts[j]
        xx, yy, zz = (ctx.decode(intra[j, c * CH:(c + 1) * CH, 17])
                      for c in range(3))
        zi = pow(zz, -1, fparams.P_MOD)
        assert ((xx * zi) % fparams.P_MOD, (yy * zi) % fparams.P_MOD) == \
            (acc.x, acc.y), j
