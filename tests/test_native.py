"""Native host runtime (native/plonk_host.cpp) vs the Python bignum oracle.

Every exported kernel is cross-checked against the pure-Python implementation
it accelerates; if the toolchain is unavailable the library returns None and
the framework silently stays on the Python paths (also asserted here).
"""

import random

import numpy as np
import pytest

from plonk_tpu import native
from plonk_tpu.curve import G1
from plonk_tpu.curve import g1_device as g1
from plonk_tpu.field import FP, params

rng = random.Random(0xBADC0DE)
R = params.R_MOD
P = params.P_MOD


def rand_points(n):
    g = G1.generator()
    return [g.mul(rng.randrange(1, R)) for _ in range(n)]


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _python_from_device(arr):
    """The original pure-Python readback (kept as the oracle)."""
    a = np.asarray(arr).reshape(3, FP.L, -1)
    xs, ys, zs = FP.unpack(a[0]), FP.unpack(a[1]), FP.unpack(a[2])
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


def test_from_device_matches_python(lib):
    pts = rand_points(17) + [G1.identity()] + rand_points(2)
    # fold into projective with random Z scaling to exercise normalization
    dev = np.asarray(g1.to_device(pts))
    got = native.g1_from_device(dev)
    assert got == _python_from_device(dev) == pts


def test_from_device_random_z(lib):
    """Points with non-trivial Z (X,Y,Z scaled by random z)."""
    pts = rand_points(8)
    cols = []
    for pt in pts:
        z = rng.randrange(1, P)
        cols.append((pt.x * z % P, pt.y * z % P, z))
    Rm = FP.R
    arr = np.stack([
        FP.pack([c[0] * Rm % P for c in cols]),
        FP.pack([c[1] * Rm % P for c in cols]),
        FP.pack([c[2] * Rm % P for c in cols]),
    ])
    assert native.g1_from_device(arr) == pts


def test_combine_windows_matches_python(lib):
    W, c = 6, 4
    pts = rand_points(W)
    dev = np.asarray(g1.to_device(pts))
    got = native.g1_combine_windows(dev, c)
    acc = G1.identity()
    for pt in reversed(pts):
        for _ in range(c):
            acc = acc + acc
        acc = acc + pt
    assert got == acc


def test_msm_small_matches_python(lib):
    pts = rand_points(9) + [G1.identity()]
    scalars = [rng.randrange(R) for _ in range(9)] + [12345]
    got = native.g1_msm_small(pts, scalars)
    acc = G1.identity()
    for p, s in zip(pts, scalars):
        acc = acc + p.mul(s)
    assert got == acc
    # zero scalars and all-identity edge
    assert native.g1_msm_small(pts, [0] * 10) == G1.identity()


def test_scalar_mul_base_matches_python(lib):
    g = G1.generator()
    scalars = [0, 1, 2, rng.randrange(R), R - 1, rng.randrange(R)]
    got = native.g1_scalar_mul_base(g, scalars)
    assert got == [g.mul(s) for s in scalars]


def test_disable_env(monkeypatch):
    monkeypatch.setenv("PLONK_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)
    assert native.get_lib() is None
    assert native.g1_from_device(np.zeros((3, FP.L, 1), np.uint32)) is None
    monkeypatch.setattr(native, "_TRIED", False)


# -- pairing fast path --------------------------------------------------------

def test_native_pairing_check_matches_oracle(lib):
    """The C++ Miller loop + HHT final exponentiation against the pure-Python
    pairing: bilinearity identities must hold and non-identities must fail.
    (The C side computes e^3; gcd(3, r) = 1 keeps the ==1 check faithful.)"""
    from plonk_tpu.curve import bls12_381 as b

    g1p, g2p = b.G1.generator(), b.G2.generator()
    # e(G, H) * e(-G, H) == 1
    assert native.pairing_is_one([(g1p, g2p), (-g1p, g2p)]) is True
    # e(aG, bH) * e(-abG, H) == 1  (exercises both add and double steps)
    for seed in (5, 23):
        rs = random.Random(seed)
        a, c = rs.randrange(R), rs.randrange(R)
        pa, qc = g1p.mul(a), g2p.mul(c)
        pac = -(g1p.mul(a * c % R))
        assert native.pairing_is_one([(pa, qc), (pac, g2p)]) is True
        assert native.pairing_is_one([(pa, qc), (g1p, g2p)]) is False
        # cross-check one case against the Python tower oracle
        if seed == 5:
            py = b.multi_pairing([(pa, qc), (pac, g2p)]) == b.Fp12.ONE
            assert py is True


def test_hht_hard_part_exponent_identity():
    """(x-1)^2 (x+p) (x^2+p^2-1) + 3 == 3 (p^4-p^2+1)/r — the decomposition
    final_exp_cubed implements (native/plonk_host.cpp)."""
    x = -0xD201000000010000
    hard = (P**4 - P**2 + 1) // R
    assert (x - 1) ** 2 * (x + P) * (x**2 + P**2 - 1) + 3 == 3 * hard


def test_multi_pairing_is_one_python_fallback(monkeypatch):
    """multi_pairing_is_one must agree with the Python tower when the native
    library is unavailable."""
    from plonk_tpu.curve import bls12_381 as b

    monkeypatch.setattr(native, "pairing_is_one", lambda pairs: None)
    g1p, g2p = b.G1.generator(), b.G2.generator()
    assert b.multi_pairing_is_one([(g1p, g2p), (-g1p, g2p)]) is True
    assert b.multi_pairing_is_one([(g1p, g2p), (g1p, g2p)]) is False
    # identity pairs contribute the unit
    assert b.multi_pairing_is_one(
        [(b.G1.identity(), g2p), (g1p, g2p), (-g1p, g2p)]) is True
