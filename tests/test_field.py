"""Cross-checks of the device limb engine against Python big-int arithmetic.

Mirrors the role of dusk-bls12_381's own field test-suite (the reference
consumes that crate, SURVEY.md section 2.2): every device op is validated
against an independent host computation on random and edge-case inputs.
"""

import random

import numpy as np
import jax

from plonk_tpu.field import FR, FP, params

rng = random.Random(0xF1E1D)


def rand_elems(field, n):
    return [rng.randrange(field.p) for _ in range(n)]


def edge_elems(field):
    return [0, 1, 2, field.p - 1, field.p - 2, field.p // 2, (1 << 255) % field.p]


def check_binop(field, dev_op, host_op, n=64):
    xs = rand_elems(field, n) + edge_elems(field)
    ys = edge_elems(field) + rand_elems(field, n)
    a = field.pack(xs)
    b = field.pack(ys)
    out = field.unpack(jax.jit(dev_op)(a, b))
    exp = [host_op(x, y) % field.p for x, y in zip(xs, ys)]
    assert out == exp, f"{field.name}: mismatch"


def test_add_sub_neg():
    for F in (FR, FP):
        check_binop(F, F.add, lambda x, y: x + y)
        check_binop(F, F.sub, lambda x, y: x - y)
        xs = rand_elems(F, 32) + [0, F.p - 1]
        out = F.unpack(jax.jit(F.neg)(F.pack(xs)))
        assert out == [(-x) % F.p for x in xs]


def test_mont_mul_roundtrip():
    for F in (FR, FP):
        xs = rand_elems(F, 64) + edge_elems(F)
        ys = edge_elems(F) + rand_elems(F, 64)
        am = jax.jit(F.to_mont)(F.pack(xs))
        bm = jax.jit(F.to_mont)(F.pack(ys))
        cm = jax.jit(F.mul)(am, bm)
        out = F.unpack(jax.jit(F.from_mont)(cm))
        assert out == [(x * y) % F.p for x, y in zip(xs, ys)]
        # roundtrip to_mont/from_mont is identity
        assert F.unpack(jax.jit(F.from_mont)(am)) == [x % F.p for x in xs]


def test_inv_and_pow():
    for F in (FR, FP):
        xs = rand_elems(F, 8) + [1, F.p - 1]
        am = jax.jit(F.to_mont)(F.pack(xs))
        iv = jax.jit(F.inv)(am)
        out = F.unpack(jax.jit(F.from_mont)(iv))
        assert out == [pow(x, -1, F.p) for x in xs]
        # inv(0) == 0 (Fermat ladder convention)
        z = jax.jit(F.inv)(F.pack([0]))
        assert F.unpack(z) == [0]


def test_batch_inverse():
    F = FR
    xs = rand_elems(F, 1000)
    am = jax.jit(F.to_mont)(F.pack(xs))
    iv = jax.jit(lambda a: F.from_mont(F.batch_inverse(a, block=64)))(am)
    assert F.unpack(iv) == [pow(x, -1, F.p) for x in xs]


def test_prefix_mul():
    F = FR
    xs = rand_elems(F, 530)
    am = jax.jit(F.to_mont)(F.pack(xs))
    pm = jax.jit(lambda a: F.from_mont(F._prefix_mul(a, block=32)))(am)
    acc, exp = 1, []
    for x in xs:
        acc = acc * x % F.p
        exp.append(acc)
    assert F.unpack(pm) == exp


def test_constants():
    # sanity on derived constants
    assert pow(params.FR_ROOT_OF_UNITY, 1 << 32, params.R_MOD) == 1
    assert pow(params.FR_ROOT_OF_UNITY, 1 << 31, params.R_MOD) != 1
    assert (params.JUBJUB_D * 10241 + 10240) % params.R_MOD == 0
