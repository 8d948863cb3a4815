"""Explicit four-step distributed NTT (parallel/ntt4.py) on the virtual
8-device CPU mesh: bit-exact against the single-chip EvaluationDomain
transforms, including coset variants, batched inputs and the scrambled
(transpose-skipping) composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plonk_tpu.field import FR, params
from plonk_tpu.ntt import EvaluationDomain
from plonk_tpu.parallel import make_domain_mesh
from plonk_tpu.parallel.ntt4 import Ntt4, _split

R = params.R_MOD


@pytest.fixture(scope="module")
def mesh():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual devices"
    return make_domain_mesh(devices[:8])


def _rand_poly(n, batch=(), seed=0):
    rng = np.random.RandomState(seed)
    vals = [rng.randint(0, 1 << 62) for _ in range(int(np.prod(batch or (1,))) * n)]
    return jnp.asarray(FR.pack([v * FR.R % R for v in vals], shape=batch + (n,)))


def test_split_factors():
    assert _split(1 << 10, 8) == (32, 32)
    n1, n2 = _split(1 << 9, 8)
    assert n1 * n2 == 1 << 9 and n1 % 8 == 0 and n2 % 8 == 0


@pytest.mark.parametrize("n", [1 << 9, 1 << 10])
def test_fft4_matches_single_device(mesh, n):
    d = EvaluationDomain.get(n)
    plan = Ntt4(n, mesh)
    x = _rand_poly(n, seed=n)
    with mesh:
        got = plan.fft(plan.shard(x))
    want = d._jitted("fft")(x)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_ifft4_and_roundtrip(mesh):
    n = 1 << 10
    d = EvaluationDomain.get(n)
    plan = Ntt4(n, mesh)
    x = _rand_poly(n, seed=3)
    with mesh:
        evals = plan.fft(plan.shard(x))
        back = plan.ifft(evals)
    assert np.array_equal(np.asarray(back), np.asarray(x))
    want = d._jitted("ifft")(d._jitted("fft")(x))
    assert np.array_equal(np.asarray(back), np.asarray(want))


def test_coset_fft4_matches_single_device(mesh):
    n = 1 << 10
    d = EvaluationDomain.get(n)
    plan = Ntt4(n, mesh)
    x = _rand_poly(n, seed=5)
    with mesh:
        got = plan.coset_fft(plan.shard(x))
        back = plan.coset_ifft(got)
    want = d._jitted("coset_fft")(x)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_fft4_batched(mesh):
    n = 1 << 9
    d = EvaluationDomain.get(n)
    plan = Ntt4(n, mesh)
    x = _rand_poly(n, batch=(3,), seed=7)
    with mesh:
        got = plan.fft(plan.shard(x))
    want = d._jitted("fft")(x)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_scrambled_roundtrip_skips_transposes(mesh):
    """fft4(scrambled=True) |> pointwise |> ifft4(scrambled_in=True) must
    equal the natural-order composition — the prover's quotient pattern."""
    n = 1 << 10
    d = EvaluationDomain.get(n)
    plan = Ntt4(n, mesh)
    x = _rand_poly(n, seed=11)
    two = jnp.asarray(FR.pack([2 * FR.R % R]))
    with mesh:
        ev = plan.fft(plan.shard(x), scrambled=True)
        ev2 = FR.mul(ev, two.reshape((FR.L, 1)))
        back = plan.ifft(ev2, scrambled_in=True)
    want = d._jitted("ifft")(
        FR.mul(d._jitted("fft")(x), two.reshape((FR.L, 1))))
    assert np.array_equal(np.asarray(back), np.asarray(want))

    # scrambled evals are a permutation of the natural evals
    nat = np.asarray(d._jitted("fft")(x))
    scr = np.asarray(ev)
    assert sorted(map(tuple, nat.T.tolist())) == sorted(map(tuple, scr.T.tolist()))
