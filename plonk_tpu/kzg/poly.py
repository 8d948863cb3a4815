"""Device polynomial primitives: Horner evaluation and Ruffini division.

The reference's `Polynomial::evaluate` (powers loop, polynomial.rs:120-137) and
`ruffini` synthetic division (polynomial.rs:345-367) are both instances of ONE
affine recurrence acc <- acc*z + c (coefficients high-to-low):

  * after k+1 steps, acc is the k-th quotient coefficient (descending), and
  * after all n steps, acc = p(z).

A sequential recurrence is poison for SIMD, but an affine map t -> z*t + c
composes associatively, so we evaluate it as a *blocked scan*: intra-block
sequential scans (vectorized across blocks), then a recursive block-carry pass
with multiplier z^B, then a vectorized combine out[j,t] = intra + carry*z^(t+1).
Total work O(n) field muls, sequential depth ~B*levels.

Challenge points z arrive from the (host) transcript, so all z-power tables are
built host-side per call and passed as runtime arrays — one compiled executable
per shape, not per challenge.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..field import FR, params

BLOCK = 64


def _zpow_tables(z: int, n: int, block: int = BLOCK):
    """Host: per-level tables of [z_l^1 .. z_l^block], z_{l+1} = z_l^block."""
    p = params.R_MOD
    tables = []
    m, zl = n, z % p
    while True:
        pows, acc = [], 1
        for _ in range(block):
            acc = acc * zl % p
            pows.append(acc * FR.R % p)  # Montgomery form
        tables.append(FR.pack(pows))
        if m <= block:
            break
        m = -(-m // block)
        zl = pow(zl, block, p)
    return tables


def _affine_prefix(x, tables, level=0, block: int = BLOCK):
    """Prefix accs of acc <- acc*z + x along last axis. x: (L, ..., m)."""
    m = x.shape[-1]
    L = FR.L
    ztab = tables[level]  # (L, block) Montgomery powers z^1..z^block
    bshape = (L,) + (1,) * (x.ndim - 2)
    z1 = ztab[:, 0].reshape(bshape)

    if m <= block:
        moved = jnp.moveaxis(x, -1, 0)

        def step(carry, c):
            acc = FR.add(FR.mul(carry, z1), c)
            return acc, acc

        init = jnp.zeros(x.shape[:-1], dtype=jnp.uint32)
        _, ys = lax.scan(step, init, moved)
        return jnp.moveaxis(ys, 0, -1)

    nb = -(-m // block)
    pad = nb * block - m
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), dtype=jnp.uint32)], axis=-1
        )
    blocks = x.reshape(x.shape[:-1] + (nb, block))
    moved = jnp.moveaxis(blocks, -1, 0)  # (block, L, ..., nb)
    zin = z1.reshape(bshape + (1,))

    def step(carry, c):
        acc = FR.add(FR.mul(carry, zin), c)
        return acc, acc

    init = jnp.zeros(blocks.shape[:-1], dtype=jnp.uint32)
    _, intra = lax.scan(step, init, moved)
    intra = jnp.moveaxis(intra, 0, -1)  # (L, ..., nb, block)
    totals = intra[..., -1]             # (L, ..., nb)
    block_accs = _affine_prefix(totals, tables, level + 1, block)
    carry_in = jnp.concatenate(
        [jnp.zeros(block_accs.shape[:-1] + (1,), dtype=jnp.uint32),
         block_accs[..., :-1]], axis=-1)
    ztab_b = ztab.reshape(bshape + (1, block))
    out = FR.add(intra, FR.mul(carry_in[..., None], ztab_b))
    return out.reshape(x.shape[:-1] + (nb * block,))[..., :m]


def _horner_prefix(coeffs, tables, block: int = BLOCK):
    """coeffs ascending-degree (L, ..., n) -> prefix accs over DESCENDING order."""
    return _affine_prefix(jnp.flip(coeffs, axis=-1), tables, 0, block)


@functools.cache
def _eval_jit(levels):
    def f(coeffs, *tables):
        return _horner_prefix(coeffs, list(tables))[..., -1]

    return jax.jit(f)


@functools.cache
def _ruffini_jit(levels):
    def f(coeffs, *tables):
        accs = _horner_prefix(coeffs, list(tables))
        n = coeffs.shape[-1]
        # quotient (ascending, padded with a zero top coeff), remainder p(z)
        quot_desc = accs[..., : n - 1]
        quot = jnp.flip(quot_desc, axis=-1)
        zpad = jnp.zeros(coeffs.shape[:-1] + (1,), dtype=jnp.uint32)
        return jnp.concatenate([quot, zpad], axis=-1), accs[..., -1]

    return jax.jit(f)


def evaluate(coeffs, z: int):
    """p(z) for Montgomery coeff tensor(s) (L, ..., n); z a host int.

    Returns Montgomery-form device array (L, ...)."""
    tables = _zpow_tables(z, coeffs.shape[-1])
    return _eval_jit(len(tables))(coeffs, *tables)


def ruffini(coeffs, z: int):
    """(quotient, remainder) of p(X) / (X - z). Quotient padded to n coeffs."""
    tables = _zpow_tables(z, coeffs.shape[-1])
    return _ruffini_jit(len(tables))(coeffs, *tables)


def evaluate_host(coeffs: list[int], z: int) -> int:
    """Host oracle: Horner."""
    acc, p = 0, params.R_MOD
    for c in reversed(coeffs):
        acc = (acc * z + c) % p
    return acc
