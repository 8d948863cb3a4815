"""Explicit four-step (Bailey) distributed NTT over a device mesh.

The reference's FFT is strictly serial (/root/reference/src/fft/domain.rs:
325-376).  The single-chip TPU path (ntt/domain.py) vectorizes each butterfly
stage; under GSPMD a *sharded* input makes every stage whose stride crosses a
shard boundary lower to a collective — log2(n) rounds of communication.  This
module is the explicit alternative (VERDICT r1 item 10): factor n = n1*n2 and
exchange data exactly three times, independent of n:

    view x[j], j = j2 + n2*j1  as matrix M[j1][j2]   (shards hold j1 rows)
    1. all_to_all transpose            -> shards hold j2 columns
    2. local size-n1 NTTs over j1      (one per local column j2)
    3. twiddle scale by omega^(j2*k1)  (sharded precomputed table)
    4. all_to_all transpose            -> shards hold k1 rows
    5. local size-n2 NTTs over j2
    6. all_to_all transpose            -> natural-order output, block-sharded
       X[k], k = k1 + n1*k2

Identity:  X[k1 + n1*k2] = sum_{j2} w_{n2}^{j2 k2} * w^{j2 k1}
                           * sum_{j1} x[j2 + n2*j1] * w_{n1}^{j1 k1}

The inverse runs the same pipeline with inverse-omega stage tables and the
inverse twiddle table; the two local iNTTs contribute (1/n1)(1/n2) = 1/n, so
no extra scaling pass is needed.  All arithmetic is the exact u32-limb
Montgomery field (field/mont.py) — sharded results are bit-identical to the
single-device EvaluationDomain transforms (tested on the virtual 8-CPU mesh,
tests/test_parallel.py).

Step 6 exists only to restore natural order.  Pointwise consumers (the 8n
quotient identity program) don't care about element order, so the prover can
run fft4(..., scrambled=True) / ifft4(..., scrambled_in=True) pairs and skip
two of the six transposes round-trip.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..field import FR, params
from ..ntt import EvaluationDomain


def _split(n: int, ndev: int) -> tuple[int, int]:
    """n = n1 * n2 with both factors multiples of ndev, as square as possible."""
    logn = n.bit_length() - 1
    logd = ndev.bit_length() - 1
    assert 1 << logd == ndev, "device count must be a power of two"
    log1 = logn // 2
    log1 = max(log1, logd)
    assert logn - log1 >= logd, f"n={n} too small for {ndev} devices"
    return 1 << log1, 1 << (logn - log1)


@functools.lru_cache(maxsize=None)
def _twiddle_table(n: int, n1: int, n2: int, inverse: bool) -> np.ndarray:
    """(L, n2, n1) Montgomery table tw[j2, k1] = omega_n^(+-j2*k1)."""
    p = params.R_MOD
    omega = EvaluationDomain.get(n).omega
    if inverse:
        omega = pow(omega, -1, p)
    # row j2 is (omega^j2)^k1 for k1 in [0, n1): geometric per row
    rows = np.empty((n2, n1), dtype=object)
    base = 1
    for j2 in range(n2):
        acc, row = 1, [0] * n1
        for k1 in range(n1):
            row[k1] = acc * FR.R % p
            acc = acc * base % p
        rows[j2] = row
        base = base * omega % p
    return FR.pack([v for j2 in range(n2) for v in rows[j2]],
                   shape=(n2, n1))


class Ntt4:
    """Distributed NTT plan for size n over a 1-D mesh axis.

    Callables (all jitted shard_map programs; x is (L, ..., n) block-sharded
    on the last axis, Montgomery form):
      fft(x), ifft(x)             natural order in and out (3 all_to_alls)
      coset_fft(x), coset_ifft(x) generator-coset variants (domain.rs:193-227)
    Pass scrambled=True / scrambled_in=True to skip the final / first
    transpose; a scrambled=True forward composes with scrambled_in=True
    inverse for transpose-free round trips around pointwise programs.
    """

    def __init__(self, n: int, mesh, axis: str = "d", n1: int | None = None):
        self.n = n
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        if n1 is None:
            self.n1, self.n2 = _split(n, self.ndev)
        else:
            self.n1, self.n2 = n1, n // n1
        assert self.n1 * self.n2 == n
        assert self.n1 % self.ndev == 0 and self.n2 % self.ndev == 0
        self.d1 = EvaluationDomain.get(self.n1)
        self.d2 = EvaluationDomain.get(self.n2)
        self.dn = EvaluationDomain.get(n)
        self._jit_cache: dict = {}

    # -- sharding helpers -------------------------------------------------------

    def shard(self, x):
        """Place (L, ..., n) with the last axis block-sharded."""
        spec = P(*([None] * (np.ndim(x) - 1) + [self.axis]))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _tw(self, inverse: bool):
        tw = _twiddle_table(self.n, self.n1, self.n2, inverse)
        return jax.device_put(
            jnp.asarray(tw), NamedSharding(self.mesh, P(None, self.axis, None)))

    def _coset_tab(self, inverse: bool):
        key = "coset_inv" if inverse else "coset"
        tab = self.dn.tables()[key]  # (L, n)
        return jax.device_put(
            jnp.asarray(tab), NamedSharding(self.mesh, P(None, self.axis)))

    # -- core pipeline ----------------------------------------------------------

    def _pipeline(self, inverse: bool, scrambled_out: bool, scrambled_in: bool,
                  coset: bool):
        """Build the local shard_map body.

        Per-shard layouts (batch axes elided): natural input is the flat
        (L, n/D) block, viewed as rows j1: (L, n1/D, n2).  The scrambled
        layout is the post-step-5 state: rows k1, (L, n1/D, n2) with all k2
        per row.  A scrambled_in inverse runs the REVERSE composition of the
        forward steps (iNTT over n2 first, then inverse twiddle, then iNTT
        over n1) so that ifft4(fft4(x, scrambled=True), scrambled_in=True)
        == x with only two transposes per direction."""
        n1, n2, D = self.n1, self.n2, self.ndev
        ax = self.axis
        d1, d2 = self.d1, self.d2

        def transpose(x):
            # (L, ..., r, c) -> (L, ..., c/D, r*?) block transpose over the
            # mesh: split the last axis across devices, receive on the
            # second-to-last, then swap so the last axis is the full new row.
            y = lax.all_to_all(x, ax, split_axis=x.ndim - 1,
                               concat_axis=x.ndim - 2, tiled=True)
            return jnp.swapaxes(y, -1, -2)

        def mul_tw(y, tw):
            return FR.mul(y, tw.reshape(
                (FR.L,) + (1,) * (y.ndim - 3) + tw.shape[1:]))

        def mul_coset(flat, coset_tab):
            return FR.mul(flat, coset_tab.reshape(
                (FR.L,) + (1,) * (flat.ndim - 2) + coset_tab.shape[1:]))

        def body(x, tw, coset_tab):
            # x: (L, B..., n/D) local flat block
            lead = x.shape[:-1]
            if coset and not inverse:
                x = mul_coset(x, coset_tab)
            y = x.reshape(lead + (n1 // D, n2))
            if scrambled_in:
                assert inverse
                # reverse composition: undo step 5, then 4..1
                y = d2.ifft(y)                      # iNTT over k2 axis
                y = transpose(y)                    # (L, B, n2/D, n1)
                y = mul_tw(y, tw)                   # omega^(-j2*k1)
                y = d1.ifft(y)                      # iNTT over k1 axis
                out = transpose(y)                  # (L, B, n1/D, n2) rows j1
            else:
                local_1 = d1.ifft if inverse else d1.fft
                local_2 = d2.ifft if inverse else d2.fft
                y = transpose(y)                    # (L, B, n2/D, n1)
                y = local_1(y)                      # NTT over j1 -> k1
                y = mul_tw(y, tw)
                y = transpose(y)                    # (L, B, n1/D, n2)
                y = local_2(y)                      # NTT over j2 -> k2
                out = y if scrambled_out else transpose(y)
            flat = out.reshape(lead + (self.n // D,))
            if coset and inverse:
                flat = mul_coset(flat, coset_tab)
            return flat

        return body

    def _build(self, kind: str, ndim: int):
        """kind in {fft, ifft, coset_fft, coset_ifft} x {'', _s, s_} flags."""
        key = (kind, ndim)
        if key in self._jit_cache:
            return self._jit_cache[key]
        inverse = "ifft" in kind
        coset = kind.startswith("coset")
        scrambled_out = kind.endswith("_sout")
        scrambled_in = kind.endswith("_sin")
        body = self._pipeline(inverse, scrambled_out, scrambled_in, coset)
        data_spec = P(*([None] * (ndim - 1) + [self.axis]))
        fn = jax.jit(shard_map(
            body, mesh=self.mesh,
            in_specs=(data_spec, P(None, self.axis, None), P(None, self.axis)),
            out_specs=data_spec, check_rep=False,
        ))
        self._jit_cache[key] = fn
        return fn

    def _run(self, kind: str, x):
        inverse = "ifft" in kind
        fn = self._build(kind, x.ndim)
        # scrambled_in pipelines still need a twiddle arg shape-wise; reuse fwd
        return fn(x, self._tw(inverse), self._coset_tab(inverse))

    # -- composable (unjitted) entry for use inside larger jit programs ----------

    def raw(self, kind: str, ndim: int):
        """The shard_map-wrapped pipeline WITHOUT jit — inline it inside a
        bigger jitted program (the round-3 quotient program).  Twiddle and
        coset tables must be passed as ARGUMENTS (see tables()) so they stay
        jit parameters, not closure constants (r3 commit 5473468 lesson)."""
        inverse = "ifft" in kind
        coset = kind.startswith("coset")
        body = self._pipeline(inverse, kind.endswith("_sout"),
                              kind.endswith("_sin"), coset)
        data_spec = P(*([None] * (ndim - 1) + [self.axis]))
        return shard_map(
            body, mesh=self.mesh,
            in_specs=(data_spec, P(None, self.axis, None), P(None, self.axis)),
            out_specs=data_spec, check_rep=False)

    def tables(self, inverse: bool):
        """(twiddle, coset) device tables for raw(); sharded placements."""
        return self._tw(inverse), self._coset_tab(inverse)

    # -- public entry points ----------------------------------------------------

    def fft(self, x, scrambled: bool = False):
        return self._run("fft_sout" if scrambled else "fft", x)

    def ifft(self, x, scrambled_in: bool = False):
        return self._run("ifft_sin" if scrambled_in else "ifft", x)

    def coset_fft(self, x, scrambled: bool = False):
        return self._run("coset_fft_sout" if scrambled else "coset_fft", x)

    def coset_ifft(self, x, scrambled_in: bool = False):
        return self._run("coset_ifft_sin" if scrambled_in else "coset_ifft", x)
