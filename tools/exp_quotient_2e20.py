"""2^20-constraint quotient-pipeline feasibility on one chip (BASELINE #5).

At n = 2^20 the 8n domain is 2^23 points; the ~23 (L, 8n) u32 coset-eval
tensors the fused quotient program holds would need ~12 GB plus transients
— past one chip's HBM high-water mark.  The identities are pointwise
except the roll-by-8 omega shift, so the evaluation DOMAIN chunks cleanly
with an 8-element halo; the NTTs themselves (2^23 x 16 limbs = 537 MB per
tensor) fit whole.

This tool times, on the real chip, with synthetic on-device data (no
transfers):
  * one (L, 2^23) coset FFT and IFFT      (7 forward + 1 inverse per prove)
  * quotient_evals over 2^23 in C halo chunks (inputs generated per chunk)
and reports an honest single-chip estimate for the full n=2^20 round-3
pipeline.  Writes the result into SCALING.json under "quotient_2e20".

Run: python tools/exp_quotient_2e20.py [chunks]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_plonk_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plonk_tpu.field import FR
from plonk_tpu.ntt import EvaluationDomain
from plonk_tpu.proof_system import quotient as qm
from plonk_tpu.compiler import SELECTOR_ORDER
from bench_util import report, sync

CHUNKS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = 1 << 20
M = 8 * N


def main():
    d8 = EvaluationDomain.get(M)
    tb8 = d8.tables_dev()

    # synthetic (L, M) tensor generated on device (iota-derived, no xfer)
    @jax.jit
    def gen(seed):
        base = jnp.arange(M, dtype=jnp.uint32)[None, :]
        rows = jnp.arange(FR.L, dtype=jnp.uint32)[:, None]
        return (base * jnp.uint32(2654435761) + seed + rows) & jnp.uint32(
            0xFFFF)

    x = gen(jnp.uint32(1))
    sync(x)
    t_fft = report("coset_fft 2^23", jax.jit(
        lambda x, tb: d8.coset_fft(x, tb=tb)), x, tb8, reps=3)
    t_ifft = report("coset_ifft 2^23", jax.jit(
        lambda x, tb: d8.coset_ifft(x, tb=tb)), x, tb8, reps=3)

    # chunked quotient identities: chunk + 8-halo inputs, roll inside
    mchunk = M // CHUNKS

    @jax.jit
    def chunk_evals(seed):
        """One halo chunk of quotient_evals on synthetic inputs: every
        input carries the 8-element halo (identical FLOP count; the
        wrap-around seam is timing-only — a production chunked runner
        would feed true neighbor halos), output sliced to the chunk."""
        mh = mchunk + 8

        def g(s):
            base = jnp.arange(mh, dtype=jnp.uint32)[None, :]
            rows = jnp.arange(FR.L, dtype=jnp.uint32)[:, None]
            return (base * jnp.uint32(2654435761) + s + rows) & jnp.uint32(
                0xFFFF)

        sel = {name: g(seed + i) for i, name in enumerate(SELECTOR_ORDER)}
        sigma8 = jnp.stack([g(seed + 20 + i) for i in range(4)], axis=1)
        wires8 = jnp.stack([g(seed + 30 + i) for i in range(4)], axis=1)
        chal = g(seed + 54)[:, : len(qm.CHAL_SLOTS)]
        ev = qm.quotient_evals(
            sel, sigma8, g(seed + 50), g(seed + 51), g(seed + 52),
            wires8, g(seed + 40), g(seed + 53), chal)
        return ev[:, :mchunk]

    t_chunk = report(f"quotient_evals chunk (2^23/{CHUNKS})", chunk_evals,
                     jnp.uint32(7), reps=2)

    total = 7 * t_fft + t_ifft + CHUNKS * t_chunk
    result = {
        "n": N, "domain_8n": M, "chunks": CHUNKS,
        "coset_fft_s": round(t_fft, 3),
        "coset_ifft_s": round(t_ifft, 3),
        "quotient_chunk_s": round(t_chunk, 3),
        "round3_pipeline_estimate_s": round(total, 3),
        "note": "synthetic on-device data; 7 fwd FFTs + identities in "
                f"{CHUNKS} halo chunks + 1 inverse FFT",
    }
    print(json.dumps(result, indent=1))
    path = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    try:
        with open(path) as f:
            scaling = json.load(f)
    except Exception:
        scaling = {}
    scaling["quotient_2e20"] = result
    with open(path, "w") as f:
        json.dump(scaling, f, indent=1)
    print("-> SCALING.json updated")


if __name__ == "__main__":
    main()
