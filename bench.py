"""Benchmark: full PLONK prove at 2^16 constraints on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

Baseline: dusk-plonk proves a 2^16-constraint circuit in 7.871 s on an Apple M1
(reference README.md:34-36; see BASELINE.md).  vs_baseline > 1 means faster.

Env overrides: PLONK_BENCH_LOG2N (default 16), PLONK_BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time


BASELINE_SECONDS = 7.871


def build_circuit_class(n_gates_target: int):
    from plonk_tpu import Circuit, Constraint

    class BenchCircuit(Circuit):
        """Arithmetic chain stressing wires + permutation: the all-gadget
        sweep circuit of the reference bench (benches/plonk.rs:84-138) is
        mirrored as gadgets land; the proving cost drivers (MSMs, NTTs,
        grand product, quotient) are fully exercised already."""

        def circuit(self, c):
            rng = random.Random(7)
            a = c.append_witness(rng.randrange(1 << 30))
            b = c.append_witness(rng.randrange(1 << 30))
            # each iteration appends 2 gates
            while c.constraints() + 2 <= n_gates_target:
                s = c.gate_add(Constraint().left(1).right(2).constant(3).a(a).b(b))
                m = c.gate_mul(Constraint().mult(1).a(s).b(b))
                a, b = b, m

    return BenchCircuit


def main():
    import jax

    # persistent XLA compilation cache: bench graphs survive across processes
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_plonk_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    log2n = int(os.environ.get("PLONK_BENCH_LOG2N", "16"))
    reps = int(os.environ.get("PLONK_BENCH_REPS", "3"))
    n = 1 << log2n

    from plonk_tpu import PublicParameters
    from plonk_tpu.compiler import Compiler

    cls = build_circuit_class(n - 6)
    t0 = time.time()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_srs_{log2n}.bin")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            pp = PublicParameters.from_slice_unchecked(f.read())
    else:
        pp = PublicParameters.setup(n, secret=0xB0B)
        with open(cache, "wb") as f:
            f.write(pp.to_raw_var_bytes())
    t_setup = time.time() - t0
    t0 = time.time()
    prover, verifier = Compiler.compile_with_circuit(pp, b"bench", cls())
    t_compile = time.time() - t0

    times = []
    proof = pis = None
    for i in range(reps):
        t0 = time.time()
        proof, pis = prover.prove(cls(), rng=random.Random(1000 + i))
        times.append(time.time() - t0)
    t0 = time.time()
    verifier.verify(proof, pis)
    t_verify = time.time() - t0

    best = min(times)
    print(
        f"# setup {t_setup:.1f}s compile {t_compile:.1f}s "
        f"prove(first) {times[0]:.2f}s prove(best) {best:.3f}s "
        f"verify {t_verify*1000:.1f}ms constraints {prover.constraints}",
        file=sys.stderr,
    )
    metrics = getattr(prover, "last_metrics", None)
    if metrics:
        rounds = " ".join(f"{k}={v:.2f}s" for k, v in metrics.items())
        print(f"# rounds: {rounds}", file=sys.stderr)
    print(json.dumps({
        "metric": f"prove_2^{log2n}_constraints",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / best, 3),
    }))


if __name__ == "__main__":
    main()
