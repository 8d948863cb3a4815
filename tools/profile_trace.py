"""Capture a jax.profiler trace of one prove (SURVEY 5.1 / VERDICT r3 #8).

    PLONK_PROFILE=trace python tools/profile_trace.py [log2n]

Writes a trace directory (default /tmp/plonk_trace, override with
PLONK_TRACE_DIR); inspect with  tensorboard --logdir <dir>  (the Profile
tab / xprof shows per-op device timelines, HBM traffic, and fusion
boundaries).  Uses the bench SRS archive when present.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("PLONK_PROFILE", "trace")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".xla_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench as B  # noqa: E402

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 14


def main():
    from plonk_tpu.compiler import Compiler

    pp = B._load_pp(LOG2N)
    cls = B.build_circuit_class((1 << LOG2N) - 6, simple=False)
    prover, verifier = Compiler.compile_with_circuit(pp, b"dusk-network",
                                                     cls())
    # warm (compile outside the trace), then one traced prove
    os.environ["PLONK_PROFILE"] = ""
    prover.prove(cls())
    os.environ["PLONK_PROFILE"] = "trace"
    proof, pis = prover.prove(cls())
    verifier.verify(proof, pis)
    print("trace written to",
          os.environ.get("PLONK_TRACE_DIR", "/tmp/plonk_trace"))


if __name__ == "__main__":
    main()
