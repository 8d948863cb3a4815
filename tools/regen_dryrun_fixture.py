"""Regenerate the committed dryrun proof fixture.

Runs the deterministic single-device prove of __graft_entry__'s DryCircuit
(fixed SRS secret, injected blinders) on the CPU backend and writes the proof
bytes to tests/fixtures/dryrun_proof.hex.  dryrun_multichip then only has to
run the SHARDED prove and byte-compare — halving its GSPMD compile cost.

Run after any change that alters proof bytes (gate layouts, transcript
labels, blinding schedule):  python tools/regen_dryrun_fixture.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(base, ".xla_dryrun_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import __graft_entry__ as ge  # noqa: E402


def main():
    cls, prover, verifier = ge._dryrun_build()
    proof, pis = prover.prove(cls(), blinders=ge.DRYRUN_BLINDERS)
    verifier.verify(proof, pis)
    path = os.path.join(base, ge.DRYRUN_FIXTURE)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(proof.to_bytes().hex() + "\n")
    print(f"wrote {path} (n={prover.size}, {len(proof.to_bytes())} bytes)")
    # verifier + PI fixture: lets tests drive verification (native AND the
    # Python oracle) with ZERO jit compiles — Verifier.try_from_bytes is
    # host-only deserialization
    vpath = os.path.join(base, "tests", "fixtures", "dryrun_verifier.bin")
    with open(vpath, "wb") as f:
        f.write(verifier.to_bytes())
    pipath = os.path.join(base, "tests", "fixtures", "dryrun_pis.txt")
    with open(pipath, "w") as f:
        f.write("\n".join(str(v) for v in pis) + "\n")
    print(f"wrote {vpath} + {pipath} (pis={pis})")
    # serialized prover: dryrun_multichip loads this instead of re-running
    # SRS setup + the 15-commit preprocess MSM (minutes of unfused jnp
    # execution on the virtual-CPU mesh)
    prpath = os.path.join(base, ge.DRYRUN_PROVER)
    with open(prpath, "wb") as f:
        f.write(prover.to_bytes())
    print(f"wrote {prpath} ({os.path.getsize(prpath)} bytes)")


if __name__ == "__main__":
    main()
