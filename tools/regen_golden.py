"""Regenerate the pinned constants in tests/test_golden_vectors.py.

Run ONLY after a deliberate transcript-protocol change (label schedule,
STROBE framing, commitment encoding, challenge reduction). Prints the new
digests/anchors to paste into the test module.

Usage: JAX_PLATFORMS=cpu python tools/regen_golden.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.test_golden_vectors import _digest, _schedule_challenges  # noqa: E402


def main() -> None:
    v3 = _schedule_challenges(version3=True)
    legacy = _schedule_challenges(version3=False)
    print(f'GOLDEN_V3_DIGEST = "{_digest(v3)}"')
    print(f'GOLDEN_LEGACY_DIGEST = "{_digest(legacy)}"')
    beta = v3[0][1].to_bytes(32, "little").hex()
    print(f'GOLDEN_V3_BETA = "{beta}"')


if __name__ == "__main__":
    main()
