from . import errors, runtime

__all__ = ["errors", "runtime", "next_pow2"]


def next_pow2(x: int) -> int:
    """Smallest power of two >= x (1 for x <= 1).  The single definition —
    three private copies had drifted on x <= 1 behavior (VERDICT r3)."""
    return 1 << max(0, x - 1).bit_length()
