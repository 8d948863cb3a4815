"""Host-side Jubjub: the twisted Edwards curve embedded over BLS12-381's Fr.

  -x^2 + y^2 = 1 + d x^2 y^2   over Fr,  d = -(10240/10241),  cofactor 8.

The reference consumes this from the `dusk-jubjub` crate
(/root/reference/Cargo.toml:24); the composer's ECC gadgets
(/root/reference/src/composer/point.rs, fixed_base.rs) need point arithmetic,
wNAF decomposition and prime-order checks at witness-generation time — all
host-side work (graph building), so Python ints are the right tool.

Note on generators: the reference's gadgets take the generator as an argument
(`component_mul_generator(scalar, generator)`), so no specific dusk constant is
load-bearing; we expose a deterministically derived prime-order GENERATOR.
"""

from __future__ import annotations

from ..field import params

R = params.R_MOD
D = params.JUBJUB_D
ORDER = params.JUBJUB_ORDER
COFACTOR = params.JUBJUB_COFACTOR


class JubjubPoint:
    """Affine twisted Edwards point. Complete addition law (a=-1, d non-square)."""

    __slots__ = ("x", "y")

    def __init__(self, x: int, y: int):
        self.x = x % R
        self.y = y % R

    @staticmethod
    def identity():
        return JubjubPoint(0, 1)

    def is_identity(self):
        return self.x == 0 and self.y == 1

    def is_on_curve(self):
        x2, y2 = self.x * self.x % R, self.y * self.y % R
        return (-x2 + y2 - 1 - D * x2 % R * y2) % R == 0

    def is_prime_order(self):
        return (not self.is_identity()) and self.mul(ORDER).is_identity()

    def __neg__(s):
        return JubjubPoint(-s.x, s.y)

    def __eq__(s, o):
        return s.x == o.x and s.y == o.y

    def __hash__(s):
        return hash((s.x, s.y))

    def __add__(s, o):
        # complete unified addition for a = -1
        x1y2 = s.x * o.y % R
        y1x2 = s.y * o.x % R
        y1y2 = s.y * o.y % R
        x1x2 = s.x * o.x % R
        dxy = D * x1y2 % R * y1x2 % R  # d * x1 x2 y1 y2
        x3 = (x1y2 + y1x2) * pow(1 + dxy, -1, R) % R
        y3 = (y1y2 + x1x2) * pow(1 - dxy, -1, R) % R
        return JubjubPoint(x3, y3)

    def double(s):
        return s + s

    def mul(s, k: int):
        acc, base = JubjubPoint.identity(), s
        while k:
            if k & 1:
                acc = acc + base
            base = base + base
            k >>= 1
        return acc

    # -- serde (32-byte little-endian y with x-sign in the top bit) ------------

    def to_bytes(self) -> bytes:
        b = bytearray(self.y.to_bytes(32, "little"))
        if self.x & 1:
            b[31] |= 0x80
        return bytes(b)

    @staticmethod
    def from_bytes(data: bytes) -> "JubjubPoint":
        assert len(data) == 32
        sign = data[31] >> 7
        y = int.from_bytes(data[:31] + bytes([data[31] & 0x7F]), "little")
        if y >= R:
            raise ValueError("jubjub y out of range")
        # solve -x^2 + y^2 = 1 + d x^2 y^2  =>  x^2 = (y^2-1)/(d y^2 + 1)
        y2 = y * y % R
        denom = (D * y2 + 1) % R
        x2 = (y2 - 1) * pow(denom, -1, R) % R
        x = _fr_sqrt(x2)
        if x is None:
            raise ValueError("not a valid jubjub point")
        if (x & 1) != sign:
            x = (-x) % R
        return JubjubPoint(x, y)


def _fr_sqrt(a: int):
    """Tonelli-Shanks in Fr (2-adicity 32)."""
    a %= R
    if a == 0:
        return 0
    if pow(a, (R - 1) // 2, R) != 1:
        return None
    # r - 1 = q * 2^s
    s, q = params.TWO_ADICITY, (R - 1) >> params.TWO_ADICITY
    z = params.FR_ROOT_OF_UNITY  # generator of the 2-Sylow subgroup
    m, c, t, rr = s, z, pow(a, q, R), pow(a, (q + 1) // 2, R)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % R
            i += 1
        b = pow(c, 1 << (m - i - 1), R)
        m, c = i, b * b % R
        t = t * c % R
        rr = rr * b % R
    return rr


def _derive_generator() -> JubjubPoint:
    """Deterministic prime-order generator: smallest y whose cofactor-cleared
    point is non-identity."""
    y = 2
    while True:
        y2 = y * y % R
        denom = (D * y2 + 1) % R
        x2 = (y2 - 1) * pow(denom, -1, R) % R
        x = _fr_sqrt(x2)
        if x is not None:
            pt = JubjubPoint(min(x, R - x), y).mul(COFACTOR)
            if not pt.is_identity():
                return pt
        y += 1


GENERATOR = _derive_generator()


def scalar_to_wnaf2(k: int, width_bits: int = 256) -> list[int]:
    """Width-2 signed-digit (wNAF) decomposition: digits in {-1, 0, 1} with no
    two adjacent nonzeros; mirrors the role of dusk-jubjub's
    `compute_windowed_naf::<2>` consumed at
    /root/reference/src/composer/fixed_base.rs:160.
    """
    digits = []
    while k:
        if k & 1:
            d = 2 - (k % 4)  # 1 or -1
            k -= d
        else:
            d = 0
        digits.append(d)
        k >>= 1
    digits += [0] * (width_bits - len(digits))
    return digits
