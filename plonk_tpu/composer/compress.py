"""Circuit compression: dedup tables + msgpack + DEFLATE.

Counterpart of /root/reference/src/composer/compress.rs (CompressedCircuit,
compress.rs:69-346) and compress/hades.rs (pre-seeded Poseidon/Hades constant
dictionary).  The container is semantically identical — a scalar dedup table
(seeded with {0, 1, -1} plus, optionally, the 335 Hades round constants and
the 5x5 MDS matrix), a selector-tuple ("polynomial") dedup table, and the gate
list as indices — serialized with msgpack and DEFLATE-compressed.

Compressed circuits carry **no witness values**: decompression rebuilds a
composer with all-zero witnesses, suitable for `Compiler.compile_with_compressed`
(preprocessing only needs selectors, wire indices and public-input positions).
"""

from __future__ import annotations

import hashlib
import zlib

from ..field import params
from ..utils.errors import InvalidCompressedCircuit
from .constraint import Constraint, Witness, SELECTOR_NAMES

R = params.R_MOD

# -- Hades / Poseidon dictionary (compress/hades.rs:14-65) --------------------

_HADES_WIDTH = 5
_HADES_ROUNDS = 59 + 8


def _from_bytes_wide(b: bytes) -> int:
    """BlsScalar::from_bytes_wide: 512-bit little-endian reduction mod r."""
    return int.from_bytes(b, "little") % R


def hades_constants() -> list[int]:
    """Chained SHA-512 stream: c_i = wide(H^i("poseidon-for-plonk")) + c_{i-1},
    seeded with 1 (hades.rs:21-37)."""
    out = []
    p = 1
    buf = b"poseidon-for-plonk"
    for _ in range(_HADES_ROUNDS * _HADES_WIDTH):
        buf = hashlib.sha512(buf).digest()
        c = (_from_bytes_wide(buf) + p) % R
        out.append(c)
        p = c
    return out


def hades_mds() -> list[int]:
    """Row-major 5x5 Cauchy matrix 1/(x_i + y_j), x_i=i, y_j=j+5 (hades.rs:39-65)."""
    out = []
    for i in range(_HADES_WIDTH):
        for j in range(_HADES_WIDTH):
            out.append(pow(i + j + _HADES_WIDTH, -1, R))
    return out


def _scalar_map(hades_optimization: bool) -> dict[int, int]:
    """Base dictionary: {0, 1, -1} then the Hades constants (compress.rs:45-67)."""
    scalars: dict[int, int] = {0: 0, 1: 1, R - 1: 2}
    if hades_optimization:
        for s in hades_constants():
            scalars.setdefault(s, len(scalars))
        for s in hades_mds():
            scalars.setdefault(s, len(scalars))
    return scalars


# -- container ----------------------------------------------------------------

_WIRE_SELECTORS = [n for n in SELECTOR_NAMES]  # 11 selector columns, fixed order


def compress_composer(composer, hades_optimization: bool = True) -> bytes:
    """Composer -> compressed bytes (compress.rs:80-199).

    Layout (msgpack list, then zlib DEFLATE):
      [hades_flag, public_input_indexes, n_witnesses,
       extra_scalars (32-byte LE each, beyond the seeded dictionary),
       polynomials (list of 11 scalar indices), constraints (list of [poly,a,b,c,d])]
    """
    import msgpack

    scalars = _scalar_map(hades_optimization)
    base_len = len(scalars)
    polynomials: dict[tuple, int] = {}
    constraints = []
    n = composer.constraints()
    for row in range(n):
        key = []
        for name in _WIRE_SELECTORS:
            v = composer.sel[name][row]
            key.append(scalars.setdefault(v, len(scalars)))
        poly_idx = polynomials.setdefault(tuple(key), len(polynomials))
        constraints.append([
            poly_idx,
            composer.wires["a"][row], composer.wires["b"][row],
            composer.wires["c"][row], composer.wires["d"][row],
        ])

    inv_scalars = [0] * len(scalars)
    for s, i in scalars.items():
        inv_scalars[i] = s
    extra = [s.to_bytes(32, "little") for s in inv_scalars[base_len:]]
    inv_polys = [None] * len(polynomials)
    for p, i in polynomials.items():
        inv_polys[i] = list(p)

    payload = msgpack.packb([
        bool(hades_optimization),
        composer.public_input_indexes(),
        len(composer.witnesses),
        extra,
        inv_polys,
        constraints,
    ], use_bin_type=True)
    return zlib.compress(payload, 9)


def decompress_to_composer(data: bytes):
    """Compressed bytes -> Composer with zero witnesses (compress.rs:201-346)."""
    import msgpack

    from .composer import Composer

    try:
        payload = zlib.decompress(data)
        (hades_optimization, public_inputs, n_witnesses, extra,
         inv_polys, constraints) = msgpack.unpackb(payload, raw=False)
    except Exception as e:
        raise InvalidCompressedCircuit(f"invalid compressed circuit: {e}") from e

    scalars_map = _scalar_map(bool(hades_optimization))
    scalars = [0] * len(scalars_map)
    for s, i in scalars_map.items():
        scalars[i] = s
    for b in extra:
        v = int.from_bytes(b, "little")
        if v >= R:
            raise InvalidCompressedCircuit("non-canonical scalar in compressed circuit")
        scalars.append(v)

    composer = Composer()  # uninitialized: dummy gates are already encoded
    for _ in range(n_witnesses):
        composer.append_witness(0)

    pi_set = set(public_inputs)
    for i, (poly_idx, a, b, c, d) in enumerate(constraints):
        try:
            sel_idx = inv_polys[poly_idx]
            sel_vals = [scalars[k] for k in sel_idx]
        except IndexError as e:
            raise InvalidCompressedCircuit("invalid compressed circuit index") from e
        constraint = Constraint()
        for name, v in zip(_WIRE_SELECTORS, sel_vals):
            constraint = constraint._set(name, v)
        constraint = (constraint.a(Witness(a)).b(Witness(b))
                      .c(Witness(c)).d(Witness(d)))
        if i in pi_set:
            constraint = constraint.public(0)
        composer.append_custom_gate(constraint)
    return composer


def compress_circuit(circuit_cls, hades_optimization: bool = True) -> bytes:
    """Run the default circuit and compress it (circuit.rs:36-45)."""
    from .composer import Composer

    composer = Composer.initialized()
    circuit_cls().circuit(composer)
    return compress_composer(composer, hades_optimization)
