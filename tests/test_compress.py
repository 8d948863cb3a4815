"""Circuit compression roundtrip (reference src/composer/compress.rs).

Mirrors the reference semantics: compress a built circuit into the dedup-table
container, decompress into a zero-witness composer, and check the gate system
(selectors, wires, public-input positions) survives exactly.  Also pins the
Hades dictionary derivation (compress/hades.rs) against first-values vectors.
"""

import pytest

from plonk_tpu.composer import Composer, Circuit, Constraint
from plonk_tpu.composer.compress import (
    compress_composer, decompress_to_composer, compress_circuit,
    hades_constants, hades_mds,
)
from plonk_tpu.field import params
from plonk_tpu.utils.errors import InvalidCompressedCircuit

R = params.R_MOD


class GadgetCircuit(Circuit):
    """Touches arithmetic, boolean, range, select and public inputs."""

    def circuit(self, c):
        a = c.append_witness(7)
        b = c.append_witness(11)
        o = c.gate_add(Constraint().left(1).right(1).a(a).b(b))
        c.append_public(77)
        c.component_boolean(c.append_witness(1))
        c.component_range_bits(c.append_witness(300), 10)
        bit = c.append_witness(1)
        c.component_boolean(bit)
        c.component_select(bit, a, o)


def _built(circuit_cls):
    comp = Composer.initialized()
    circuit_cls().circuit(comp)
    return comp


@pytest.mark.parametrize("hades", [False, True])
def test_roundtrip_exact_gate_system(hades):
    comp = _built(GadgetCircuit)
    blob = compress_composer(comp, hades_optimization=hades)
    back = decompress_to_composer(blob)

    assert back.constraints() == comp.constraints()
    assert back.sel == comp.sel
    assert back.wires == comp.wires
    assert back.public_input_indexes() == comp.public_input_indexes()
    assert len(back.witnesses) == len(comp.witnesses)
    # witnesses are zeroed in the decompressed composer
    assert all(v == 0 for v in back.witnesses)
    # permutation wire maps must be rebuilt identically
    assert back.perm.witness_map == comp.perm.witness_map


def test_compress_circuit_entrypoint_matches_manual():
    blob1 = compress_circuit(GadgetCircuit)
    blob2 = GadgetCircuit().compress()
    assert blob1 == blob2


def test_hades_dictionary_shrinks_poseidon_style_constants():
    """Selectors drawn from the Hades dictionary cost no scalar-table entries."""
    consts = hades_constants()

    class HadesCircuit(Circuit):
        def circuit(self, c):
            a = c.append_witness(3)
            for k in consts[:40]:
                a = c.gate_add(Constraint().left(1).a(a).constant(k))

    comp = _built(HadesCircuit)
    with_dict = compress_composer(comp, hades_optimization=True)
    without = compress_composer(comp, hades_optimization=False)
    assert len(with_dict) < len(without)
    back = decompress_to_composer(with_dict)
    assert back.sel == comp.sel


def test_hades_vectors():
    """Pin the derivation: 335 round constants, 25 MDS entries, all canonical,
    MDS[0][0] = 1/5 mod r (cauchy 1/(x_0+y_0), x_0=0, y_0=5)."""
    consts = hades_constants()
    assert len(consts) == 67 * 5
    assert all(0 <= v < R for v in consts)
    assert len(set(consts)) == len(consts)
    mds = hades_mds()
    assert len(mds) == 25
    assert mds[0] == pow(5, -1, R)
    assert mds[24] == pow(13, -1, R)


def test_malformed_bytes_rejected():
    with pytest.raises(InvalidCompressedCircuit):
        decompress_to_composer(b"not a circuit")
    blob = bytearray(compress_circuit(GadgetCircuit))
    blob[5] ^= 0xFF
    with pytest.raises(InvalidCompressedCircuit):
        decompress_to_composer(bytes(blob))


def test_noncanonical_scalar_rejected():
    """A scalar >= r in the table must be rejected (BlsScalarMalformed analog)."""
    import msgpack
    import zlib

    comp = _built(GadgetCircuit)
    payload = msgpack.unpackb(
        zlib.decompress(compress_composer(comp, hades_optimization=False)),
        raw=False)
    payload[3] = [(R + 1).to_bytes(32, "little")] + payload[3][1:]
    bad = zlib.compress(msgpack.packb(payload, use_bin_type=True), 9)
    with pytest.raises(InvalidCompressedCircuit):
        decompress_to_composer(bad)
