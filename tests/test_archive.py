"""Zero-copy archive (utils/archive.py) — the rkyv analog of srs.rs:33-47."""

import numpy as np
import pytest

from plonk_tpu.field import FR, params
from plonk_tpu.kzg import PublicParameters
from plonk_tpu.utils.archive import write_archive, read_archive, MAGIC
from plonk_tpu.utils.errors import InvalidBytes, NotEnoughBytes


def test_raw_archive_roundtrip(tmp_path):
    p = str(tmp_path / "t.pta")
    a = np.arange(24, dtype=np.uint32).reshape(2, 3, 4)
    b = np.frombuffer(b"hello world!", dtype=np.uint8)
    write_archive(p, {"a": a, "b": b}, meta={"k": 7})
    meta, sec = read_archive(p)
    assert meta == {"k": 7}
    assert np.array_equal(sec["a"], a) and sec["a"].dtype == np.uint32
    assert bytes(sec["b"]) == b"hello world!"
    # non-mmap path equal
    _, sec2 = read_archive(p, mmap=False)
    assert np.array_equal(sec2["a"], a)


def test_archive_rejects_malformed(tmp_path):
    p = str(tmp_path / "t.pta")
    write_archive(p, {"a": np.zeros(4, np.uint32)})
    data = bytearray(open(p, "rb").read())

    bad = str(tmp_path / "bad.pta")
    with open(bad, "wb") as f:
        f.write(b"X" + bytes(data[1:]))
    with pytest.raises(InvalidBytes):
        read_archive(bad)

    # truncated payload: section runs past EOF
    with open(bad, "wb") as f:
        f.write(bytes(data[:-8]))
    with pytest.raises(NotEnoughBytes):
        read_archive(bad)

    assert data[:8] == MAGIC


def test_public_parameters_archive_roundtrip(tmp_path):
    pp = PublicParameters.setup(16, secret=0xFEED, device=False)
    path = str(tmp_path / "pp.pta")
    pp.to_archive(path, include_shifted=False)
    pp2 = PublicParameters.from_archive(path)
    assert pp2.max_degree == pp.max_degree
    assert pp2.opening_key.to_bytes() == pp.opening_key.to_bytes()

    # commits agree between the original and the archived key
    coeffs = FR.pack([v * FR.R % params.R_MOD for v in (3, 1, 4, 1, 5)])
    c1 = pp.commit_key.truncate(8).commit_dev(coeffs)
    c2 = pp2.commit_key.truncate(8).commit_dev(coeffs)
    assert c1 == c2

    # host point list materializes lazily and matches
    assert pp2.commit_key.powers_of_g[:3] == pp.commit_key.powers_of_g[:3]


def test_public_parameters_archive_with_shifted(tmp_path):
    import os

    pp = PublicParameters.setup(8, secret=0xACE, device=False)
    path = str(tmp_path / "pp.pta")
    os.environ["PLONK_FLAT_MSM"] = "1"
    try:
        pp.to_archive(path, include_shifted=True)
        pp2 = PublicParameters.from_archive(path)
        assert pp2.commit_key._shifted is not None
        coeffs = FR.pack([v * FR.R % params.R_MOD for v in (9, 2, 6)])
        assert (pp2.commit_key.commit_dev(coeffs)
                == pp.commit_key.commit_dev(coeffs))
    finally:
        del os.environ["PLONK_FLAT_MSM"]


def test_archive_kind_check(tmp_path):
    p = str(tmp_path / "x.pta")
    write_archive(p, {"a": np.zeros(1, np.uint8)}, meta={"kind": "other"})
    with pytest.raises(InvalidBytes):
        PublicParameters.from_archive(p)
