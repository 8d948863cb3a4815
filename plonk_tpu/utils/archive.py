"""Zero-copy tensor archive — the rkyv/bytecheck analog (reference
srs.rs:33-47 derives `Archive`/`CheckBytes` so PublicParameters can be
memory-mapped without parsing).

The reference's rkyv feature exists because parsing 2^20 * 96-byte points
through a deserializer dominates startup.  The TPU-native equivalent stores
the *device-ready* limb tensors directly: an aligned binary container whose
sections are `np.memmap` views — loading is O(1), feeding `jax.device_put`
streams pages straight from the page cache to HBM with no Python-level parse.

Layout:
    [0:8)    magic  b"PTARCH\\x00\\x01"
    [8:16)   u64 little-endian header length H
    [16:16+H) JSON header {"meta": {...}, "sections": [
                 {"name", "dtype", "shape", "offset", "nbytes"}, ...]}
    ...      section payloads, each ALIGN-byte aligned, raw little-endian

Integrity: every section records nbytes and the loader bounds-checks offsets
against the file size (the bytecheck analog); dtype/shape consistency is
validated before any view is handed out.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .errors import InvalidBytes, NotEnoughBytes

MAGIC = b"PTARCH\x00\x01"
ALIGN = 128


def _align(off: int) -> int:
    return (off + ALIGN - 1) & ~(ALIGN - 1)


def write_archive(path: str, sections: dict[str, np.ndarray],
                  meta: dict | None = None) -> None:
    entries = []
    payload_off = 0
    arrays = []
    for name, arr in sections.items():
        a = np.ascontiguousarray(arr)
        payload_off = _align(payload_off)
        entries.append({
            "name": name,
            "dtype": a.dtype.str,
            "shape": list(a.shape),
            "offset": payload_off,
            "nbytes": int(a.nbytes),
        })
        arrays.append(a)
        payload_off += a.nbytes
    header = json.dumps({"meta": meta or {}, "sections": entries},
                        separators=(",", ":")).encode()
    base = _align(16 + len(header))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(b"\0" * (base - 16 - len(header)))
        pos = 0
        for e, a in zip(entries, arrays):
            f.write(b"\0" * (e["offset"] - pos))
            f.write(a.tobytes())
            pos = e["offset"] + e["nbytes"]
    os.replace(tmp, path)


def read_archive(path: str, mmap: bool = True):
    """-> (meta, {name: ndarray}).  With mmap=True the arrays are read-only
    zero-copy views over the file's page cache."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(16)
        if len(head) < 16 or head[:8] != MAGIC:
            raise InvalidBytes("not a plonk-tpu archive")
        hlen = int.from_bytes(head[8:16], "little")
        if hlen > size - 16 or hlen > (64 << 20):
            raise NotEnoughBytes("archive header truncated")
        try:
            header = json.loads(f.read(hlen))
        except ValueError as e:
            raise InvalidBytes(f"archive header is not valid JSON: {e}")
    base = _align(16 + hlen)
    out = {}
    for e in header.get("sections", ()):
        try:
            name = e["name"]
            dtype = np.dtype(e["dtype"])
            shape = tuple(int(s) for s in e["shape"])
            offset = int(e["offset"])
            nbytes = int(e["nbytes"])
        except (KeyError, TypeError, ValueError) as exc:
            raise InvalidBytes(f"malformed archive section entry: {exc}")
        want = dtype.itemsize * int(np.prod(shape, dtype=np.int64)) if shape \
            else dtype.itemsize
        if want != nbytes:
            raise InvalidBytes(f"section {name}: shape/nbytes mismatch")
        lo = base + offset
        if lo % ALIGN or lo + nbytes > size:
            raise NotEnoughBytes(f"section {name}: out of bounds")
        if mmap:
            out[name] = np.memmap(path, dtype=dtype, mode="r",
                                  offset=lo, shape=shape)
        else:
            with open(path, "rb") as f:
                f.seek(lo)
                buf = f.read(nbytes)
            if len(buf) != nbytes:
                raise NotEnoughBytes(f"section {name}: truncated payload")
            out[name] = np.frombuffer(buf, dtype=dtype).reshape(shape)
    return header.get("meta", {}), out
