"""4-wire copy-permutation bookkeeping (builder side).

Counterpart of /root/reference/src/composer/permutation.rs, TPU-shaped:
the witness->wire cycle map stays host-side (pointer chasing), but the sigma
*values* never materialize as Python big-ints — we emit compact (col, row)
index arrays and let the device compute K_col * omega^row by gather + one
multiply, and the grand product z by a blocked prefix-product scan
(the reference's sequential hot loop, permutation.rs:288-291).
"""

from __future__ import annotations

import numpy as np

from ..field import params

K_CONSTANTS = (1, params.K1, params.K2, params.K3)


class Permutation:
    def __init__(self):
        # witness index -> list of (col, row)
        self.witness_map: dict[int, list[tuple[int, int]]] = {}

    def add_witness(self, witness_index: int):
        self.witness_map.setdefault(witness_index, [])

    def add_witnesses_to_map(self, a: int, b: int, c: int, d: int, gate: int):
        for col, w in enumerate((a, b, c, d)):
            self.witness_map[w].append((col, gate))

    def compute_sigma_indices(self, n: int) -> np.ndarray:
        """(4, n, 2) int32 array: sigma[col][row] = (col', row') — the shift-by-one
        cycle over each witness's wire list (permutation.rs:104-139)."""
        sig = np.empty((4, n, 2), dtype=np.int32)
        for col in range(4):
            sig[col, :, 0] = col
            sig[col, :, 1] = np.arange(n, dtype=np.int32)
        for wires in self.witness_map.values():
            m = len(wires)
            for i, (col, row) in enumerate(wires):
                nxt = wires[(i + 1) % m]
                sig[col, row, 0] = nxt[0]
                sig[col, row, 1] = nxt[1]
        return sig
