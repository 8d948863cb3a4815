"""Witness point types (counterpart of
/root/reference/src/composer/constraint_system/ecc.rs:13-150).

`WitnessPoint` is an untyped coordinate pair; `TorsionFreeWitnessPoint` is the
typestate asserting prime-order subgroup membership was established (by
construction from a validated constant/generator, or in-circuit via
`assert_torsion_free_point`).
"""

from __future__ import annotations

from .constraint import Witness


class WitnessPoint:
    __slots__ = ("_x", "_y")

    def __init__(self, x: Witness, y: Witness):
        self._x = x
        self._y = y

    def x(self) -> Witness:
        return self._x

    def y(self) -> Witness:
        return self._y

    def __repr__(self):
        return f"WitnessPoint({self._x}, {self._y})"


class TorsionFreeWitnessPoint(WitnessPoint):
    @staticmethod
    def new_unchecked(point: WitnessPoint) -> "TorsionFreeWitnessPoint":
        return TorsionFreeWitnessPoint(point.x(), point.y())
