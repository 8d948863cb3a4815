"""Runtime event bus (observability hook), counterpart of
/root/reference/src/runtime.rs:18-70.

Events flow to an attached listener (the debugger, a tracer, or user code).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass
class RuntimeEvent:
    kind: str  # "witness_appended" | "constraint_appended" | "proof_finished"
    payload: Any = None

    @staticmethod
    def witness_appended(witness, value):
        return RuntimeEvent("witness_appended", (witness, value))

    @staticmethod
    def constraint_appended(constraint):
        return RuntimeEvent("constraint_appended", constraint)

    @staticmethod
    def proof_finished():
        return RuntimeEvent("proof_finished")


class Runtime:
    def __init__(self):
        self.listeners: list[Callable[[RuntimeEvent], None]] = []

    def attach(self, listener: Callable[[RuntimeEvent], None]):
        self.listeners.append(listener)

    def event(self, ev: RuntimeEvent):
        for listener in self.listeners:
            listener(ev)
