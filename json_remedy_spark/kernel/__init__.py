"""Pure-Python repair kernel (no Spark dependency).

Reimplements the *semantics* of the reference five-layer pipeline
(`/root/reference/lib/json_remedy.ex:86-447`) as:

* :mod:`.cleaning`  — Layer 1 content cleaning (string -> string)
* :mod:`.prepass`   — regex pre-passes (smart quotes, fences-in-strings,
  ellipsis, placeholder keywords; reference layer3 regex pre-pass)
* :mod:`.tolerant`  — Layers 2+3 as one stack-based tolerant parser
* :mod:`.pipeline`  — orchestration: plain-text gate, fast path,
  multi-value detection, strict mode, canonical serialization
"""

from .pipeline import (
    repair,
    repair_to_string,
    analyze,
    can_repair,
    RepairResult,
)

__all__ = ["repair", "repair_to_string", "analyze", "can_repair", "RepairResult"]
