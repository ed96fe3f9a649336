"""Kernel orchestration — the reference's ``repair/2`` lifecycle.

Mirrors ``lib/json_remedy.ex:86-447``:

1. strict mode -> validate-only (utils/strict_mode_validator.ex)
2. fast path  -> ``json.loads`` succeeds => no repairs (ex:118-127)
3. plain-text gate -> ``""`` (utils/plain_text_detector.ex:5-27)
4. multi-value detection (utils/multiple_json_detector.ex) — handled
   inside the tolerant parser's top-level loop
5. Layer 1 cleaning -> regex pre-passes -> tolerant parse (L2+L3)
6. Layer 4 validation is implicit: the parser emits a term or SKIP
7. post-walk: unwrap fully-fenced JSON string values
   (utils/code_fence_extractor.ex:9-39)

Canonical serialization (our pinned delta vs the BEAM's map order,
see SURVEY.md §7.4): insertion-ordered compact ``json.dumps``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from . import cleaning, prepass
from .tolerant import SKIP, TolerantParser

MAX_DOC_BYTES = 8 * 1024 * 1024  # pathological-input cap (skew guard)

_JSON_CHARS = set('{}[]":')
_JSON_CHARS_RE = re.compile(r'[{}\[\]":]')  # C-speed scan for huge docs
_FENCED_STRING = re.compile(r"^```(?:json)?\s*(.+?)\s*```$", re.DOTALL)


@dataclass
class RepairResult:
    ok: bool
    value: Any = None
    repaired: str | None = None          # canonical compact JSON text
    repairs: list = field(default_factory=list)
    error: str | None = None
    fast_path: bool = False


def to_canonical(value: Any, indent: int | None = None) -> str:
    """Serialize a repaired value.

    Default is the pinned compact insertion-order form — the
    byte-identity invariant column (SURVEY §7.4 documents the
    key-order delta vs the reference's BEAM map order, which is
    permanent).  ``indent`` is the analogue of the reference's
    ``jason_options: [pretty: true]`` pass-through on
    ``repair_to_string/2`` (lib/json_remedy.ex:152-165): Jason's
    pretty printer emits 2-space-indented ``"key": value`` lines,
    which ``json.dumps(indent=2)`` matches line-for-line on the
    doctest examples; key order remains insertion order either way.
    """
    if indent is not None:
        out = json.dumps(value, ensure_ascii=False, indent=indent)
    else:
        out = json.dumps(value, ensure_ascii=False, separators=(",", ":"))
    try:
        out.encode("utf-8")
    except UnicodeEncodeError:
        # lone surrogates (json.loads accepts the "\uD83D" escape) are
        # legal in a Python str but NOT utf-8-encodable — they would
        # poison the Arrow serialization of the repaired column and
        # kill the task.  Re-escape just those code points; everything
        # else stays raw utf-8.
        out = out.encode("utf-8", "backslashreplace").decode("utf-8")
    return out


def is_plain_text(s: str) -> bool:
    """No JSON structural chars and not a literal/number
    (plain_text_detector.ex:5-27)."""
    t = s.strip()
    if not t:
        return True
    if _JSON_CHARS_RE.search(t):
        return False
    if t in ("true", "false", "null"):
        return False
    # reference pattern accepts leading zeros ("007", "00.5"):
    # plain_text_detector.ex `^-?\d+(\.\d+)?([eE][+-]?\d+)?$` — such
    # inputs route through the repair pipeline (number normalization)
    if re.fullmatch(r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", t):
        return False
    if "'" in t:  # single-quoted structures still repairable
        return False
    return True


def _fast_path(s: str) -> Any:
    try:
        return json.loads(s)
    except Exception:
        return SKIP


_DECODER = json.JSONDecoder()
# A value could start here -> the C-speed shortcut is unsafe.  Smart
# quotes included: prepass normalizes them to ASCII quotes, so a
# smart-quoted prose fragment becomes a top-level string value under
# the full kernel (ADVICE r1: `say “x” {...}` must parse like
# `say "x" {...}`).
_TAIL_BLOCKERS = re.compile(r'[{\["0-9\'“”‘’]')
_LITERAL_WORDS = re.compile(r"\b(true|false|null|True|False|None|NULL|Null|TRUE|FALSE|nil)\b")

def _span_fast_path(s: str) -> Any:
    """C-speed path for wrapped-but-valid JSON (the dominant web case:
    prose/fence/comment around one valid value).

    Finds the first ``{``/``[``, lets the stdlib C scanner
    (``JSONDecoder.raw_decode``) parse one value, and accepts only when
    neither prefix nor tail could change the result under the full
    kernel (no other value starts, no bare literals).  Equivalence with
    the tolerant path is covered by the corpus round-trip test.
    """
    cands = [i for i in (s.find("{"), s.find("[")) if i != -1]
    if not cands:
        return SKIP
    idx = min(cands)
    prefix = s[:idx]
    if _TAIL_BLOCKERS.search(prefix) or _LITERAL_WORDS.search(prefix):
        return SKIP
    t = prefix.lstrip()
    if t[:1] in _QUOTE_STARTS:
        return SKIP
    try:
        value, end = _DECODER.raw_decode(s, idx)
    except Exception:
        return SKIP
    tail = s[end:]
    if _TAIL_BLOCKERS.search(tail) or _LITERAL_WORDS.search(tail):
        return SKIP
    return value


_QUOTE_STARTS = {"'", "“", "”", "‘", "’"}


def _maybe_unwrap(value: Any, src: str, log: list) -> Any:
    """Gate the recursive unwrap walk on the SOURCE containing a fence
    at all — a fenced string value must literally contain ``` which
    must appear in the source, so docs without backticks (the common
    case) skip the full-structure rebuild (profiling: ~6% of the
    malformed-doc slow path).  Backticks may also reach the decoded
    value via \\u0060 escapes (the reference's code_fence_extractor
    inspects the DECODED value), so the escape form keeps the walk
    too (ADVICE r3)."""
    if "```" not in src and "\\u0060" not in src:
        return value
    return _unwrap_fenced_strings(value, log)


def _unwrap_fenced_strings(value: Any, log: list) -> Any:
    """Recursive walk: string values that are fully fenced get re-repaired
    and inlined (code_fence_extractor.ex:9-39)."""
    if isinstance(value, dict):
        return {k: _unwrap_fenced_strings(v, log) for k, v in value.items()}
    if isinstance(value, list):
        return [_unwrap_fenced_strings(v, log) for v in value]
    if isinstance(value, str):
        m = _FENCED_STRING.match(value)
        if m and m.group(1)[:1] in "{[":
            sub = repair(m.group(1))
            if sub.ok and sub.value not in ("", None):
                log.append({"layer": "layer1", "action": "unwrapped fenced JSON string", "position": -1, "original": None, "replacement": None})
                return sub.value
    return value


def strict_validate(s: str) -> RepairResult:
    """Validate-only strict mode (utils/strict_mode_validator.ex:10-213):
    rejects malformed input, duplicate keys, empty keys, empty values,
    multiple top-level values. No repairs."""

    def pairs_hook(pairs):
        seen = set()
        for k, _ in pairs:
            if k == "":
                raise ValueError("empty key")
            if k in seen:
                raise ValueError(f"duplicate key: {k}")
            seen.add(k)
        return dict(pairs)

    try:
        value = json.loads(s, object_pairs_hook=pairs_hook)
    except Exception as e:  # noqa: BLE001
        return RepairResult(ok=False, error=f"strict mode: {e}")
    return RepairResult(ok=True, value=value, repaired=to_canonical(value))


def repair(
    s: str | bytes,
    *,
    strict_mode: bool = False,
    normalize_escapes: bool = False,
    max_bytes: int = MAX_DOC_BYTES,
    fast_path_optimization: bool = True,
    enable_object_merging: bool = True,
    enable_multiple_json_aggregation: bool = True,
    enable_early_hardcoded_patterns: bool = True,
    fix_doubled_quotes: bool = False,
    _debug: "_DebugCollector | None" = None,
) -> RepairResult:
    """Main entry — mirrors ``JsonRemedy.repair/2`` (lib/json_remedy.ex:86).

    Reference option parity (all default-on, matching
    lib/json_remedy.ex:90,355,389,398 and the app-env defaults):

    * ``fast_path_optimization`` — off skips BOTH decode fast paths
      (the whole-input ``json.loads`` of ex:118-127 and our span fast
      path) and routes everything through the full pipeline.
    * ``enable_object_merging`` — off disables the
      ``{"a":1}, "b":2}`` boundary merge (layer3/object_merger.ex).
    * ``enable_multiple_json_aggregation`` — off disables the
      multi-value detector (utils/multiple_json_detector.ex); only the
      first top-level value parses.
    * ``enable_early_hardcoded_patterns`` — off skips the
      hardcoded-pattern prepass block (ex:398-414).

    ``normalize_escapes`` mirrors the reference's DEFAULT-OFF
    ``:enable_escape_normalization`` flag
    (layer3/syntax_normalization.ex:463-479): literal ``\\uXXXX`` /
    ``\\xXX`` / ``\\t\\n\\r\\b\\f`` sequences anywhere in the text are
    converted to real characters before the tolerant parse.

    ``fix_doubled_quotes`` (DEFAULT OFF — the reference defers this
    whole pattern class: every case in
    test/missing_patterns/doubled_quotes_test.exs is tagged
    :layer5_target and excluded from its CI, so the at-parity default
    leaves the inputs to the embedded-quote rules): on, boundary quote
    doubling repairs per that suite's spec — ``{"k": ""v""}`` ->
    ``{"k":"v"}``, asymmetric/tripled variants, ``""`` before a
    terminator stays a legitimate empty string."""
    dbg = _debug
    log: list = []
    if isinstance(s, bytes):
        s = cleaning.normalize_encoding(s, log)
    if strict_mode:
        r = strict_validate(s)
        if dbg is not None:
            dbg.step("layer4", "processed" if r.ok else "error",
                     len(s), len(r.repaired or ""), r.repairs or [], 0)
            if not r.ok:
                dbg.error_at = "layer4"
            dbg.fill_skipped(len(s))
        return r
    if len(s) > max_bytes:
        # pathological-doc guard: route to drop with a reason, keeps a
        # 1000-executor run free of stragglers (SURVEY.md §7.4)
        guard = [{"layer": "guard", "action": "oversize document dropped", "position": 0}]
        if dbg is not None:
            dbg.step("guard", "processed", len(s), 2, guard, 0)
            dbg.fill_skipped(len(s))
        return RepairResult(ok=True, value="", repaired='""', repairs=guard)

    # fast path (lib/json_remedy.ex:118-127), gated by the option (ex:90,119)
    if fast_path_optimization:
        v = _fast_path(s)
        if v is not SKIP:
            if dbg is not None:
                dbg.fast_path(len(s))
            return RepairResult(ok=True, value=v, repaired=to_canonical(v), fast_path=True)

    if is_plain_text(s):
        act = [{"layer": "layer1", "action": "plain text replaced with empty string", "position": 0}]
        if dbg is not None:
            dbg.step("layer1", "processed", len(s), 0, act, dbg.us(dbg.t0))
            dbg.step("layer4", "processed", 0, 2, [], 0)
            dbg.fill_skipped(len(s))
        return RepairResult(ok=True, value="", repaired='""', repairs=act)

    if fast_path_optimization:
        t0 = dbg.mark() if dbg is not None else 0.0
        v = _span_fast_path(s)
        if v is not SKIP:
            log.append({"layer": "layer1", "action": "extracted valid JSON value (span fast path)", "position": 0, "original": None, "replacement": None})
            v = _maybe_unwrap(v, s, log)
            repaired = to_canonical(v)
            if dbg is not None:
                dbg.step("layer1", "processed", len(s), len(repaired), log, dbg.us(t0))
                dbg.step("layer4", "processed", len(repaired), len(repaired), [], 0)
                dbg.fill_skipped(len(s))
            return RepairResult(ok=True, value=v, repaired=repaired, repairs=log, fast_path=True)

    t0 = dbg.mark() if dbg is not None else 0.0
    work = cleaning.clean(s, log)
    if dbg is not None:
        dbg.step("layer1", "processed" if (log or work != s) else "skipped",
                 len(s), len(work), list(log), dbg.us(t0))
    if work != s and fast_path_optimization:
        v = _fast_path(work)
        if v is not SKIP:
            v = _maybe_unwrap(v, work, log)
            repaired = to_canonical(v)
            if dbg is not None:
                dbg.step("layer4", "processed", len(work), len(repaired), [], 0)
                dbg.fill_skipped(len(work))
            return RepairResult(ok=True, value=v, repaired=repaired, repairs=log)
    n_pre = len(log)
    t0 = dbg.mark() if dbg is not None else 0.0
    pre_in = len(work)
    work = prepass.apply(work, log, early_hardcoded=enable_early_hardcoded_patterns)
    if normalize_escapes:
        work = prepass.normalize_escape_sequences(work, log)
    if dbg is not None:
        new = log[n_pre:]
        dbg.step("preprocessing", "processed" if (new or len(work) != pre_in) else "skipped",
                 pre_in, len(work), new, dbg.us(t0))

    parser = TolerantParser(
        work,
        log=log,
        object_merging=enable_object_merging,
        multi_value=enable_multiple_json_aggregation,
        fix_doubled_quotes=fix_doubled_quotes,
    )
    n_parse = len(log)
    t0 = dbg.mark() if dbg is not None else 0.0
    try:
        value = parser.parse()
    except RecursionError:
        if dbg is not None:
            dbg.parse_steps(log[n_parse:], len(work), dbg.us(t0), err=True)
            dbg.step("layer4", "error", len(work), 0, [], 0)
            dbg.error_at = "layer2"
        return RepairResult(ok=False, error="nesting too deep", repairs=log)
    if dbg is not None:
        dbg.parse_steps(log[n_parse:], len(work), dbg.us(t0))
    if value is SKIP:
        if is_plain_text(work) or not (_JSON_CHARS_RE.search(work) or "'" in work):
            if dbg is not None:
                dbg.step("layer4", "processed", len(work), 2, [], 0)
            return RepairResult(ok=True, value="", repaired='""', repairs=log)
        if dbg is not None:
            dbg.step("layer4", "skipped", len(work), 0, [], 0)
            dbg.error_at = "layer4"
        return RepairResult(ok=False, error="Could not repair JSON", repairs=log)
    n4 = len(log)
    value = _maybe_unwrap(value, work, log)
    repaired = to_canonical(value)
    if dbg is not None:
        dbg.step("layer4", "processed", len(work), len(repaired), log[n4:], 0)
    return RepairResult(ok=True, value=value, repaired=repaired, repairs=log)


class _DebugCollector:
    """Instrumentation sink threaded through ``repair()`` so the debug
    path IS the repair path — one control flow.  (The previous
    standalone reimplementation drifted on the plain-text / span-fast-
    path / post-clean short circuits and returned ok=False where
    ``repair()`` returned ok=True.)"""

    LAYERS = ("layer1", "preprocessing", "layer2", "layer3", "layer4")

    def __init__(self):
        import time as _time

        self._now = _time.perf_counter
        self.t0 = self._now()
        self.steps: list[dict] = []
        self.error_at: str | None = None
        self.fast = False

    def mark(self) -> float:
        return self._now()

    def us(self, t0: float) -> int:
        return int((self._now() - t0) * 1e6)

    def step(self, layer, status, in_size, out_size, repairs, t_us) -> None:
        self.steps.append({
            "layer": layer, "status": status,
            "input_size": in_size, "output_size": out_size,
            "repairs": list(repairs), "repair_count": len(repairs),
            "processing_time_us": t_us,
        })

    def fast_path(self, in_size: int) -> None:
        """ex:320-329 — a fast-path hit yields ONE validated step."""
        self.fast = True
        self.steps = [{"layer": "fast_path", "status": "validated", "input_size": in_size}]

    def parse_steps(self, new, work_len, parse_us, err: bool = False) -> None:
        """Our layers 2+3 run as ONE tolerant-parse pass (SURVEY.md
        §3.1): reconstruct the two records from the layer-tagged
        action log, splitting the fused pass's wall time (the
        reference times real per-layer passes — attribution, not a
        second measurement)."""
        l2 = [a for a in new if a["layer"] == "layer2"]
        l3 = [a for a in new if a["layer"] != "layer2"]
        self.step("layer2", "error" if err else ("processed" if l2 else "skipped"),
                  work_len, work_len, l2, parse_us // 2)
        self.step("layer3", "error" if err else ("processed" if l3 else "skipped"),
                  work_len, work_len, l3, parse_us - parse_us // 2)

    def fill_skipped(self, in_size: int) -> None:
        """Skipped records for layers a short circuit never reached,
        in canonical order (no-op after a fast-path hit)."""
        if self.fast:
            return
        done = {s["layer"] for s in self.steps}
        for layer in self.LAYERS:
            if layer not in done:
                self.step(layer, "skipped", in_size, in_size, [], 0)
        order = {l: i for i, l in enumerate(self.LAYERS)}
        self.steps.sort(key=lambda s: order.get(s["layer"], -1))

    def finish(self, total_repairs: int) -> dict:
        d = {
            "steps": self.steps,
            "total_repairs": total_repairs,
            "processing_time_us": self.us(self.t0),
        }
        if self.error_at:
            d["error_at_layer"] = self.error_at
        return d


def repair_with_debug(s: str | bytes, **kw) -> tuple[RepairResult, dict]:
    """Per-layer observability — the reference's ``repair_with_debug/2``
    record shape (lib/json_remedy.ex:297-343, 464-636):

    * fast path hit -> ``steps == [{layer: "fast_path", status:
      "validated", input_size}]`` (ex:320-329);
    * otherwise one step per layer — ``layer1`` (content cleaning),
      ``preprocessing`` (regex pre-passes; our explicit extra phase),
      ``layer2`` (structural), ``layer3`` (syntax), ``layer4``
      (validation) — each ``{layer, status, input_size, output_size,
      repairs, repair_count, processing_time_us}`` with
      ``status in {processed, skipped, error}`` (ex:596-623) and
      ``repairs`` holding that layer's NEW action records;
    * debug_info wraps them: ``{steps, total_repairs,
      processing_time_us}`` + ``error_at_layer`` on failure
      (ex:538-556).

    Delegates to ``repair()`` with a collector — the RESULT is
    guaranteed identical to ``repair(s, **kw)`` by construction
    (same function, same flow); the collector only observes.
    ``kw`` forwards the reference's per-call toggles."""
    dbg = _DebugCollector()
    r = repair(s, _debug=dbg, **kw)
    dbg.fill_skipped(0)  # no-op on complete paths; belt-and-braces
    return r, dbg.finish(len(r.repairs or []))


def repair_to_string(s: str | bytes, indent: int | None = None, **kw) -> RepairResult:
    """Repair then re-serialize (lib/json_remedy.ex:152-165); canonical
    compact form is the byte-identical invariant column.

    ``indent`` mirrors the reference's ``jason_options`` pass-through
    (``Jason.encode!(term, pretty: true)`` == ``indent=2``): the
    returned result's ``repaired`` field is pretty-printed, the
    decoded ``value`` is unchanged.  Key order stays the pinned
    insertion-order delta either way (SURVEY §7.4)."""
    r = repair(s, **kw)
    if indent is not None and r.ok:
        return RepairResult(
            ok=True,
            value=r.value,
            repaired=to_canonical(r.value, indent=indent),
            repairs=r.repairs,
            fast_path=r.fast_path,
        )
    return r


def analyze(s: str | bytes) -> list:
    """Repair-action list only (lib/json_remedy.ex:258-266)."""
    return repair(s).repairs


def can_repair(s: str) -> bool:
    """Any layer's supports? fires (lib/json_remedy.ex:235-239)."""
    if cleaning.supports(s):
        return True
    t = s.strip()
    if not t:
        return False
    if any(c in t for c in "{}[]'\":"):
        return True
    return not is_plain_text(s)
