"""Regex pre-passes applied before the tolerant parse.

Mirrors the reference's hardcoded-pattern / regex-pre-pass stages:
* smart quotes            — layer3/hardcoded_patterns.ex:113-123
* fenced JSON in strings  — utils/preprocessing.ex:4-17
* code-fence terminators  — layer3/syntax_normalization.ex:382-387
* trailing code fences    — utils/repair_pipeline.ex:56-66
* ellipsis placeholders   — layer3/ellipsis_filter.ex:17-64
* placeholder keywords    — layer3/keyword_filter.ex:10-65

All are pure regexes in the reference too (same precision trade-off);
the Spark layer exposes each as a chained ``F.regexp_replace`` column.
"""

from __future__ import annotations

import re

SMART_QUOTES = {
    "“": '"',  # “
    "”": '"',  # ”
    "‹": '"',  # ‹
    "›": '"',  # ›
    "«": '"',  # «
    "»": '"',  # »
}
_SMART_TRANS = str.maketrans(SMART_QUOTES)

# 5 precompiled ellipsis patterns (ellipsis_filter.ex:17-21)
ELLIPSIS_PATTERNS = [
    (re.compile(r"\[\s*\.\.\.\s*\]"), "[]"),
    (re.compile(r",\s*\.\.\.\s*\]"), "]"),
    (re.compile(r"\[\s*\.\.\.\s*,"), "["),
    (re.compile(r",\s*\.\.\.\s*,"), ","),
    (re.compile(r",\s*\.\.\.\s*\}"), "}"),
]

KEYWORDS = (
    "COMMENT|SHOULD_NOT_EXIST|DEBUG_INFO|DEBUG|TRACE_END|PLACEHOLDER|"
    "SEPARATOR|MARKER|HEADER|FOOTER|INVALID|TODO|FIXME|NOTE"
)
# 6 structural positions (keyword_filter.ex:20-25)
KEYWORD_PATTERNS = [
    (re.compile(rf"([{{,]\s*)(?:{KEYWORDS})\s+(?=\")"), r"\1"),
    (re.compile(rf"([{{,]\s*)(?:{KEYWORDS})\s+(?=[\d\-tfn{{\[])"), r"\1"),
    (re.compile(rf"\s+(?:{KEYWORDS})(\s*[,\]\}}])"), r"\1"),
    (re.compile(rf"(\[\s*)(?:{KEYWORDS})\s+(?=[\d\"\-tfn{{\[])"), r"\1"),
]

_FENCE_IN_STRING = re.compile(r'(:\s*)"```(?:json)?\s*(.*?)\s*```"', re.DOTALL)
_FENCE_TERMINATOR = [
    # `"…}``` ` -> `"…"}` and `"…]``` ` -> `"…"]`
    (re.compile(r'("(?:[^"\\\n]|\\.)*)\}```\s*$'), r'\1"}'),
    (re.compile(r'("(?:[^"\\\n]|\\.)*)\]```\s*$'), r'\1"]'),
    # `"value, value2"``` ` -> drop trailing fence after a closed string
    (re.compile(r"```+\s*$"), ""),
]

# `{"key": "value}` -> `{"key": "value"}` — unclosed string before a
# trailing delimiter, letter-initial content only, anchored at EOF
# (layer3/syntax_normalization.ex:424-434; lib/json_remedy.ex:645-688)
_UNCLOSED_BEFORE_DELIM = [
    # end-of-input or end-of-line (truncated docs may carry trailing
    # wrapper prose on later lines)
    (re.compile(r'(:\s*"[A-Za-z][^"\n]*?)\s*([}\]])[ \t]*(?=\n|$)'), r'\1"\2'),
]


def normalize_smart_quotes(s: str, log: list) -> str:
    out = s.translate(_SMART_TRANS)
    if out != s:
        log.append({"layer": "layer3", "action": "normalized smart quotes", "position": 0, "original": None, "replacement": None})
    return out


def extract_fenced_json_in_strings(s: str, log: list) -> str:
    """`: "```json {…}```"` -> `: {…}` (only when inner starts with { or [,
    so `"```json"`-style literals survive — recent_python_cases:189-219)."""
    if "```" not in s:
        return s

    def repl(m: re.Match) -> str:
        inner = m.group(2)
        if inner[:1] in "{[":
            log.append({"layer": "layer1", "action": "extracted fenced JSON from string value", "position": m.start(), "original": None, "replacement": None})
            return m.group(1) + inner
        return m.group(0)

    return _FENCE_IN_STRING.sub(repl, s)


def fix_fence_terminators(s: str, log: list) -> str:
    if "```" not in s:
        return s
    before = s
    for pat, rep in _FENCE_TERMINATOR:
        s = pat.sub(rep, s)
    if s != before:
        log.append({"layer": "layer3", "action": "fixed code-fence terminator", "position": 0, "original": None, "replacement": None})
    return s


def filter_ellipsis(s: str, log: list) -> str:
    if "..." not in s:  # cheap gate before 5 regex passes
        return s
    changed = True
    hit = False
    while changed:
        changed = False
        for pat, rep in ELLIPSIS_PATTERNS:
            s2 = pat.sub(rep, s)
            if s2 != s:
                changed = hit = True
                s = s2
    if hit:
        log.append({"layer": "layer3", "action": "removed ellipsis placeholder", "position": 0, "original": None, "replacement": None})
    return s


_KEYWORD_PROBE = re.compile(KEYWORDS)


def filter_keywords(s: str, log: list) -> str:
    if not _KEYWORD_PROBE.search(s):  # one scan instead of 4 sub passes
        return s
    before = s
    for pat, rep in KEYWORD_PATTERNS:
        s = pat.sub(rep, s)
    if s != before:
        log.append({"layer": "layer3", "action": "removed placeholder keyword", "position": 0, "original": None, "replacement": None})
    return s


def fix_unclosed_string_before_delimiter(s: str, log: list) -> str:
    before = s
    for pat, rep in _UNCLOSED_BEFORE_DELIM:
        s = pat.sub(rep, s)
    if s != before:
        log.append({"layer": "layer3", "action": "added missing closing quote before delimiter", "position": 0, "original": None, "replacement": None})
    return s


def apply(s: str, log: list, *, early_hardcoded: bool = True) -> str:
    """All pre-passes, reference order (lib/json_remedy.ex:395-414).

    ``early_hardcoded`` mirrors ``:enable_early_hardcoded_patterns``
    (default on): off skips the hardcoded-pattern block (smart quotes,
    fence-in-string extraction, fence terminators, unclosed string
    before delimiter — json_remedy.ex:398-414) while the ellipsis /
    keyword layer-3 passes still run."""
    if early_hardcoded:
        s = normalize_smart_quotes(s, log)
        s = extract_fenced_json_in_strings(s, log)
        s = fix_fence_terminators(s, log)
        s = fix_unclosed_string_before_delimiter(s, log)
    s = filter_ellipsis(s, log)
    s = filter_keywords(s, log)
    return s


# Literal escape-sequence normalization — reference
# layer3/hardcoded_patterns.ex:145-288, gated DEFAULT-OFF behind
# `:enable_escape_normalization` (syntax_normalization.ex:463-479)
# because it rewrites escapes blindly across the whole text, including
# already-valid JSON escapes.
_UNICODE_ESC = re.compile(r"\\u([0-9a-fA-F]{4})(?:\\u([0-9a-fA-F]{4}))?")
_HEX_ESC = re.compile(r"\\x([0-9a-fA-F]{2})")
_STD_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f"}


def normalize_escape_sequences(s: str, log: list | None = None) -> str:
    """Convert literal ``\\uXXXX`` / ``\\xXX`` / ``\\t\\n\\r\\b\\f``
    sequences anywhere in the text to their actual characters.

    Pinned delta vs the reference: a ``\\uD800-\\uDFFF`` pair combines
    into the astral code point and a LONE surrogate escape is left as
    literal text (the reference's ``<<codepoint::utf8>>`` would raise
    on it; leaving it textual keeps the output utf-8-encodable)."""

    def uni(m):
        hi = int(m.group(1), 16)
        if m.group(2) is not None:
            lo = int(m.group(2), 16)
            if 0xD800 <= hi <= 0xDBFF and 0xDC00 <= lo <= 0xDFFF:
                return chr(0x10000 + ((hi - 0xD800) << 10) + (lo - 0xDC00))
            return _one(hi) + _one(lo)
        return _one(hi)

    def _one(cp):
        return chr(cp) if not (0xD800 <= cp <= 0xDFFF) else "\\u%04x" % cp

    out = _UNICODE_ESC.sub(uni, s)
    out = _HEX_ESC.sub(lambda m: chr(int(m.group(1), 16)), out)
    for ch, repl in _STD_ESCAPES.items():
        out = out.replace("\\" + ch, repl)
    if out != s and log is not None:
        log.append({"layer": "layer3", "action": "normalized literal escape sequences", "position": 0, "original": None, "replacement": None})
    return out
